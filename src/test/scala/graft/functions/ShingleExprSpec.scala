package graft.functions

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark
import graft.pipeline.Dedup

/** The native kernel must be observably identical to the composable
  * HOF form: same distinct xxhash64 SET per document (the kernel sorts;
  * the HOF keeps first-occurrence order), on real multilingual docs and
  * on the n<k / empty / multi-space edges.
  */
class ShingleExprSpec extends AnyFunSuite {
  import TestSpark._
  private lazy val s = spark

  private def hofHashes(text: org.apache.spark.sql.Column, k: Int) =
    sort_array(transform(Dedup.shingles(text, k), sh => xxhash64(sh)))

  test("native hashed shingles == xxhash64 over HOF shingles (real docs)") {
    val docs = s.read.parquet(s"$sf/documents.parquet")
    for (k <- Seq(2, 3, 5)) {
      val mismatches = docs.select(
          hofHashes(col("text"), k).as("hof"),
          ShingleExpressions.hashedShingles(trim(lower(col("text"))), k)
            .as("native"))
        .filter(col("hof") =!= col("native"))
        .count()
      assert(mismatches == 0, s"k=$k: $mismatches docs diverge")
    }
  }

  test("native CMS grid cells == exploded md5 expression form " +
      "(real docs + edges)") {
    import s.implicits._
    val docs = s.read.parquet(s"$sf/documents.parquet").select("text")
      .union(Seq("", " ", "  \t ", "a", "a a  a", "日本語 テキスト",
        "x\ny\tz").toDF("text"))
    val (depth, width) = (4, 1024)
    // ids assigned ONCE (checkpointed) so both forms read the same rows
    val base = docs
      .select(monotonically_increasing_id().as("id"), col("text"))
      .localCheckpoint()
    // expression form: word × hash-row explode, md5 bucket, per-doc count
    val d = explode(array((0 until depth).map(lit): _*)).as("d")
    val expr = base
      .select(col("id"),
        explode(split(trim(lower(col("text"))), "\\s+")).as("word"))
      .select(col("id"), col("word"), d)
      .select(col("id"), (col("d") * width +
        conv(substring(md5(concat(col("d").cast("string"), lit(":"),
          col("word"))), 18, 15), 16, 10).cast("long") % width).as("cell"))
      .groupBy("id", "cell").count()
      .groupBy("id").agg(sort_array(collect_list(
        shiftleft(col("cell"), 32) + col("count"))).as("cells"))
    val kern = base
      .select(col("id"), sort_array(ShingleExpressions.cmsBuckets(
        trim(lower(col("text"))), depth, width)).as("cells"))
    val mismatches = expr.join(kern, "id")
      .filter(expr("cells") =!= kern("cells")).count()
    assert(mismatches == 0, s"$mismatches docs diverge")
  }

  test("native chargrams == xxhash64 over HOF char trigrams (real docs)") {
    // multiset equality (duplicates carry term frequencies)
    val docs = s.read.parquet(s"$sf/documents.parquet")
    val norm = lower(regexp_replace(col("text"), "\\s+", " "))
    val chars = split(norm, "")
    val sh1 = slice(chars, lit(2), greatest(size(chars) - 1, lit(0)))
    val sh2 = slice(chars, lit(3), greatest(size(chars) - 2, lit(0)))
    val hof = slice(
      zip_with(zip_with(chars, sh1, (a, b) => concat(a, b)), sh2,
        (ab, c) => concat(ab, c)),
      lit(1), greatest(size(chars) - 2, lit(1)))
    val mismatches = docs.select(
        sort_array(transform(filter(hof, t => length(t) === 3),
          t => xxhash64(t))).as("hof"),
        sort_array(ShingleExpressions.hashedChargrams(norm, 3)).as("native"))
      .filter(col("hof") =!= col("native")).count()
    assert(mismatches == 0)
  }

  test("chargram edges: unicode, shorter than n, exact n") {
    import s.implicits._
    val edge = Seq("", "ab", "abc", "日本語のテキスト", "añés mixé",
      "x y").toDF("text")
    val norm = lower(regexp_replace(col("text"), "\\s+", " "))
    val chars = split(norm, "")
    val sh1 = slice(chars, lit(2), greatest(size(chars) - 1, lit(0)))
    val sh2 = slice(chars, lit(3), greatest(size(chars) - 2, lit(0)))
    val hof = slice(
      zip_with(zip_with(chars, sh1, (a, b) => concat(a, b)), sh2,
        (ab, c) => concat(ab, c)),
      lit(1), greatest(size(chars) - 2, lit(1)))
    val mism = edge.select(
        sort_array(transform(filter(hof, t => length(t) === 3),
          t => xxhash64(t))).as("hof"),
        sort_array(ShingleExpressions.hashedChargrams(norm, 3)).as("native"))
      .filter(col("hof") =!= col("native")).count()
    assert(mism == 0)
  }

  test("chargram strings == substr HOF form (real docs + edges)") {
    val docs = s.read.parquet(s"$sf/documents.parquet")
      .select(col("text"))
    import s.implicits._
    val edge = Seq("", "ab", "abc", "日本語のテキスト", "añés mixé",
      "x y").toDF("text")
    val norm = lower(regexp_replace(col("text"), "\\s+", " "))
    val hof = when(length(norm) >= 3,
      transform(sequence(lit(1), length(norm) - 2), i => norm.substr(i, lit(3))))
      .otherwise(array().cast("array<string>"))
    for (df <- Seq(docs, edge)) {
      val mism = df.select(hof.as("hof"),
          ShingleExpressions.chargramStrings(norm, 3).as("native"))
        .filter(col("hof") =!= col("native")).count()
      assert(mism == 0)
    }
  }

  test("edge cases: empty, single word, fewer words than k, runs of spaces") {
    import s.implicits._
    val edge = Seq("", "word", "two words", "a  b\t\tc", "  padded  ",
      "exactly three words", "\n", "a b c d e").toDF("text")
    val mism = edge.select(
        hofHashes(col("text"), 3).as("hof"),
        ShingleExpressions.hashedShingles(trim(lower(col("text"))), 3)
          .as("native"))
      .filter(col("hof") =!= col("native")).count()
    assert(mism == 0)
  }

  test("dhash sketch == driver-side byte replay (real docs + edges: " +
      "empty, 1-byte, sub-window, multi-byte UTF-8)") {
    // independent reference: bucket the bytes with a groupBy instead of
    // the kernel's accumulate-in-place loop
    def ref(bytes: Array[Byte]): Long = {
      if (bytes.isEmpty) return 0L
      val n = bytes.length
      val sums = bytes.indices
        .groupBy(p => ((p.toLong * 65L) / n).toInt)
        .view.mapValues(_.map(p => (bytes(p) & 0xFF).toLong).sum).toMap
        .withDefaultValue(0L)
      (0 until 64).map { i =>
        if (sums(i) > sums(i + 1)) 1L << i else 0L
      }.sum
    }
    import s.implicits._
    val edges = Seq("", "a", "ab", "héllo wörld 世界",
      "x" * 64, "abc" * 200).toDF("t")
    val docs = s.read.parquet(s"$sf/documents.parquet")
      .select(col("text").as("t"))
    val rows = docs.unionByName(edges).filter(col("t").isNotNull)
      .select(col("t"),
        ShingleExpressions.dhashSketch(col("t").cast("binary")).as("dh"))
      .collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val expect = ref(r.getString(0).getBytes("UTF-8"))
      assert(r.getLong(1) == expect,
        s"dhash diverged on ${r.getString(0).take(40)}: " +
          s"got ${r.getLong(1)}, expected $expect")
    }
  }

  test("sketch kernels resolve from PURE SQL text like built-ins " +
      "(GraftExtensions injection)") {
    // dhash_sketch / cms_buckets / kmv_sketch / winnow_fingerprints
    // compose in one spark.sql statement with no call-site registration
    val r = s.sql("""
      SELECT dhash_sketch(CAST('abcabcabc' AS BINARY)) AS dh,
             size(cms_buckets('a b a', 4, 1024)) AS n_cells,
             kmv_sketch(h, 4) AS sk
      FROM (SELECT explode(winnow_fingerprints('w1 w2 w3 w4', 3, 1)) AS h)
      GROUP BY 1, 2""").collect()
    assert(r.length == 1)
    assert(r.head.getLong(0) ==
      ShingleKernel.dhashSketch("abcabcabc".getBytes("UTF-8")))
    // 2 distinct words × 4 hash rows = 8 distinct grid cells
    assert(r.head.getInt(1) == 8)
    // 2 distinct 3-shingles of a 4-word doc, both kept at k=4
    assert(r.head.getSeq[Long](2).length == 2)
  }

  test("minhash_sketch resolves from PURE SQL text and matches the " +
      "typed MinHashAgg signature") {
    // the SQL-registered aggregate must produce the SAME 32-slot
    // signature as the DataFrame route (shared hashParams), or the
    // dedup_sql_text row would silently diverge from Dedup.minhashLsh
    val sqlSig = s.sql("""
      SELECT minhash_sketch(h, 8) AS sig
      FROM (SELECT explode(hashed_shingles('w1 w2 w3 w4 w5', 3)) AS h)
      """).collect().head.getSeq[Long](0)
    import org.apache.spark.sql.functions.{col, explode, lit}
    val typedSig = s.range(1)
      .select(explode(ShingleExpressions.hashedShingles(
        lit("w1 w2 w3 w4 w5"), 3)).as("h"))
      .agg(graft.functions.MinHashAgg.minhashSketch(col("h"), 8).as("sig"))
      .collect().head.getSeq[Long](0)
    assert(sqlSig == typedSig)
    assert(sqlSig.length == 8)
  }

  test("cmsCell enforces the single-byte hash-row bound [0, 9]") {
    assert(ShingleKernel.cmsCell(0, "w", 1024) ==
      ShingleKernel.cmsCell(0, "w", 1024))
    val e = intercept[IllegalArgumentException] {
      ShingleKernel.cmsCell(10, "w", 1024)
    }
    assert(e.getMessage.contains("[0, 9]"))
    intercept[IllegalArgumentException] {
      ShingleKernel.cmsCell(-1, "w", 1024)
    }
  }
}
