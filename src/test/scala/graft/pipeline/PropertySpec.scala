package graft.pipeline

import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, rng}
import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark

/** Seeded property tests: each operator's distributed plan is replayed
  * against a LOCAL reference implementation over randomized inputs —
  * the shapes a fixture corpus can't cover (adversarial budgets, odd
  * shard layouts, random graphs). Fixed seeds keep every run
  * deterministic; case counts are small because each case is a Spark
  * job, and the generators bias toward boundary-heavy smallness.
  */
class PropertySpec extends AnyFunSuite {
  import TestSpark._
  private lazy val s = spark

  private val params = Gen.Parameters.default
  private def draw[A](g: Gen[A], seed: rng.Seed): (A, rng.Seed) =
    (g.pureApply(params, seed), seed.next)

  test("property: attrition report equals the local cumulative fold " +
      "over random flag funnels (nulls, empty stages, token sums)") {
    val spark = s
    import spark.implicits._
    val rowsGen = for {
      n <- Gen.choose(0, 40) // 0 on purpose: the empty-input edge
      rows <- Gen.listOfN(n, for {
        fa <- Gen.oneOf(Some(true), Some(false), None) // null verdicts
        fb <- Gen.oneOf(true, false)
        fc <- Gen.oneOf(true, false)
        toks <- Gen.oneOf(Some(0L), Some(7L), Some(31L),
          None: Option[Long]) // null token counts
      } yield (fa, fb, fc, toks))
    } yield rows.zipWithIndex.map { case ((a, b, c, t), i) =>
      (i.toLong, a, b, c, t)
    }
    var seed = rng.Seed(7L)
    for (_ <- 1 to 8) {
      val (rows, s1) = draw(rowsGen, seed)
      seed = s1
      val df = rows.toDF("doc_id", "fa", "fb", "fc", "toks")
      val got = Attrition.report(df, Seq("a" -> col("fa"),
          "b" -> col("fb"), "c" -> col("fc")), col("toks"))
        .orderBy("stage_ord").collect()
        .map(r => (r.getString(1), r.getLong(2), r.getLong(3),
          r.getLong(4)))
      // local fold: survive stage k iff flags 1..k all TRUE (null =
      // fail); tokens of survivors with null-as-0
      val survs = Seq[((Option[Boolean], Boolean, Boolean)) => Boolean](
        _ => true,
        f => f._1.contains(true),
        f => f._1.contains(true) && f._2,
        f => f._1.contains(true) && f._2 && f._3)
      val names = Seq("ingest", "a", "b", "c")
      val local = survs.zip(names).map { case (p, nm) =>
        val kept = rows.filter(r => p((r._2, r._3, r._4)))
        (nm, kept.size.toLong, kept.map(_._5.getOrElse(0L)).sum)
      }
      val expect = local.zipWithIndex.map { case ((nm, n, t), k) =>
        (nm, n, t, if (k == 0) 0L else local(k - 1)._2 - n)
      }
      assert(got.toSeq == expect, s"rows=$rows")
    }
  }

  test("property: tokenBudgetMix equals the local flat greedy and " +
      "never exceeds a stratum's budget (both boundary paths)") {
    val spark = s
    import spark.implicits._
    val corpusGen = for {
      n <- Gen.choose(5, 60)
      rows <- Gen.listOfN(n, for {
        lang <- Gen.oneOf("en", "fr", "de")
        toks <- Gen.choose(1, 50)
        // coarse levels on purpose: boundary TIES are the hard case
        q <- Gen.oneOf(0.1, 0.5, 0.9)
      } yield (lang, toks, q))
    } yield rows.zipWithIndex.map { case ((l, t, q), i) =>
      (i.toLong, l, t.toLong, q)
    }
    var seed = rng.Seed(99L)
    for (_ <- 1 to 6; parts <- Seq(0, 4)) {
      val (rows, s1) = draw(corpusGen, seed)
      val (budget, s2) = draw(Gen.choose(1L, 120L), s1)
      seed = s2
      val df = rows.toDF("doc_id", "lang", "n_tokens", "quality_score")
      val kept = Sampling.tokenBudgetMix(df, budget,
          boundaryRangePartitions = parts)
        .select("doc_id").collect().map(_.getLong(0)).toSet
      // PREFIX greedy (the operator's contract): the first overshooting
      // doc CUTS its stratum — later, smaller docs do not backfill
      val local = rows.groupBy(_._2).flatMap { case (_, rs) =>
        var acc = 0L
        var open = true
        rs.sortBy(r => (-r._4, r._1)).flatMap { r =>
          if (open && acc + r._3 <= budget) { acc += r._3; Some(r._1) }
          else { open = false; None }
        }
      }.toSet
      assert(kept == local,
        s"budget=$budget parts=$parts kept=$kept local=$local rows=$rows")
      val perStratum = rows.filter(r => kept(r._1)).groupBy(_._2)
        .view.mapValues(_.map(_._3).sum)
      assert(perStratum.values.forall(_ <= budget),
        s"hard cap violated: $perStratum budget=$budget")
    }
  }

  test("property: packCounts offsets are the per-shard prefix sums and " +
      "the seq ids are exact integer arithmetic") {
    val spark = s
    import spark.implicits._
    val gen = for {
      n <- Gen.choose(3, 50)
      seqLen <- Gen.oneOf(8, 64, 512)
      shards <- Gen.oneOf(1, 3, 8)
      toks <- Gen.listOfN(n, Gen.choose(1L, 200L))
    } yield (toks.zipWithIndex.map { case (t, i) => (i.toLong, t) },
      seqLen, shards)
    var seed = rng.Seed(7L)
    for (_ <- 1 to 6) {
      val ((rows, seqLen, shards), s1) = draw(gen, seed)
      seed = s1
      val df = rows.toDF("doc_id", "n_tokens")
      val out = Packing.packCounts(df, col("n_tokens"), seqLen, shards)
        .select("doc_id", "n_tokens", "shard", "start_offset",
          "first_seq", "last_seq")
        .collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
          r.getLong(3), r.getLong(4), r.getLong(5)))
      assert(out.length == rows.length, "every doc packs exactly once")
      out.groupBy(_._3).foreach { case (_, shardRows) =>
        var acc = 0L
        shardRows.sortBy(_._1).foreach {
          case (id, n, _, off, first, last) =>
            assert(off == acc, s"doc $id offset $off != prefix $acc")
            assert(first == off / seqLen && last == (off + n - 1) / seqLen,
              s"doc $id seq span wrong")
            acc += n
        }
      }
    }
  }

  test("property: components equals a local union-find on random " +
      "edge sets") {
    val spark = s
    import spark.implicits._
    val gen = for {
      nodes <- Gen.choose(2, 30)
      m <- Gen.choose(1, 40)
      edges <- Gen.listOfN(m, for {
        a <- Gen.choose(0L, nodes.toLong - 1)
        b <- Gen.choose(0L, nodes.toLong - 1)
        if a != b
      } yield (math.min(a, b), math.max(a, b)))
    } yield edges.distinct
    var seed = rng.Seed(13L)
    for (_ <- 1 to 6) {
      val (edges, s1) = draw(gen, seed)
      seed = s1
      val got = Dedup.components(edges.toDF("id_a", "id_b"))
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      // local union-find with min-id labels
      val parent = scala.collection.mutable.Map[Long, Long]()
      def find(x: Long): Long = {
        val p = parent.getOrElse(x, x)
        if (p == x) x else { val r = find(p); parent(x) = r; r }
      }
      edges.foreach { case (a, b) =>
        val (ra, rb) = (find(a), find(b))
        if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
      }
      val ids = edges.flatMap(e => Seq(e._1, e._2)).distinct
      val local = ids.map(x => x -> find(x)).toMap
      assert(got == local,
        s"components mismatch on $edges: got=$got local=$local")
    }
  }

  test("property: semanticDedup equals the local cell-scoped dominance " +
      "rule on random vector sets") {
    val spark = s
    import spark.implicits._
    val gen = for {
      n <- Gen.choose(6, 40)
      dim <- Gen.oneOf(4, 8)
      vecs <- Gen.listOfN(n, Gen.listOfN(dim,
        Gen.choose(-5, 5).map(_.toDouble)))
      // sprinkle exact copies so pairs actually cross the threshold
      dup <- Gen.choose(1, 4)
    } yield {
      val base = vecs.zipWithIndex.map { case (v, i) => (i.toLong, v) }
      val twins = base.take(dup).map { case (id, v) =>
        (1000L + id, v)
      }
      base ++ twins
    }
    var seed = rng.Seed(31L)
    for (_ <- 1 to 5) {
      val (rows, s1) = draw(gen, seed)
      seed = s1
      // drop all-zero vectors: cosine is undefined there, and the
      // operator's null-denominator convention isn't the property under
      // test
      val live = rows.filter(_._2.exists(_ != 0.0))
      val nCells = math.min(3, live.size)
      val df = live.toDF("vec_id", "embedding")
      val cents = live.take(nCells).zipWithIndex
        .map { case ((_, v), i) => (i.toLong, v) }
      val got = Dedup.semanticDedup(df,
          cents.toDF("cell", "cvec"), cosineThreshold = 0.999)
        .collect().map(r => r.getLong(0) -> ((r.getLong(1),
          r.getBoolean(2)))).toMap
      // local reference
      def cos(a: Seq[Double], b: Seq[Double]): Double = {
        val dot = a.zip(b).map { case (x, y) => x * y }.sum
        val na = math.sqrt(a.map(x => x * x).sum)
        val nb = math.sqrt(b.map(x => x * x).sum)
        dot / (na * nb)
      }
      val assign = live.map { case (id, v) =>
        val best = cents.map { case (c, cv) => (c, cos(v, cv)) }
          .sortBy { case (c, sim) => (-sim, c) }.head._1
        id -> best
      }.toMap
      val vmap = live.toMap
      live.foreach { case (id, v) =>
        val cell = assign(id)
        val dominated = live.exists { case (oid, ov) =>
          oid < id && assign(oid) == cell &&
            math.rint(cos(ov, v) * 1e6) / 1e6 >= 0.999
        }
        assert(got(id) == ((cell, !dominated)),
          s"vec $id: got=${got(id)} want=(${cell}, ${!dominated})")
      }
    }
  }

  test("property: dsirScores equals a local reference (md5 buckets, " +
      "add-one smoothing, occurrence log-ratio sums) on random corpora") {
    val spark = s
    import spark.implicits._
    val words = Seq("the", "cat", "sat", "mat", "dog", "zzz", "qqq")
    val gen = for {
      n <- Gen.choose(4, 24)
      docs <- Gen.listOfN(n, for {
        len <- Gen.choose(2, 10)
        ws <- Gen.listOfN(len, Gen.oneOf(words))
        t <- Gen.oneOf(true, false)
      } yield (ws.mkString(" "), t))
    } yield docs.zipWithIndex.map { case ((txt, t), i) =>
      (i.toLong, txt, t)
    }
    def bucket(gram: String, b: Int): Long = {
      val hex = java.security.MessageDigest.getInstance("MD5")
        .digest(gram.getBytes("UTF-8"))
        .map("%02x".format(_)).mkString.take(8)
      java.lang.Long.parseLong(hex, 16) % b
    }
    val B = 64
    var seed = rng.Seed(47L)
    for (_ <- 1 to 5) {
      val (docs, s1) = draw(gen, seed)
      seed = s1
      // need both a target and a candidate side
      if (docs.exists(_._3) && docs.exists(!_._3)) {
        val df = docs.toDF("doc_id", "text", "is_t")
        val got = Sampling.dsirScores(df, col("is_t"), buckets = B)
          .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
        val grams = docs.flatMap { case (id, txt, t) =>
          val ws = txt.split("\\s+")
          ws.zip(ws.drop(1)).map { case (a, b) =>
            (id, t, bucket(s"$a $b", B))
          }
        }
        val tCnt = grams.filter(_._2).groupBy(_._3)
          .view.mapValues(_.size.toLong).toMap
        val rCnt = grams.filter(!_._2).groupBy(_._3)
          .view.mapValues(_.size.toLong).toMap
        val tTot = tCnt.values.sum
        val rTot = rCnt.values.sum
        val local = grams.filter(!_._2).groupBy(_._1)
          .view.mapValues { gs =>
            val sum = gs.map { case (_, _, bkt) =>
              math.log((tCnt.getOrElse(bkt, 0L) + 1.0) / (tTot + B)) -
                math.log((rCnt(bkt) + 1.0) / (rTot + B))
            }.sum
            BigDecimal(sum).setScale(6,
              BigDecimal.RoundingMode.HALF_UP).toDouble
          }.toMap
        assert(got.keySet == local.keySet,
          s"scored doc sets differ: ${got.keySet} vs ${local.keySet}")
        got.foreach { case (id, sc) =>
          assert(math.abs(sc - local(id)) <= 1e-6,
            s"doc $id: got $sc local ${local(id)}")
        }
      }
    }
  }

  test("property: BPE train + encode equal a local reference " +
      "(weighted argmax, greedy non-overlapping merges) on random corpora") {
    val spark = s
    import spark.implicits._
    val wordGen = for {
      len <- Gen.choose(1, 6)
      cs <- Gen.listOfN(len, Gen.oneOf('a', 'b'))
    } yield cs.mkString
    val corpusGen = for {
      n <- Gen.choose(2, 8)
      docs <- Gen.listOfN(n, Gen.listOfN(5, wordGen).map(_.mkString(" ")))
    } yield docs.zipWithIndex.map { case (t, i) => (i.toLong, t) }

    def mergeSeq(syms: List[String], l: String, r: String): List[String] = {
      val out = scala.collection.mutable.ListBuffer.empty[String]
      var i = 0
      while (i < syms.length) {
        if (i + 1 < syms.length && syms(i) == l && syms(i + 1) == r) {
          out += (l + r); i += 2
        } else { out += syms(i); i += 1 }
      }
      out.toList
    }
    def localBpe(texts: Seq[String], rounds: Int)
        : (Seq[(Int, String, String, Long)], Map[String, List[String]]) = {
      val words = texts.flatMap(_.trim.toLowerCase.split("\\s+"))
      val weight = words.groupBy(identity).view.mapValues(_.size.toLong)
        .toMap
      var segs: Map[String, List[String]] =
        words.distinct.map(w => w -> w.map(_.toString).toList).toMap
      val merges =
        scala.collection.mutable.ArrayBuffer.empty[(Int, String, String, Long)]
      var r = 1
      var done = false
      while (r <= rounds && !done) {
        val counts = scala.collection.mutable.Map.empty[(String, String), Long]
        segs.foreach { case (w, sy) =>
          sy.zip(sy.drop(1)).foreach { p =>
            counts(p) = counts.getOrElse(p, 0L) + weight(w)
          }
        }
        if (counts.isEmpty) done = true
        else {
          val ((l, rr), n) = counts.toSeq
            .sortBy { case ((l0, r0), n0) => (-n0, l0, r0) }.head
          merges += ((r, l, rr, n))
          segs = segs.view.mapValues(mergeSeq(_, l, rr)).toMap
          r += 1
        }
      }
      (merges.toSeq, segs)
    }

    var seed = rng.Seed(7L)
    for (_ <- 1 to 5) {
      val (docs, s1) = draw(corpusGen, seed)
      seed = s1
      val df = docs.toDF("doc_id", "text")
      val (expMerges, segs) = localBpe(docs.map(_._2), rounds = 5)
      val gotMerges = TextAnalysis.bpeTrain(df, rounds = 5).collect()
        .map(r => (r.getInt(0), r.getString(1), r.getString(2), r.getLong(3)))
        .toSeq
      assert(gotMerges == expMerges,
        s"merge tables differ:\n got $gotMerges\n exp $expMerges\n docs $docs")
      val gotEnc = TextAnalysis.bpeEncode(df, rounds = 5).collect()
        .map(r => r.getLong(0) -> ((r.getInt(1), r.getLong(2)))).toMap
      docs.foreach { case (id, t) =>
        val ws = t.trim.toLowerCase.split("\\s+").toSeq
        val exp = (ws.length, ws.map(w => segs(w).length.toLong).sum)
        assert(gotEnc(id) == exp,
          s"doc $id: got ${gotEnc(id)} exp $exp text '$t'")
      }
    }
  }

  test("property: heavyHitters with ample counters equals the local " +
      "exact top-k with a TRUE certificate") {
    val spark = s
    import spark.implicits._
    val vocab = ('a' to 't').map(_.toString)
    val gen = for {
      n <- Gen.choose(5, 40)
      docs <- Gen.listOfN(n, Gen.nonEmptyListOf(
        // zipf-ish: early vocab words much likelier
        Gen.frequency(vocab.zipWithIndex.map { case (w, i) =>
          (vocab.size - i, Gen.const(w))
        }: _*)))
    } yield docs.zipWithIndex.map { case (ws, i) =>
      (i.toLong, ws.mkString(" "))
    }
    var seed = rng.Seed(23L)
    for (_ <- 1 to 5) {
      val (docs, s1) = draw(gen, seed)
      seed = s1
      val got = TextAnalysis.heavyHitters(
          docs.toDF("doc_id", "text"), topK = 5, counters = 64)
        .collect().map(r => (r.getString(1), r.getLong(2), r.getBoolean(3)))
      assert(got.forall(_._3),
        s"counters=64 >= vocab=20 must certify exactness: ${got.toSeq}")
      val local = docs.flatMap(_._2.split("\\s+")).groupBy(identity)
        .view.mapValues(_.length.toLong).toSeq
        .sortBy { case (w, c) => (-c, w) }.take(5)
      assert(got.map(r => (r._1, r._2)).toSeq == local,
        s"top-k mismatch: got=${got.toSeq} local=$local")
    }
  }

  test("property: winnow kernel equals the composable-form local replay " +
      "over random texts (whitespace runs, unicode, short docs)") {
    import org.apache.spark.unsafe.types.UTF8String
    val md = java.security.MessageDigest.getInstance("MD5")
    def h60(x: String): Long = {
      val hex = md.digest(x.getBytes("UTF-8"))
        .map(b => f"$b%02x").mkString
      java.lang.Long.parseLong(hex.substring(17, 32), 16)
    }
    def local(text: String, k: Int, w: Int): Seq[Long] = {
      // the composable form: split(trim-input, "\\s+") with -1 limit,
      // positional k-grams, h60, clamped window minima, sorted distinct
      val words = text.split("\\s+", -1)
      val m = math.max(words.length - k + 1, 0)
      val hs = (0 until m).map(i =>
        h60(words.slice(i, i + k).mkString(" ")))
      if (hs.isEmpty) Seq.empty
      else (0 to math.max(hs.length - w, 0))
        .map(i => hs.slice(i, math.min(i + w, hs.length)).min)
        .distinct.sorted
    }
    val wordGen = Gen.oneOf("a", "bb", "ccc", "\u00e9\u00e9", "\u4e16\u754c",
      "z9", "", "longishword")
    val sepGen = Gen.oneOf(" ", "  ", "\t", " \t ", "\n")
    val textGen = for {
      n <- Gen.choose(0, 30)
      ws <- Gen.listOfN(n, wordGen)
      seps <- Gen.listOfN(math.max(n - 1, 0), sepGen)
    } yield (if (ws.isEmpty) ""
      else ws.head + seps.zip(ws.tail).map { case (sp, wd) => sp + wd }
        .mkString)
    var seed = rng.Seed(21L)
    for (_ <- 1 to 200) {
      val (text, s1) = draw(textGen, seed)
      val (k, s2) = draw(Gen.choose(1, 4), s1)
      val (w, s3) = draw(Gen.choose(1, 5), s2)
      seed = s3
      val got = graft.functions.ShingleKernel
        .winnow(UTF8String.fromString(text), k, w)
        .toLongArray().toSeq
      val want = local(text, k, w)
      assert(got == want,
        s"winnow(k=$k, w=$w) diverged on ${text.take(60).mkString}: " +
        s"kernel=$got local=$want")
    }
  }

  test("property: simhash kernel equals the vote-sum local replay " +
      "over random texts") {
    import org.apache.spark.unsafe.types.UTF8String
    val md = java.security.MessageDigest.getInstance("MD5")
    def h64(x: String): Long = {
      val hex = md.digest(x.getBytes("UTF-8"))
        .map(b => f"$b%02x").mkString
      java.lang.Long.parseUnsignedLong(hex.substring(16, 32), 16)
    }
    def local(text: String): Long = {
      val words = text.split("\\s+", -1)
      val ws = if (words.isEmpty) Array("") else words
      val votes = new Array[Int](64)
      ws.foreach { w =>
        val v = h64(w)
        (0 until 64).foreach { k =>
          if (((v >>> k) & 1L) != 0L) votes(k) += 1 else votes(k) -= 1 }
      }
      (0 until 64).foldLeft(0L) { (acc, k) =>
        if (votes(k) > 0) acc | (1L << k) else acc }
    }
    val wordGen = Gen.oneOf("a", "bb", "ccc", "\u00fc\u00fc", "word",
      "z9", "qqq")
    val textGen = for {
      n <- Gen.choose(0, 25)
      ws <- Gen.listOfN(n, wordGen)
    } yield ws.mkString(" ")
    var seed = rng.Seed(33L)
    for (_ <- 1 to 100) {
      val (text, s1) = draw(textGen, seed)
      seed = s1
      val got = graft.functions.ShingleKernel
        .simhashSketch(UTF8String.fromString(text))
      val want = local(text)
      assert(got == want, s"simhash diverged on '${text.take(50)}'")
    }
  }

  test("property: bigram-bucket kernel equals the composable local " +
      "replay over random texts") {
    import org.apache.spark.unsafe.types.UTF8String
    val md = java.security.MessageDigest.getInstance("MD5")
    def bkt(x: String, buckets: Int): Long = {
      val hex = md.digest(x.getBytes("UTF-8"))
        .map(b => f"$b%02x").mkString
      java.lang.Long.parseLong(hex.substring(0, 8), 16) % buckets
    }
    def local(text: String, buckets: Int): Map[Long, Long] = {
      val words = text.split("\\s+", -1)
      val ws = if (words.isEmpty) Array("") else words
      (0 until ws.length - 1)
        .map(i => bkt(ws(i) + " " + ws(i + 1), buckets))
        .groupBy(identity).map { case (b, xs) => (b, xs.length.toLong) }
    }
    val wordGen = Gen.oneOf("a", "bb", "ccc", "\u00e9z", "w", "", "xx")
    val sepGen = Gen.oneOf(" ", "  ", "\t")
    val textGen = for {
      n <- Gen.choose(0, 25)
      ws <- Gen.listOfN(n, wordGen)
      seps <- Gen.listOfN(math.max(n - 1, 0), sepGen)
    } yield (if (ws.isEmpty) ""
      else ws.head + seps.zip(ws.tail).map { case (sp, wd) => sp + wd }
        .mkString)
    var seed = rng.Seed(55L)
    for (_ <- 1 to 150) {
      val (text, s1) = draw(textGen, seed)
      val (buckets, s2) = draw(Gen.oneOf(7, 64, 1024), s1)
      seed = s2
      val got = graft.functions.ShingleKernel
        .bigramBuckets(UTF8String.fromString(text), buckets)
        .toLongArray().map(e => (e >> 32, e & 0xFFFFFFFFL)).toMap
      val want = local(text, buckets)
      assert(got == want,
        s"bigram buckets diverged on '${text.take(50)}' B=$buckets: " +
        s"kernel=$got local=$want")
    }
  }

  test("property: CMS grid kernel equals the per-word md5 replay over " +
      "random texts (any depth/width)") {
    import org.apache.spark.unsafe.types.UTF8String
    val md = java.security.MessageDigest.getInstance("MD5")
    def cell(d: Int, w: String, width: Int): Long = {
      val hex = md.digest((d + ":" + w).getBytes("UTF-8"))
        .map(b => f"$b%02x").mkString
      // chars 18..32 of the hex digest = the cross-engine 60-bit layout
      d.toLong * width +
        java.lang.Long.parseLong(hex.substring(17, 32), 16) % width
    }
    def local(text: String, depth: Int, width: Int): Map[Long, Long] = {
      val words = text.split("\\s+", -1)
      val ws = if (words.isEmpty) Array("") else words
      ws.flatMap(w => (0 until depth).map(d => cell(d, w, width)))
        .groupBy(identity).map { case (c, xs) => (c, xs.length.toLong) }
    }
    val wordGen = Gen.oneOf("a", "bb", "ccc", "éz", "w", "", "xx")
    val sepGen = Gen.oneOf(" ", "  ", "\t")
    val textGen = for {
      n <- Gen.choose(0, 25)
      ws <- Gen.listOfN(n, wordGen)
      seps <- Gen.listOfN(math.max(n - 1, 0), sepGen)
    } yield (if (ws.isEmpty) ""
      else ws.head + seps.zip(ws.tail).map { case (sp, wd) => sp + wd }
        .mkString)
    var seed = rng.Seed(91L)
    for (_ <- 1 to 150) {
      val (text, s1) = draw(textGen, seed)
      val (width, s2) = draw(Gen.oneOf(7, 64, 1024), s1)
      val (depth, s3) = draw(Gen.choose(1, 5), s2)
      seed = s3
      val got = graft.functions.ShingleKernel
        .cmsBuckets(UTF8String.fromString(text), depth, width)
        .toLongArray().map(e => (e >> 32, e & 0xFFFFFFFFL)).toMap
      val want = local(text, depth, width)
      assert(got == want,
        s"CMS grid diverged on '${text.take(50)}' d=$depth w=$width: " +
        s"kernel=$got local=$want")
    }
  }

  test("property: positional gram-string kernel equals the composable " +
      "replay over random texts") {
    import org.apache.spark.unsafe.types.UTF8String
    def local(text: String, k: Int): Seq[String] = {
      val words = text.split("\\s+", -1)
      val ws = if (words.isEmpty) Array("") else words
      val m = math.min(k, math.max(ws.length, 1))
      (0 until math.max(ws.length - k + 1, 1))
        .map(i => ws.slice(i, math.min(i + m, ws.length)).mkString(" "))
    }
    val wordGen = Gen.oneOf("a", "bb", "\u00e9\u00e9", "w9", "", "long")
    val sepGen = Gen.oneOf(" ", "  ", "\t", "\n")
    val textGen = for {
      n <- Gen.choose(0, 20)
      ws <- Gen.listOfN(n, wordGen)
      seps <- Gen.listOfN(math.max(n - 1, 0), sepGen)
    } yield (if (ws.isEmpty) ""
      else ws.head + seps.zip(ws.tail).map { case (sp, wd) => sp + wd }
        .mkString)
    var seed = rng.Seed(77L)
    for (_ <- 1 to 150) {
      val (text, s1) = draw(textGen, seed)
      val (k, s2) = draw(Gen.choose(1, 5), s1)
      seed = s2
      val arr = graft.functions.ShingleKernel
        .positionalGramStrings(UTF8String.fromString(text), k)
      val got = (0 until arr.numElements())
        .map(i => arr.getUTF8String(i).toString)
      val want = local(text, k)
      assert(got == want,
        s"gram strings diverged on '${text.take(50)}' k=$k: " +
        s"kernel=$got local=$want")
    }
  }

  test("property: KMV aggregate equals sorted-distinct-take-k under " +
      "any partitioning (duplicates, negatives, tiny k)") {
    val spark = s
    import spark.implicits._
    import graft.functions.KmvAgg.kmvSketch
    // the merge (union + re-truncate) must be partition-layout
    // independent: same multiset through 1, 3, or 13 partitions gives
    // the SAME sketch, and it equals the local k smallest distinct
    val valuesGen = for {
      n <- Gen.choose(0, 120)
      vs <- Gen.listOfN(n, Gen.oneOf(
        Gen.choose(0L, 30L),               // heavy duplicates
        Gen.choose(Long.MinValue, Long.MaxValue)))
    } yield vs
    var seed = rng.Seed(77L)
    for (_ <- 1 to 12) {
      val (vs, s1) = draw(valuesGen, seed)
      val (k, s2) = draw(Gen.oneOf(2, 4, 16, 64), s1)
      seed = s2
      val want = vs.distinct.sorted.take(k)
      val sketches = Seq(1, 3, 13).map { p =>
        val df =
          if (vs.isEmpty) spark.emptyDataset[Long].toDF("h")
          else vs.toDF("h").repartition(p)
        df.agg(kmvSketch(col("h"), k).as("sk"))
          .head().getSeq[Long](0).toList
      }
      // an empty input yields one empty-sketch row (global aggregate)
      assert(sketches.forall(_ == want),
        s"KMV diverged at k=$k over ${vs.size} values: " +
          s"got=${sketches.map(_.take(6))} want=${want.take(6)}")
    }
  }
}
