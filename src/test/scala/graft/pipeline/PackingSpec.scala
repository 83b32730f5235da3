package graft.pipeline

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark

/** Packing/chunking invariants beyond the oracle hash-match: exact
  * offset arithmetic on constructed corpora, stream contiguity, chunk
  * coverage, and shard parallelism.
  */
class PackingSpec extends AnyFunSuite {
  import TestSpark._
  private lazy val s = spark

  private def docsOf(tokenCounts: Seq[Int]) = {
    import s.implicits._
    tokenCounts.zipWithIndex
      .map { case (n, i) => (i.toLong, Seq.fill(n)("w").mkString(" ")) }
      .toDF("doc_id", "text")
  }

  test("single shard: offsets are the running sum; straddles split " +
      "across sequence ids exactly") {
    val out = Packing.packSequences(docsOf(Seq(300, 300, 500)),
        seqLen = 512, shards = 1)
      .orderBy("doc_id")
      .select("start_offset", "first_seq", "last_seq")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    // doc0 [0,300) fits seq 0; doc1 [300,600) straddles 0→1;
    // doc2 [600,1100) straddles 1→2
    assert(out.toSeq == Seq((0L, 0L, 0L), (300L, 0L, 1L), (600L, 1L, 2L)))
  }

  test("pack report: exact utilization accounting on a constructed " +
      "shard (tail waste, boundary straddles, ceil sequence count)") {
    // one shard, seqLen=10, token stream 4+5+3+9 = 21:
    // offsets 0,4,9,12 → doc 2 (9..11) and doc 3 (12..20) straddle a
    // boundary; 3 sequences of capacity 30 → tail waste 9
    val out = Packing.packReport(docsOf(Seq(4, 5, 3, 9)), seqLen = 10,
        shards = 1)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getLong(5), r.getDouble(6)))
    assert(out.toSeq == Seq((0L, 4L, 21L, 3L, 2L, 9L, 0.7)))
  }

  test("per-shard streams are gapless and start at zero") {
    val docs = s.read.parquet(s"$sf/documents.parquet")
    val packed = Packing.packSequences(docs, seqLen = 512, shards = 4)
    val rows = packed.orderBy("shard", "doc_id")
      .select("shard", "n_tokens", "start_offset")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    rows.groupBy(_._1).foreach { case (shard, ds) =>
      var expected = 0L
      ds.foreach { case (_, n, start) =>
        assert(start == expected, s"gap in shard $shard at offset $start")
        expected = start + n
      }
    }
    // the md5 shard split actually spreads the corpus
    assert(rows.map(_._1).distinct.length == 4)
  }

  test("chunking covers every token at the declared stride") {
    val ten = docsOf(Seq(10))
    val out = Packing.chunkSliding(ten, chunk = 4, stride = 3)
      .orderBy("chunk_idx")
      .select("chunk_idx", "chunk_tokens")
      .collect().map(r => (r.getInt(0), r.getInt(1)))
    // starts 0,3,6,9 → sizes 4,4,4,1
    assert(out.toSeq == Seq((0, 4), (1, 4), (2, 4), (3, 1)))
    val (lastIdx, lastTokens) = out.last
    assert(lastIdx * 3 + lastTokens == 10, "last chunk must end at n")
  }

  test("chunk md5 is the md5 of the chunk's joined tokens") {
    import s.implicits._
    val df = Seq((1L, "alpha beta gamma delta epsilon")).toDF("doc_id", "text")
    val got = Packing.chunkSliding(df, chunk = 3, stride = 2)
      .orderBy("chunk_idx").select("chunk_md5").as[String].collect()
    def md5hex(x: String): String =
      java.security.MessageDigest.getInstance("MD5")
        .digest(x.getBytes("UTF-8")).map("%02x".format(_)).mkString
    assert(got.toSeq == Seq(md5hex("alpha beta gamma"),
      md5hex("gamma delta epsilon"), md5hex("epsilon")))
  }

  test("chunking is a generate-only plan — no exchange") {
    val docs = s.read.parquet(s"$sf/documents.parquet")
    val plan = Packing.chunkSliding(docs)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"chunking must not shuffle:\n$plan")
  }
}
