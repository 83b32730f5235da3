package graft.pipeline

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark

class QuantizeSpec extends AnyFunSuite {
  import TestSpark._
  private lazy val s = spark
  private lazy val emb = s.read.parquet(s"$sf/embeddings.parquet")

  test("int8 round-trip keeps cosine ≈ 1 against the original") {
    val q = emb.select(col("vec_id"), col("embedding"),
        Quantize.scaleOf(col("embedding")).as("scale"))
      .withColumn("q8", Quantize.quantize(col("embedding"), col("scale")))
      .withColumn("deq", Quantize.dequantize(col("q8"), col("scale")))
      .withColumn("fidelity",
        Similarity.cosine(col("embedding").cast("array<double>"),
          col("deq").cast("array<double>")))
    val minFid = q.agg(min("fidelity")).head().getDouble(0)
    assert(minFid > 0.999, s"worst-case quantization fidelity $minFid")
  }

  test("quantized ANN top-1 matches exact top-1 for most queries") {
    val base = emb.select(col("vec_id"),
      col("embedding").cast("array<double>").as("embedding"))
    val stored = emb.select(col("vec_id"),
        Quantize.quantize(col("embedding"),
          Quantize.scaleOf(col("embedding"))).as("q8"))
      .select(col("vec_id"), col("q8").cast("array<double>").as("embedding"))
    val queries = base.filter(col("vec_id") < 20)
    val exact = Similarity.bruteForceTopK(base, queries, k = 2)
      .filter(col("rank") === 2) // rank1 = self
      .select("query_id", "neighbor").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val approx = Similarity.bruteForceTopK(stored, queries, k = 2)
      .filter(col("rank") === 2)
      .select("query_id", "neighbor").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val agree = exact.count { case (qid, n) => approx.get(qid).contains(n) }
    assert(agree >= (exact.size * 0.8).toInt,
      s"int8 top-1 agreement only $agree/${exact.size}")
  }

  test("quality-aware dedup keeps the best-scoring cluster member") {
    import s.implicits._
    val docs = Seq(
      (1L, 0.2), (2L, 0.9), (3L, 0.5), // cluster {1,2,3} — keep 2
      (10L, 0.7), (11L, 0.7),          // cluster {10,11} — tie → keep 10
      (20L, 0.1)                       // singleton survives
    ).toDF("doc_id", "score")
    val pairs = Seq((1L, 2L), (2L, 3L), (10L, 11L)).toDF("id_a", "id_b")
    val kept = Dedup.dropDuplicatesByPairs(docs, pairs,
        keepBest = Some("score"))
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(kept == Set(2L, 10L, 20L))
  }
}
