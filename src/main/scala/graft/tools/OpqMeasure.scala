package graft.tools

import org.apache.spark.sql.functions._

/** Measure-first probe for OPQ (Ge et al. 2013, "Optimized Product
  * Quantization"): does a learned rotation before PQ move recall/MSE on
  * these fixtures? Compares [[graft.pipeline.Similarity.pqMetrics]] on
  * the raw corpus vs the full-d PCA-rotated corpus (the OPQ paper's
  * strong baseline; rotation is orthogonal, so exact neighbors are
  * unchanged and any delta is purely the quantizer's). On iid-gaussian
  * fixtures the covariance is ~spherical, so the expected answer is
  * "unobservable" — this probe exists to replace that expectation with
  * numbers (recorded in SURVEY §"measured dead ends") before any
  * operator is built.
  */
object OpqMeasure {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val spark = graft.SparkEnv.session()
    val emb = spark.read.parquet(s"$sfDir/embeddings.parquet")
      .select(col("vec_id"),
        col("embedding").cast("array<double>").as("embedding"))
    val d = emb.select(size(col("embedding"))).first().getInt(0)
    val raw = graft.pipeline.Similarity
      .pqMetrics(emb, 5, 10, 100, "embedding", "vec_id")
    val model = graft.pipeline.Similarity.pcaFit(emb, d)
    val rot = graft.pipeline.Similarity.pcaProject(emb, model)
      .select(col("vec_id"),
        array((1 to d).map(i => col(s"pc$i")): _*).as("embedding"))
    val r2 = graft.pipeline.Similarity
      .pqMetrics(rot, 5, 10, 100, "embedding", "vec_id")
    println(f"opq-probe sf=$sfDir raw:     recall=${raw._2}%.4f " +
      f"mse=${raw._3}%.6f var=${raw._4}%.6f mseFrac=${raw._3 / raw._4}%.4f")
    println(f"opq-probe sf=$sfDir rotated: recall=${r2._2}%.4f " +
      f"mse=${r2._3}%.6f var=${r2._4}%.6f mseFrac=${r2._3 / r2._4}%.4f")
    spark.stop()
  }
}
