package graft.tools

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Physical-plan audit of the round-9 mining/selection operators:
  * exchange counts, broadcast joins, cartesian products. Builder-side
  * diagnostic (`runMain graft.tools.PlanAudit [sfDir]`) — the numbers
  * quoted in SURVEY §13 come from here.
  */
object PlanAudit {
  def main(args: Array[String]): Unit = {
    val d = args.headOption.getOrElse("/root/testdata/sf0.01")
    val spark = graft.SparkEnv.session()
    val docs = spark.read.parquet(s"$d/documents.parquet")
    val emb = spark.read.parquet(s"$d/embeddings.parquet")
    def audit(name: String, df: DataFrame): Unit = {
      val p = df.queryExecution.executedPlan.toString
      val ex = "Exchange".r.findAllIn(p).size
      val bc = "BroadcastHashJoin".r.findAllIn(p).size
      val cart = p.contains("CartesianProduct")
      println(s"AUDIT $name exchanges=$ex bcastJoins=$bc cartesian=$cart")
    }
    audit("nb_classifier", graft.pipeline.TextAnalysis.nbClassifier(
      docs, col("source").isin("src0", "src1")))
    audit("bitext", graft.pipeline.Similarity.bitextMine(emb,
      col("vec_id") % 2 === 0, col("vec_id") % 2 === 1))
    audit("triplets", graft.pipeline.Similarity.tripletMine(emb))
    audit("sem_decon", {
      val b = graft.pipeline.Sampling.bucketCol(col("vec_id"))
      graft.pipeline.Similarity.semanticDecontaminate(emb, b < 80,
        b >= 90)
    })
    audit("domain_weights", graft.pipeline.Sampling.domainWeights(
      docs, col("doc_id") % 5 === 0))
    spark.stop()
  }
}
