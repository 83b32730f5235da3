package graft.tools
import org.apache.spark.sql.functions._
object GateProf {
  def main(args: Array[String]): Unit = {
    val spark = graft.SparkEnv.session()
    val docs = spark.read.parquet("/root/testdata/sf0.1/documents.parquet").localCheckpoint()
    def time(name: String)(f: => Long): Unit = {
      val t0 = System.nanoTime(); val n = f
      println(f"PROF $name ${(System.nanoTime()-t0)/1e9}%.2f s ($n rows)")
    }
    // warmup
    docs.count()
    time("gate_full")(graft.pipeline.TextAnalysis.qualityGate(docs).count())
    time("gate_full2")(graft.pipeline.TextAnalysis.qualityGate(docs).count())
    val t = col("text")
    val grams = {
      val words = split(trim(lower(t)), "\\s+")
      (1 until 10).foldLeft(words) { (acc, shift) =>
        zip_with(acc, slice(words, lit(shift + 1), greatest(size(words) - shift, lit(0))),
          (a, b) => concat_ws(" ", a, b))
      }
    }
    time("string_grams_distinct")(docs.select(size(array_distinct(grams)).as("x")).agg(sum("x")).count())
    val hashed = graft.functions.ShingleExpressions.hashedShingles(trim(lower(t)), 10)
    time("hashed_grams_distinct")(docs.select(size(array_distinct(hashed)).as("x")).agg(sum("x")).count())
    time("quality_score_only")(graft.pipeline.TextAnalysis.qualityScore(docs).agg(sum("quality_score")).count())
    spark.stop()
  }
}
