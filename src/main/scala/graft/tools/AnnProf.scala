package graft.tools
import org.apache.spark.sql.functions._

/** Builder-side stage profiler for the streaming-ANN scenario: times
  * each piece of `stream_ann_ingest`'s one-time setup (deterministic
  * quantizer fit, full-corpus assignment + cell-partitioned persist,
  * wave-dir write, the exactly-once multiset audit) plus the recall
  * certification read — the breakdown behind the query's scenario_s.
  * Not part of the shipped library.
  */
object AnnProf {
  def main(args: Array[String]): Unit = {
    val spark = graft.SparkEnv.session()
    val sf = args.headOption.getOrElse("/root/testdata/sf0.1")
    def time[A](name: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"PROF $name ${(System.nanoTime() - t0) / 1e9}%.2f s")
      r
    }
    val raw = spark.read.parquet(s"$sf/embeddings.parquet")
    val emb = raw.select(col("vec_id"),
      col("embedding").cast("array<double>").as("embedding"))
    println(s"corpus rows: ${emb.count()}")
    for (pass <- 1 to 2) {
      println(s"--- pass $pass ---")
      val even = emb.filter(col("vec_id") % 2 === 0)
      val idx = time("fit_deterministic")(
        graft.pipeline.Similarity.buildIvfDeterministic(
          even, nlist = 16, maxTrainRows = 4096))
      val base = java.nio.file.Files.createTempDirectory("graft-aprof-")
      val idxLoc = base.resolve("index").toString
      time("persist")(graft.pipeline.Similarity.persistIvf(idx, idxLoc))
      val t = graft.pipeline.Similarity.loadIvf(spark, idxLoc).table.get
      // the exactly-once audit shape (vs the ingested half here: the
      // bench compares the FULL source after both waves land)
      val idxIds = t.read().select("vec_id")
      val srcIds = even.select("vec_id")
      time("audit_counts")(idxIds.count() + srcIds.count())
      time("audit_excepts")(
        idxIds.except(srcIds).isEmpty && srcIds.except(idxIds).isEmpty)
      val loaded = graft.pipeline.Similarity.loadIvf(spark, idxLoc)
      val queries = emb.filter(col("vec_id") < 5)
      val exact = graft.pipeline.Similarity
        .bruteForceTopK(emb, queries, k = 10)
        .select("query_id", "neighbor")
      time("certify_bruteforce")(exact.count())
      val approx = graft.pipeline.Similarity
        .ivfTopK(loaded, queries, k = 10, nprobe = 4)
        .select("query_id", "neighbor")
      time("certify_ivf_probe")(approx.count())
    }
    spark.stop()
  }
}
