package graft.tools
import org.apache.spark.sql.functions._

/** Builder-side stage profiler for the composed curate-ingest door:
  * replays ONE micro-batch's work (the even-id document wave) with an
  * eager action after every stage, printing per-stage wall time — the
  * tool that tells us where `stream_curate_ingest`'s per-batch seconds
  * actually go (static verdicts vs LSH probe vs the appends). Not part
  * of the shipped library.
  */
object CurateProf {
  def main(args: Array[String]): Unit = {
    val spark = graft.SparkEnv.session()
    val sf = args.headOption.getOrElse("/root/testdata/sf0.1")
    val docs = spark.read.parquet(s"$sf/documents.parquet").localCheckpoint()
    def time[A](name: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"PROF $name ${(System.nanoTime() - t0) / 1e9}%.2f s")
      r
    }
    // scenario artifacts (same recipe as the bench scenario)
    val bench = docs
      .withColumn("bucket", graft.pipeline.Sampling.bucketCol(col("doc_id")))
      .filter(col("bucket") >= 90)
      .select(explode(graft.functions.ShingleExpressions.hashedShingles(
        trim(lower(col("text"))), 8)).as("_gram"))
      .distinct().localCheckpoint(true)
    val (w, p) = graft.pipeline.TextAnalysis.nbTrain(docs,
      col("source").isin("src0", "src1"))
    val weights = w.localCheckpoint(); val prior = p.localCheckpoint()
    val base = java.nio.file.Files.createTempDirectory("graft-cprof-")
    val idxLoc = base.resolve("index").toString
    graft.pipeline.IncrementalDedup.build(docs.limit(0), idxLoc)
    val keptT = graft.lake.LakeTable.create(spark,
      base.resolve("kept").toString, Left(docs.schema))
    val batch = docs.filter(col("doc_id") % 2 === 0).localCheckpoint(true)
    println(s"batch rows: ${batch.count()}")
    val benchB = broadcast(bench)

    for (pass <- 1 to 2) {
      println(s"--- pass $pass ---")
      val grams = batch.select(col("doc_id"),
        explode(graft.functions.ShingleExpressions.hashedShingles(
          trim(lower(col("text"))), 8)).as("_gram"))
      val contaminated = grams.join(benchB, Seq("_gram"), "left_semi")
        .select("doc_id").distinct()
      time("verdict_decontam")(contaminated.count())
      val qualIds = graft.pipeline.TextAnalysis.qualityGate(batch)
        .filter(col("keep")).select("doc_id")
      time("verdict_gate")(qualIds.count())
      val clsIds = graft.pipeline.TextAnalysis.nbScore(batch, weights, prior)
        .filter(col("log_odds") >= -1e18).select("doc_id")
      time("verdict_classifier")(clsIds.count())
      val statics = time("statics_checkpoint")(batch
        .join(contaminated, Seq("doc_id"), "left_anti")
        .join(qualIds, Seq("doc_id"), "left_semi")
        .join(clsIds, Seq("doc_id"), "left_semi")
        .localCheckpoint(true))
      val idx = time("index_load")(
        graft.pipeline.IncrementalDedup.load(spark, idxLoc))
      val (nb, nt) = graft.pipeline.IncrementalDedup.sketch(idx, statics)
      val bands = time("sketch_bands_checkpoint")(nb.localCheckpoint(true))
      val toks = time("sketch_toks_checkpoint")(nt.localCheckpoint(true))
      val losers = graft.pipeline.IncrementalDedup
        .nearDupPairsSketched(idx, bands, toks, 0.5)
        .select(col("id_b").as("doc_id")).distinct()
      time("neardup_pairs")(losers.count())
      val keptRows = time("kept_checkpoint")(
        statics.join(losers, Seq("doc_id"), "left_anti")
          .localCheckpoint(true))
      val keptIds = keptRows.select("doc_id")
      time("index_append")(graft.pipeline.IncrementalDedup
        .appendIdempotentSketched(idx,
          bands.join(keptIds, Seq("doc_id"), "left_semi"),
          toks.join(keptIds, Seq("doc_id"), "left_semi"),
          "graft.ingest.batch", s"prof-$pass"))
      time("kept_append")(keptT.append(keptRows,
        summary = Map("graft.ingest.batch" -> s"prof-$pass")))
    }
    spark.stop()
  }
}
