package graft

import org.apache.spark.sql.SparkSession

/** One place for the session settings every entry point (Verify, Bench,
  * tests, SparkEntry.entry) must share.
  *
  * Scale stance: these are the knobs that transfer from local[32] to a
  * real cluster — AQE on (runtime join re-planning, skew splitting,
  * partition coalescing), shuffle partitions sized to the parallelism at
  * hand rather than the 200 default, UTC session time zone for oracle
  * parity, and ns-parquet read as LongType so the TIMESTAMP(9) columns
  * of the reference (`iceberg_trino_sqldemo.sql:185-187`) surface
  * losslessly instead of failing the scan.
  */
object SparkEnv {
  def cpus: String = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")

  def builder(master: String = s"local[$cpus]"): SparkSession.Builder =
    SparkSession.builder()
      .master(master)
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.extensions", "graft.functions.GraftExtensions")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.parquet.fieldId.write.enabled", "true")
      .config("spark.sql.parquet.fieldId.read.enabled", "true")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")

  def session(): SparkSession = {
    val s = builder().getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }

  /** Scale-adaptive scan spread (optimization guide §2.5, "input skew:
    * one huge unsplittable file → repartition immediately after the
    * read"). A local-scale corpus or micro-batch often arrives as ONE
    * parquet split (a sub-`maxPartitionBytes` file with a single row
    * group), which serializes every downstream per-row computation —
    * shingling, hash-embedding, tokenization — onto one core while the
    * rest idle (measured: 2.2 s of pipeline_rag's 3.0 s in a one-task
    * stage at local[32]). When the input yields fewer partitions than
    * the session's parallelism, round-robin repartition to the
    * parallelism: the exchange moves only the sub-split-sized input and
    * buys cores× on the compute above it. At production scale the scan
    * already yields ≥ cores splits, so this is the IDENTITY — no
    * corpus-wide exchange is added where real data volume exists.
    * Round-robin repartition is deterministic under retries
    * (sort-before-repartition, SPARK-23207), and callers are
    * value-deterministic operators (oracle-checked against
    * partition-agnostic SQL), so results are unchanged.
    *
    * Applied ONLY where a dominant single-task compute stage was
    * measured — a blanket spread taxes aggregate-early operators with
    * an extra exchange and 32× task overhead for no parallel win
    * (measured +17-35% on bm25/ngram/langid when applied blanket).
    */
  def spread(df: org.apache.spark.sql.DataFrame)
      : org.apache.spark.sql.DataFrame = {
    val target = df.sparkSession.sparkContext.defaultParallelism
    if (df.rdd.getNumPartitions >= target) df else df.repartition(target)
  }
}
