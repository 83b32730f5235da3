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
}
