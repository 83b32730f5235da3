package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Loaders for the driver-generated parquet test tables
  * (`/root/testdata/sf*`; see TESTDATA.md / FIXTURES.md). These stand in
  * for the reference's federated catalogs: `tpch.sf1.*`
  * (`iceberg_trino_sqldemo.sql:11,13`), `postgresql.demo.*` (`sql:36,291`),
  * `oracle.demo.nation` (`sql:37`), `snowflake_parallel.demo.region`
  * (`sql:38`). In production each would be `spark.read.format("jdbc")`;
  * offline they are parquet scans, which keeps the plans identical from
  * the join upward.
  */
object Tables {
  def table(spark: SparkSession, sfDir: String, name: String): DataFrame =
    spark.read.parquet(s"$sfDir/$name.parquet")

  def region(s: SparkSession, d: String): DataFrame    = table(s, d, "region")
  def nation(s: SparkSession, d: String): DataFrame    = table(s, d, "nation")
  def customer(s: SparkSession, d: String): DataFrame  = table(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame  = table(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame      = table(s, d, "part")
  def orders(s: SparkSession, d: String): DataFrame    = table(s, d, "orders")
  def lineitem(s: SparkSession, d: String): DataFrame  = table(s, d, "lineitem")
  def documents(s: SparkSession, d: String): DataFrame = table(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = table(s, d, "embeddings")

  /** `events.ts` is nanosecond-precision parquet (TIMESTAMP(9), the Iceberg
    * v3 type at `sql:185-187`). Spark cannot represent ns natively; with
    * `spark.sql.legacy.parquet.nanosAsLong=true` (set in [[graft.Spark]])
    * the column arrives as LongType nanos-since-epoch, which our helpers
    * in [[graft.functions.TrinoFunctions]] convert explicitly.
    */
  def events(s: SparkSession, d: String): DataFrame = table(s, d, "events")
}
