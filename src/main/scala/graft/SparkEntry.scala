package graft
import org.apache.spark.sql.{SparkSession, DataFrame}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * The registry is assembled from per-area modules:
  *  - [[graft.queries.CoreQueries]] — the reference script's SELECT
  *    surface (joins/aggs/filters/scalar fns, SURVEY §2.2-2.5, §2.10).
  */
object SparkEntry {
  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0.
    * = the federation aggregate, `iceberg_trino_sqldemo.sql:286-295`.
    */
  def entry(spark: SparkSession): DataFrame =
    graft.queries.CoreQueries.federationAgg(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    graft.queries.CoreQueries.queries ++
      graft.queries.LakeQueries.queries ++
      graft.queries.PipelineQueries.queries ++
      graft.queries.StreamQueries.queries

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    graft.queries.CoreQueries.oracleSql ++
      graft.queries.LakeQueries.oracleSql ++
      graft.queries.PipelineQueries.oracleSql ++
      graft.queries.StreamQueries.oracleSql
}
