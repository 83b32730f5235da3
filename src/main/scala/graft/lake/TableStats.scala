package graft.lake

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.json4s._
import org.json4s.jackson.Serialization

/** ANALYZE / SHOW STATS (`iceberg_trino_sqldemo.sql:48-49`, SURVEY A2-A3).
  *
  * One aggregate pass over the table computes per-column NDV
  * (approx_count_distinct — the scalable estimator; HLL is exactly what
  * engines use for CBO stats at 100 TB), null fraction, min/max and
  * average width; results are persisted in table properties so SHOW
  * STATS and any cost-based decision are metadata-only afterwards.
  */
object TableStats {
  import Meta._

  case class ColStat(column: String, dataSize: Option[Double],
      distinctCount: Option[Double], nullsFraction: Option[Double],
      low: Option[String], high: Option[String])
  case class TStats(rowCount: Long, columns: List[ColStat])

  // implicit Formats comes in via `import Meta._`

  val PropertyKey = "graft.stats"

  /** `exactNdv = false` (default) estimates NDV with HLL — the only
    * thing that works at 100 TB and what CBO stats need; `true` swaps
    * in exact `count(distinct)` for small-table audits and the oracle
    * gate (DuckDB has no HLL whose estimates match Spark's).
    */
  def analyze(table: LakeTable, exactNdv: Boolean = false): TStats = {
    val df = table.read()
    val schema = df.schema
    val aggs = schema.fields.flatMap { f =>
      val c = col(f.name)
      val base = Seq(
        (if (exactNdv) count_distinct(c) else approx_count_distinct(c))
          .as(s"ndv_${f.name}"),
        count(when(c.isNull, 1)).as(s"nulls_${f.name}"))
      val mm = f.dataType match {
        case _: NumericType | DateType | TimestampType | StringType |
             BooleanType =>
          Seq(min(c).cast(StringType).as(s"min_${f.name}"),
            max(c).cast(StringType).as(s"max_${f.name}"))
        case _ => Seq(lit(null).cast(StringType).as(s"min_${f.name}"),
          lit(null).cast(StringType).as(s"max_${f.name}"))
      }
      val size = f.dataType match {
        case StringType => Seq(sum(length(c)).cast(DoubleType).as(s"size_${f.name}"))
        case BinaryType => Seq(sum(octet_length(c)).cast(DoubleType).as(s"size_${f.name}"))
        case dt => Seq(lit(dt.defaultSize.toDouble).as(s"width_${f.name}"))
      }
      base ++ mm ++ size
    }.toSeq
    val row = df.agg(count(lit(1)).as("_rows"), aggs: _*).head()
    val rows = row.getAs[Long]("_rows")

    val fieldNames = row.schema.fieldNames.toSet
    def opt[T](name: String): Option[T] =
      if (!fieldNames(name)) None
      else {
        val i = row.fieldIndex(name)
        if (row.isNullAt(i)) None else Some(row.getAs[T](i))
      }
    val cols = schema.fields.toList.map { f =>
      val nulls = opt[Long](s"nulls_${f.name}").getOrElse(0L)
      val dataSize = opt[Double](s"size_${f.name}")
        .orElse(opt[Double](s"width_${f.name}").map(_ * rows))
      ColStat(f.name,
        dataSize,
        opt[Long](s"ndv_${f.name}").map(_.toDouble),
        if (rows == 0) None else Some(nulls.toDouble / rows),
        opt[String](s"min_${f.name}"),
        opt[String](s"max_${f.name}"))
    }
    val stats = TStats(rows, cols)
    table.setProperties(Map(PropertyKey -> Serialization.write(stats)))
    stats
  }

  def stored(table: LakeTable): Option[TStats] =
    table.properties.get(PropertyKey).map(Serialization.read[TStats])

  /** SHOW STATS shape: per-column rows + the Trino-style summary row
    * (null column_name, row_count).
    */
  def showStats(table: LakeTable): DataFrame = {
    val spark = table.spark
    val st = stored(table).getOrElse(analyze(table))
    val schema = StructType(Seq(
      StructField("column_name", StringType),
      StructField("data_size", DoubleType),
      StructField("distinct_values_count", DoubleType),
      StructField("nulls_fraction", DoubleType),
      StructField("row_count", LongType),
      StructField("low_value", StringType),
      StructField("high_value", StringType)))
    val rows = st.columns.map(c => Row(c.column,
      c.dataSize.map(Double.box).orNull,
      c.distinctCount.map(Double.box).orNull,
      c.nullsFraction.map(Double.box).orNull,
      null, c.low.orNull, c.high.orNull)) :+
      Row(null, null, null, null, Long.box(st.rowCount), null, null)
    spark.createDataFrame(
      spark.sparkContext.parallelize(rows.toSeq, 1), schema)
  }
}
