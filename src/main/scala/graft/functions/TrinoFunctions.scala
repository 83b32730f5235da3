package graft.functions

import org.apache.spark.sql.{Column, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, TimestampNTZType, TimestampType}

/** Scalar-function surface of the reference script, re-expressed with
  * codegen'd Spark built-ins (no UDFs in the hot path).
  *
  * The reference's `date_format` uses MySQL-style `%`-patterns
  * (`iceberg_trino_sqldemo.sql:87`: `date_format(committed_at,
  * '%Y/%m/%d-%T')`), while Spark's `date_format` takes Java
  * DateTimeFormatter patterns. Because the pattern is a *literal* in every
  * usage, we translate it once at plan-build time and delegate to the
  * built-in (whole-stage-codegen'd) `date_format` — a UDF would break
  * codegen for no benefit.
  */
object TrinoFunctions {

  /** Translate a MySQL/Trino `%`-style datetime format into a Java
    * DateTimeFormatter pattern understood by Spark's `date_format`.
    * Covers the specifiers Trino's mysql-compatible `date_format`
    * documents; unknown specifiers throw (fail fast at plan time).
    */
  def mysqlToJavaPattern(fmt: String): String = {
    val sb = new StringBuilder
    var i = 0
    // Literal runs must be quoted so chars like ':' or letters pass through.
    def lit(c: Char): Unit =
      if (c.isLetter) sb.append('\'').append(c).append('\'')
      else sb.append(c)
    while (i < fmt.length) {
      val c = fmt.charAt(i)
      if (c == '%' && i + 1 < fmt.length) {
        fmt.charAt(i + 1) match {
          case 'Y' => sb.append("yyyy")
          case 'y' => sb.append("yy")
          case 'M' => sb.append("MMMM")
          case 'b' => sb.append("MMM")
          case 'm' => sb.append("MM")
          case 'c' => sb.append("M")
          case 'd' => sb.append("dd")
          case 'e' => sb.append("d")
          case 'j' => sb.append("DDD")
          case 'H' => sb.append("HH")
          case 'k' => sb.append("H")
          case 'h' => sb.append("hh")
          case 'l' => sb.append("h")
          case 'i' => sb.append("mm")
          case 's' => sb.append("ss")
          case 'S' => sb.append("ss")
          case 'f' => sb.append("SSSSSS")
          case 'p' => sb.append("a")
          case 'r' => sb.append("hh:mm:ss a")
          case 'T' => sb.append("HH:mm:ss")
          case 'W' => sb.append("EEEE")
          case 'a' => sb.append("EEE")
          case '%' => sb.append('%')
          case other =>
            throw new IllegalArgumentException(
              s"unsupported mysql date_format specifier %$other in '$fmt'")
        }
        i += 2
      } else { lit(c); i += 1 }
    }
    sb.toString
  }

  /** Trino `date_format(ts, '%Y/%m/%d-%T')` (`sql:87`). */
  def trinoDateFormat(ts: Column, mysqlFmt: String): Column =
    date_format(ts, mysqlToJavaPattern(mysqlFmt))

  /** Trino `round(x)` on numerics — HALF_UP (away from zero), which Spark's
    * `round` already implements (`sql:33`, `sql:288`). Kept as an alias so
    * call sites document the Trino semantics they reproduce.
    */
  def trinoRound(c: Column): Column = round(c)

  /** Exact floor division for epoch-scale longs. Column `/` is always
    * floating-point (doubles can't represent epoch-nanos >2^53), and
    * even decimal division rounds the quotient at scale 6 before any
    * floor() — so subtract the remainder first, making the division an
    * exact integer at any scale. Inputs are non-negative epochs.
    */
  def floorDiv(c: Column, d: Long): Column =
    ((c - pmod(c, lit(d))).cast("decimal(38,0)") / lit(d)).cast("long")

  /** Nanosecond timestamps (Iceberg v3 `timestamp_ns`, `sql:185-187`).
    * Spark has no ns precision; we carry nanos-since-epoch as LongType
    * (reader config `spark.sql.legacy.parquet.nanosAsLong=true`) and
    * convert at the edge. Truncation to µs is explicit, never silent.
    */
  def nanosToTimestamp(nanos: Column): Column =
    timestamp_micros(floorDiv(nanos, 1000L))

  /** Type-adaptive event-time accessor for an epoch column whose
    * physical parquet type is NOT under our control. The driver's
    * fixtures have shipped `events.ts` both as parquet `timestamp[ns]`
    * (surfaced as LongType epoch-nanos under
    * `spark.sql.legacy.parquet.nanosAsLong`) and as parquet
    * `timestamp[us]` (surfaced as TIMESTAMP_NTZ). No consumer may
    * assume either: this inspects the frame's actual schema and
    * yields a session-TZ (UTC) TimestampType column in every case, so
    * an event-time plan survives a fixture regeneration with a
    * different physical type instead of crashing at analysis.
    */
  def eventTime(df: Dataset[_], name: String = "ts"): Column =
    df.schema(name).dataType match {
      case LongType         => nanosToTimestamp(col(name))
      case TimestampNTZType => col(name).cast(TimestampType)
      case TimestampType    => col(name)
      case dt => throw new IllegalArgumentException(
        s"unsupported event-time type for column '$name': $dt")
    }

  /** Render ns-precision epoch-nanos as an ISO string with 9 fractional
    * digits — full precision preserved (what a ns-aware engine displays).
    */
  def nanosToString(nanos: Column): Column = {
    val secs = floorDiv(nanos, 1000000000L)
    val frac = pmod(nanos, lit(1000000000L)).cast("long")
    concat(
      date_format(timestamp_seconds(secs), "yyyy-MM-dd HH:mm:ss"),
      lit("."), lpad(frac.cast("string"), 9, "0"))
  }
}
