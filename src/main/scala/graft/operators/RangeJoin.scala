package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Point-in-interval range join, Spark-first: Spark would plan the raw
  * `p.k = i.k AND p.ts BETWEEN i.start AND i.end` as a broadcast
  * nested-loop or a per-key sort-merge with full interval scans. Binning
  * turns it into an equi-join: intervals explode into the fixed-width
  * time buckets they cover, points hash into exactly one bucket, the
  * join runs on (key, bucket) — a plain shuffle join AQE can re-plan —
  * and the exact containment predicate filters the bucket cohabitants.
  *
  * A matching (point, interval) pair appears exactly once (the interval
  * covers the point's bucket exactly once), so no dedup is needed.
  * Overlapping intervals are fine: a point can match several. Cost
  * scales with Σ interval-span/bucket-width — pick `bucketWidthSec` near
  * the typical interval length.
  */
object RangeJoin {

  def pointInInterval(points: DataFrame, intervals: DataFrame,
      pointKey: String, intervalKey: String,
      pointTs: Column, startTs: Column, endTs: Column,
      bucketWidthSec: Long = 3600L): DataFrame = {
    // exact integer floor division — Column `/` is floating-point, and
    // epoch-scale longs past 2^53 would silently mis-bucket
    import graft.functions.TrinoFunctions.floorDiv
    val w = bucketWidthSec * 1000000L
    val pts = points.withColumn("_p_bucket", floorDiv(unix_micros(pointTs), w))
    val ivs = intervals.withColumn("_i_bucket",
      explode(sequence(floorDiv(unix_micros(startTs), w),
        floorDiv(unix_micros(endTs), w))))
    pts.join(ivs,
        pts(pointKey) === ivs(intervalKey) &&
          pts("_p_bucket") === ivs("_i_bucket"))
      .filter(pointTs >= startTs && pointTs <= endTs)
      .drop("_p_bucket", "_i_bucket")
  }
}
