package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark

/** Pins for the bucketed point-in-interval join: multi-bucket spans,
  * overlapping intervals (point matches both, once each), exclusion
  * outside bounds, inclusive endpoints.
  */
class RangeJoinSpec extends AnyFunSuite {
  import TestSpark._
  private lazy val s = spark

  private def ts(t: String) = java.sql.Timestamp.valueOf(t)

  test("point-in-interval join: spans, overlaps, inclusive bounds") {
    import s.implicits._
    val points = Seq(
      (1L, 10L, ts("2024-01-01 10:30:00")), // inside long interval
      (2L, 10L, ts("2024-01-01 13:00:00")), // inclusive end bound
      (3L, 10L, ts("2024-01-01 13:00:01")), // just past the end
      (4L, 20L, ts("2024-01-01 10:45:00"))  // inside TWO overlapping ivs
    ).toDF("pid", "k", "pts")
    val intervals = Seq(
      (100L, 10L, ts("2024-01-01 09:00:00"), ts("2024-01-01 13:00:00")),
      (200L, 20L, ts("2024-01-01 10:00:00"), ts("2024-01-01 11:00:00")),
      (201L, 20L, ts("2024-01-01 10:30:00"), ts("2024-01-01 12:00:00"))
    ).toDF("iid", "ik", "start", "end")
    val rows = RangeJoin.pointInInterval(points, intervals,
        pointKey = "k", intervalKey = "ik",
        pointTs = col("pts"), startTs = col("start"), endTs = col("end"),
        bucketWidthSec = 3600L)
      .select("pid", "iid").collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    // count BEFORE the set: each matching pair must surface exactly
    // once, even though interval 100 spans 5 buckets
    assert(rows.length == 4, s"expected 4 rows, got ${rows.toSeq}")
    assert(rows.toSet == Set((1L, 100L), (2L, 100L), (4L, 200L), (4L, 201L)))
  }
}
