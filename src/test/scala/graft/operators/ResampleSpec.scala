package graft.operators

import java.sql.Timestamp
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark

class ResampleSpec extends AnyFunSuite {
  import TestSpark._
  private lazy val s = spark

  test("grid spans [min,max], gaps forward-fill, ties break by id") {
    import s.implicits._
    val df = Seq(
      // user 1: events at 10:xx and 13:xx — 11:00 and 12:00 are gaps
      (1L, Timestamp.valueOf("2024-01-01 10:15:00"), 1.0, 100L),
      (1L, Timestamp.valueOf("2024-01-01 10:45:00"), 2.0, 101L),
      (1L, Timestamp.valueOf("2024-01-01 13:05:00"), 9.0, 102L),
      // user 2: two events at the SAME timestamp — higher id wins "last"
      (2L, Timestamp.valueOf("2024-01-01 08:30:00"), 5.0, 201L),
      (2L, Timestamp.valueOf("2024-01-01 08:30:00"), 7.0, 200L)
    ).toDF("user_id", "t", "value", "event_id")
    val out = Resample.forwardFillGrid(df, "user_id", col("t"), "value",
        "event_id").orderBy("user_id", "bucket").collect()
      .map(r => (r.getLong(0), r.getTimestamp(1).toString.take(13),
        r.getDouble(2), r.getInt(3)))
    assert(out.toSeq == Seq(
      (1L, "2024-01-01 10", 2.0, 0), // last of the in-hour pair
      (1L, "2024-01-01 11", 2.0, 1), // gap: carried forward
      (1L, "2024-01-01 12", 2.0, 1),
      (1L, "2024-01-01 13", 9.0, 0),
      (2L, "2024-01-01 08", 5.0, 0)  // tie on ts -> max event_id (201)
    ), out.toSeq.toString)
  }
}
