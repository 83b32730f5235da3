package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark

/** Hand-built semantics pins for the as-of join: `<=` visibility at
  * equal timestamps, per-key isolation, null when nothing precedes.
  */
class AsOfSpec extends AnyFunSuite {
  import TestSpark._
  private lazy val s = spark

  private def ts(t: String) = java.sql.Timestamp.valueOf(t)

  test("as-of join picks the most recent right row at or before left") {
    import s.implicits._
    val left = Seq(
      (1L, ts("2024-01-01 10:00:00"), "a"),
      (1L, ts("2024-01-01 12:00:00"), "b"),
      (2L, ts("2024-01-01 11:00:00"), "c"),
      (3L, ts("2024-01-01 09:00:00"), "d")
    ).toDF("k", "lts", "tag")
    val right = Seq(
      (1L, ts("2024-01-01 09:00:00"), 10.0),
      (1L, ts("2024-01-01 12:00:00"), 20.0), // equal ts → visible (<=)
      (2L, ts("2024-01-01 10:30:00"), 30.0),
      (3L, ts("2024-01-01 09:30:00"), 40.0)  // after left row → invisible
    ).toDF("k", "rts", "v")
    val rows = AsOf.asofJoin(left, right, "k", "k",
        col("lts"), col("rts"), Seq("v"))
      .select(col("tag"), col("v")).collect()
      .map(r => r.getString(0) -> Option(r.get(1)))
    assert(rows.length == 4, "exactly one output row per left row")
    assert(rows.toMap == Map(
      "a" -> Some(10.0),  // only the 09:00 row precedes 10:00
      "b" -> Some(20.0),  // equal-ts right row wins over the older one
      "c" -> Some(30.0),  // keys isolated: k=1 rows never leak to k=2
      "d" -> None))       // nothing at or before 09:00 for k=3
  }

  test("most recent right row wins atomically — nulls are not skipped") {
    import s.implicits._
    val left = Seq((1L, ts("2024-01-01 11:00:00"))).toDF("k", "lts")
    val right = Seq(
      (1L, ts("2024-01-01 09:00:00"), Some(10.0), Some("old")),
      (1L, ts("2024-01-01 10:00:00"), None: Option[Double], Some("new"))
    ).toDF("k", "rts", "v1", "v2")
    val row = AsOf.asofJoin(left, right, "k", "k",
      col("lts"), col("rts"), Seq("v1", "v2")).head()
    // the 10:00 row is the match: its null v1 must surface as null (no
    // resurrecting 09:00's 10.0) and v2 must come from the SAME row
    assert(row.isNullAt(row.fieldIndex("v1")))
    assert(row.getString(row.fieldIndex("v2")) == "new")
  }

  test("null keys and null right timestamps never match") {
    import s.implicits._
    val left = Seq(
      (Some(1L), Some(ts("2024-01-01 10:00:00")), "x"),
      (None: Option[Long], Some(ts("2024-01-01 10:00:00")), "nullkey")
    ).toDF("k", "lts", "tag")
    val right = Seq(
      (Some(1L), None: Option[java.sql.Timestamp], 99.0), // null ts
      (None: Option[Long], Some(ts("2024-01-01 09:00:00")), 77.0) // null key
    ).toDF("k", "rts", "v")
    val got = AsOf.asofJoin(left, right, "k", "k",
        col("lts"), col("rts"), Seq("v")).collect()
      .map(r => r.getString(r.fieldIndex("tag")) ->
        Option(r.get(r.fieldIndex("v")))).toMap
    assert(got == Map("x" -> None, "nullkey" -> None))
  }
}
