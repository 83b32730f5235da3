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
    val got = AsOf.asofJoin(left, right, "k", "k",
        col("lts"), col("rts"), Seq("v"))
      .select(col("tag"), col("v")).collect()
      .map(r => r.getString(0) -> Option(r.get(1))).toMap
    assert(got == Map(
      "a" -> Some(10.0),  // only the 09:00 row precedes 10:00
      "b" -> Some(20.0),  // equal-ts right row wins over the older one
      "c" -> Some(30.0),  // keys isolated: k=1 rows never leak to k=2
      "d" -> None))       // nothing at or before 09:00 for k=3
  }
}
