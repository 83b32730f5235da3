package graft.operators

import java.sql.Timestamp
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark

/** Funnel semantics on hand-built scenarios: strict ordering, greedy
  * earliest completion, drop-offs, and out-of-order decoys.
  */
class FunnelSpec extends AnyFunSuite {
  import TestSpark._
  private lazy val s = spark

  private def ts(m: Int) = Timestamp.valueOf(f"2026-01-01 10:$m%02d:00")

  private def events(rows: (Long, String, Int)*) = {
    import s.implicits._
    rows.map { case (u, t, m) => (u, t, ts(m)) }
      .toDF("user_id", "event_type", "t")
  }

  private val steps = Seq("view", "click", "purchase")

  test("full conversion takes the earliest qualifying chain") {
    val df = events(
      (1L, "view", 5), (1L, "view", 1), (1L, "click", 3), (1L, "click", 7),
      (1L, "purchase", 9))
    val r = Funnel.funnel(df, steps, tsCol = col("t")).collect().head
    // first view 10:01; first click AFTER it is 10:03 (not 10:07);
    // purchase 10:09
    assert(r.getTimestamp(1) == ts(1))
    assert(r.getTimestamp(2) == ts(3))
    assert(r.getTimestamp(3) == ts(9))
    assert(r.getInt(4) == 3)
  }

  test("steps before the previous completion do not count") {
    // click precedes the only view: funnel stalls at depth 1
    val df = events((2L, "click", 1), (2L, "view", 2), (2L, "purchase", 3))
    val r = Funnel.funnel(df, steps, tsCol = col("t")).collect().head
    assert(r.getTimestamp(1) == ts(2))
    assert(r.getTimestamp(2) == null)
    assert(r.getTimestamp(3) == null, "purchase needs a qualifying click")
    assert(r.getInt(4) == 1)
  }

  test("same-timestamp step is NOT strictly after — excluded") {
    val df = events((3L, "view", 1), (3L, "click", 1), (3L, "click", 4))
    val r = Funnel.funnel(df, steps, tsCol = col("t")).collect().head
    assert(r.getTimestamp(2) == ts(4))
    assert(r.getInt(4) == 2)
  }

  test("conversion window cuts steps beyond it, matching the stream") {
    val df = events(
      (7L, "view", 1), (7L, "click", 10), (7L, "purchase", 50),
      (8L, "view", 1), (8L, "click", 40))
    val out = Funnel.funnel(df, steps, tsCol = col("t"),
        windowMs = Some(30 * 60 * 1000L)) // 30-minute window
      .collect().map(r => r.getLong(0) -> r.getInt(4)).toMap
    // user 7: click inside the window, purchase at +50 min outside it
    assert(out(7L) == 2)
    // user 8: only step inside the window is the view itself
    assert(out(8L) == 1)
    // unbounded: both events count again
    val full = Funnel.funnel(df, steps, tsCol = col("t"))
      .collect().map(r => r.getLong(0) -> r.getInt(4)).toMap
    assert(full(7L) == 3 && full(8L) == 2)
  }

  test("non-entrants are absent; conversion counts the drop-off") {
    val df = events(
      (4L, "view", 1), (4L, "click", 2), (4L, "purchase", 3),
      (5L, "view", 1),
      (6L, "purchase", 1)) // never viewed: not a funnel member
    val out = Funnel.funnel(df, steps, tsCol = col("t"))
    assert(out.count() == 2)
    val conv = Funnel.conversion(df, steps, tsCol = col("t")).collect().head
    assert((conv.getLong(0), conv.getLong(1), conv.getLong(2)) == ((2L, 1L, 1L)))
  }
}
