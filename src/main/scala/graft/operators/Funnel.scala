package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Ordered funnel analysis over an event stream: for each user, the
  * earliest completion time of each step, where step i must occur
  * STRICTLY after the user's step-(i-1) completion (the standard
  * greedy funnel semantics — first qualifying event per step). Users
  * never entering step 1 are not funnel members; later steps are null
  * from the first one missed.
  *
  * Scale shape: NO per-user event collection (a hot user would blow an
  * array-based scan) — each step is a type-filtered min-aggregation
  * (map-side combinable, skew-immune) joined back to the running
  * (user, t1..t_{i-1}) frame on the user key. All k joins/aggs hash on
  * the same key, so AQE coalesces them into co-partitioned exchanges;
  * cost is k passes over the (filtered) step events, not a sort of
  * anything. Greedy-earliest is computed exactly: t_i = min event time
  * of type steps(i) greater than t_{i-1} equals the scan-order "first
  * match after previous match".
  */
object Funnel {

  /** @param windowMs optional conversion window: steps beyond the
    *                  first count only within this span of t1 — the
    *                  same semantics as the streaming twin
    *                  ([[graft.streaming.EventStreams.funnelStream]]),
    *                  whose FIRST epoch this then matches exactly.
    *                  None = unbounded (whole-history funnel).
    * @return one row per step-1 user: userCol, t1..tk (timestamps,
    *         null once the funnel is abandoned), depth = completed
    *         steps.
    */
  def funnel(events: DataFrame, steps: Seq[String],
      userCol: String = "user_id", typeCol: String = "event_type",
      tsCol: Column, windowMs: Option[Long] = None): DataFrame = {
    require(steps.nonEmpty, "funnel needs at least one step")
    require(steps.distinct.size == steps.size,
      "repeated step types are ambiguous — label steps uniquely upstream")
    val e = events.select(col(userCol), col(typeCol), tsCol.as("_ts"))
    var acc = e.filter(col(typeCol) === steps.head)
      .groupBy(col(userCol)).agg(min(col("_ts")).as("t1"))
    steps.zipWithIndex.drop(1).foreach { case (st, i) =>
      val prev = s"t$i"
      val cur = s"t${i + 1}"
      val inWindow = windowMs match {
        case Some(w) => unix_micros(col("_ts")) <=
          unix_micros(col("t1")) + w * 1000L
        case None => lit(true)
      }
      val carried =
        if (prev == "t1") Seq(col(userCol), col("t1"))
        else Seq(col(userCol), col("t1"), col(prev))
      val stepMin = e.filter(col(typeCol) === st)
        .join(acc.select(carried: _*), Seq(userCol))
        .filter(col("_ts") > col(prev) && inWindow)
        .groupBy(col(userCol)).agg(min(col("_ts")).as(cur))
      // left join: abandoning the funnel at step i keeps the user with
      // t_{i+1..k} null — the drop-off IS the analytics
      acc = acc.join(stepMin, Seq(userCol), "left")
    }
    val depth = (1 to steps.size)
      .map(j => col(s"t$j").isNotNull.cast("int")).reduce(_ + _)
    acc.withColumn("depth", depth)
  }

  /** Step-level conversion counts: how many users reached each step —
    * the funnel chart. One extra aggregation over [[funnel]]'s output.
    */
  def conversion(events: DataFrame, steps: Seq[String],
      userCol: String = "user_id", typeCol: String = "event_type",
      tsCol: Column): DataFrame = {
    val f = funnel(events, steps, userCol, typeCol, tsCol)
    val aggs = steps.indices.map(i =>
      sum(col(s"t${i + 1}").isNotNull.cast("long"))
        .as(s"reached_${steps(i)}"))
    f.agg(aggs.head, aggs.tail: _*)
  }
}
