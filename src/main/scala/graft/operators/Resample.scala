package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Time-series resampling: snap irregular events to a fixed grid and
  * forward-fill the gaps — the "as-of state at every tick" transform
  * (sensor rollups, balance snapshots, feature backfills).
  *
  * Scale shape: the last-observation-per-bucket step is a `max_by`
  * hash-aggregate (map-side combinable — a bucket with a million events
  * contributes one row per task, never a per-bucket sort); the grid is
  * generated per key from its own [min, max] span, so its size is
  * span/step per key — bounded by TIME, independent of event volume;
  * the forward fill is one per-key ordered pass over that bounded grid.
  * The only data-sized shuffles are the bucket aggregate and the
  * grid↔observation join, both on (key, bucket).
  */
object Resample {

  /** @param tieCol  deterministic within-bucket tiebreak for "last"
    *                when timestamps collide (e.g. an event id).
    * @param step    grid step, as a SQL interval string ("1 hour").
    * @return (key, bucket, filled_value, is_gap) — one row per grid
    *         tick per key; `is_gap` marks ticks with no observation
    *         (value carried forward from the last observed bucket).
    */
  def forwardFillGrid(events: DataFrame, keyCol: String, tsCol: Column,
      valueCol: String, tieCol: String, step: String = "1 hour")
      : DataFrame = {
    val e = events.select(col(keyCol), tsCol.as("_t"),
        col(valueCol).as("_v"), col(tieCol).as("_tie"))
      .withColumn("_b", window(col("_t"), step)("start"))
    val lastPer = e.groupBy(col(keyCol), col("_b"))
      .agg(max_by(col("_v"), struct(col("_t"), col("_tie"))).as("_v"))
    val span = e.groupBy(col(keyCol))
      .agg(min(col("_b")).as("_mn"), max(col("_b")).as("_mx"))
    val grid = span.select(col(keyCol),
      explode(expr(s"sequence(_mn, _mx, interval $step)")).as("_b"))
    val wFill = Window.partitionBy(col(keyCol)).orderBy(col("_b"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    grid.join(lastPer, Seq(keyCol, "_b"), "left")
      .select(col(keyCol), col("_b").as("bucket"),
        last(col("_v"), ignoreNulls = true).over(wFill).as("filled_value"),
        col("_v").isNull.cast("int").as("is_gap"))
  }
}
