package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** As-of (temporal) join: for each left row, the most recent right row
  * with `right.ts <= left.ts` on the same key — the lookup shape of
  * point-in-time feature retrieval. Spark has no built-in; the naive
  * formulations are a non-equi range join (O(n·m) within key) or a
  * per-row subquery. This one is the scalable union-sort shape:
  *
  *   tag sides → union → ONE shuffle on the key → in-partition sort by
  *   (ts, side) → running `last(value, ignoreNulls)` window → keep left
  *   rows.
  *
  * Cost is a single hash shuffle + sort of |left| + |right| rows —
  * exactly a sort-merge join's cost, with no pairwise expansion. Right
  * rows order before left rows at equal timestamps, so a simultaneous
  * observation is visible (`<=` semantics, matching DuckDB ASOF JOIN).
  */
object AsOf {

  /** @param valueCols right-side columns surfaced onto each left row
    *                   (null where no right row precedes it).
    */
  def asofJoin(left: DataFrame, right: DataFrame,
      leftKey: String, rightKey: String,
      leftTs: Column, rightTs: Column,
      valueCols: Seq[String]): DataFrame = {
    val leftCols = left.columns.toSeq
    val l = left
      .withColumn("_k", col(leftKey))
      .withColumn("_ts", leftTs)
      .withColumn("_side", lit(1))
      .select(Seq(col("_k"), col("_ts"), col("_side")) ++
        leftCols.map(col) ++
        valueCols.map(c => lit(null).cast(right.schema(c).dataType)
          .as(s"_v_$c")): _*)
    val r = right
      .withColumn("_k", col(rightKey))
      .withColumn("_ts", rightTs)
      .withColumn("_side", lit(0))
      .select(Seq(col("_k"), col("_ts"), col("_side")) ++
        leftCols.map(c => lit(null).cast(left.schema(c).dataType).as(c)) ++
        valueCols.map(c => col(c).as(s"_v_$c")): _*)
    val w = Window.partitionBy(col("_k"))
      .orderBy(col("_ts"), col("_side"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    l.unionByName(r)
      .select(Seq(col("_side")) ++ leftCols.map(col) ++
        valueCols.map(c =>
          last(col(s"_v_$c"), ignoreNulls = true).over(w).as(c)): _*)
      .filter(col("_side") === 1)
      .drop("_side")
  }
}
