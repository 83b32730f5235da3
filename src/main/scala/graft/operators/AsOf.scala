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
    *
    * All value columns come from ONE right row (they ride a single
    * struct through the window, so a most-recent row with null fields
    * is honored as-is — `ignoreNulls` skips left rows' marker nulls
    * only, never resurrects an older right row). NULL keys and NULL
    * right timestamps never match, per SQL comparison semantics.
    */
  def asofJoin(left: DataFrame, right: DataFrame,
      leftKey: String, rightKey: String,
      leftTs: Column, rightTs: Column,
      valueCols: Seq[String]): DataFrame = {
    val leftCols = left.columns.toSeq
    val valueStructType = org.apache.spark.sql.types.StructType(
      valueCols.map { c =>
        val f = right.schema(c)
        org.apache.spark.sql.types.StructField(f.name, f.dataType,
          nullable = true)
      })
    val l = left
      .withColumn("_k", col(leftKey))
      .withColumn("_ts", leftTs)
      .withColumn("_side", lit(1))
      .select(Seq(col("_k"), col("_ts"), col("_side")) ++
        leftCols.map(col) :+
        lit(null).cast(valueStructType).as("_v"): _*)
    val r = right
      .withColumn("_k", col(rightKey))
      .withColumn("_ts", rightTs)
      .withColumn("_side", lit(0))
      // SQL semantics: a NULL key or NULL timestamp satisfies no
      // comparison — such right rows can never be anyone's match
      .filter(col("_k").isNotNull && col("_ts").isNotNull)
      .select(Seq(col("_k"), col("_ts"), col("_side")) ++
        leftCols.map(c => lit(null).cast(left.schema(c).dataType).as(c)) :+
        struct(valueCols.map(col): _*).as("_v"): _*)
    val w = Window.partitionBy(col("_k"))
      .orderBy(col("_ts"), col("_side"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    l.unionByName(r)
      .withColumn("_last_v", last(col("_v"), ignoreNulls = true).over(w))
      .filter(col("_side") === 1)
      .select(leftCols.map(col) ++
        valueCols.map(c => col(s"_last_v.$c").as(c)): _*)
  }
}
