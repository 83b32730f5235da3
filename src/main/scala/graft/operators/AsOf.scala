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
    // surfacing a value column whose name a left column already uses
    // would emit a duplicate output column — reject up front
    val clash = valueCols.filter(leftCols.contains)
    require(clash.isEmpty, "asofJoin value columns " +
      s"${clash.mkString(", ")} collide with left columns; alias them " +
      "on the right input first")
    // internal working columns must not shadow either input's columns
    val taken = (leftCols ++ right.columns).toSet
    def fresh(base: String): String = {
      var n = base; var i = 0
      while (taken(n)) { n = s"${base}_$i"; i += 1 }
      n
    }
    val (kC, tsC, sideC, vC, lastVC) =
      (fresh("_k"), fresh("_ts"), fresh("_side"), fresh("_v"), fresh("_last_v"))
    val valueStructType = org.apache.spark.sql.types.StructType(
      valueCols.map { c =>
        val f = right.schema(c)
        org.apache.spark.sql.types.StructField(f.name, f.dataType,
          nullable = true)
      })
    val l = left
      .withColumn(kC, col(leftKey))
      .withColumn(tsC, leftTs)
      .withColumn(sideC, lit(1))
      .select(Seq(col(kC), col(tsC), col(sideC)) ++
        leftCols.map(col) :+
        lit(null).cast(valueStructType).as(vC): _*)
    val r = right
      .withColumn(kC, col(rightKey))
      .withColumn(tsC, rightTs)
      .withColumn(sideC, lit(0))
      // SQL semantics: a NULL key or NULL timestamp satisfies no
      // comparison — such right rows can never be anyone's match
      .filter(col(kC).isNotNull && col(tsC).isNotNull)
      .select(Seq(col(kC), col(tsC), col(sideC)) ++
        leftCols.map(c => lit(null).cast(left.schema(c).dataType).as(c)) :+
        struct(valueCols.map(col): _*).as(vC): _*)
    val w = Window.partitionBy(col(kC))
      .orderBy(col(tsC), col(sideC))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    l.unionByName(r)
      .withColumn(lastVC, last(col(vC), ignoreNulls = true).over(w))
      .filter(col(sideC) === 1)
      .select(leftCols.map(col) ++
        valueCols.map(c => col(s"$lastVC.$c").as(c)): _*)
  }
}
