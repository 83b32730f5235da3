package graft.lake

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Incrementally-maintained materialized aggregate — the 100 TB answer
  * to `REFRESH MATERIALIZED VIEW` re-running its SQL over the whole
  * source: for the algebraic aggregates (per-group COUNT and SUMs) a
  * refresh only needs the rows APPENDED since the last refresh.
  *
  * State convention is the persisted-LM delta model
  * ([[graft.pipeline.TextAnalysis.persistLm]]): the MV's lake table
  * holds per-group PARTIAL rows (`group cols, _mv_count, _mv_sum_<c>`);
  * each refresh appends the delta's partials (one normal
  * snapshot-isolated commit — readers switch atomically), and the read
  * sums partials per key. [[compact]] folds the deltas back to one row
  * per key when the partial count grows. So refresh cost is
  * O(delta) source I/O + O(delta groups) state append — a day's load
  * into a year's table never rescans the year.
  *
  * Non-append commits in the refresh range (UPDATE/DELETE/overwrite)
  * make the incremental delta undefined, so [[refresh]] detects them
  * from the snapshot chain and falls back to a full REPLACE recompute —
  * correct always, incremental when the source is append-only (the
  * fact-table case this exists for).
  */
object IncrementalMv {

  private val SrcKey = "graft.mv.source"
  private val GroupKey = "graft.mv.group"
  private val SumsKey = "graft.mv.sums"
  private val LastKey = "graft.mv.last_snapshot"

  private def partials(df: DataFrame, groupCols: Seq[String],
      sumCols: Seq[String]): DataFrame =
    df.groupBy(groupCols.map(col): _*)
      .agg(count(lit(1)).as("_mv_count"),
        sumCols.map(c => sum(col(c)).as(s"_mv_sum_$c")): _*)

  /** Materialize the aggregate over the source's CURRENT snapshot. */
  def create(spark: SparkSession, location: String, source: LakeTable,
      groupCols: Seq[String], sumCols: Seq[String]): LakeTable = {
    require(groupCols.nonEmpty && sumCols.nonEmpty,
      "incremental mv needs group and sum columns")
    val snap = source.meta.currentSnapshotId
      .getOrElse(sys.error("source table has no snapshot"))
    LakeTable.create(spark, location,
      Right(partials(source.read(), groupCols, sumCols)),
      properties = Map(
        SrcKey -> source.location,
        GroupKey -> groupCols.mkString(","),
        SumsKey -> sumCols.mkString(","),
        LastKey -> snap.toString,
        "row-lineage" -> "false"),
      replace = true)
  }

  /** Bring the MV up to the source's current snapshot. Returns the
    * refresh mode: "noop" (already current), "incremental" (append-only
    * range → delta partials appended), or "rebuild" (range contained
    * row-level changes → full recompute, REPLACE commit).
    */
  def refresh(spark: SparkSession, location: String): String = {
    val t = LakeTable.forLocation(spark, location)
    val p = t.properties
    val source = LakeTable.forLocation(spark, p(SrcKey))
    val groupCols = p(GroupKey).split(",").toSeq
    val sumCols = p(SumsKey).split(",").toSeq
    val last = p(LastKey).toLong
    val m = source.meta
    val cur = m.currentSnapshotId
      .getOrElse(sys.error("source table has no snapshot"))
    if (cur == last) return "noop"
    val appendOnly = m.isAncestorOf(last, cur) &&
      m.ancestors(cur).takeWhile(_.snapshotId != last)
        .forall(_.operation == "append")
    if (appendOnly) {
      t.append(partials(source.readIncremental(last), groupCols, sumCols))
      t.setProperties(Map(LastKey -> cur.toString))
      "incremental"
    } else {
      // rollback / DML in range: partial deltas are undefined — rebuild
      LakeTable.create(spark, location,
        Right(partials(source.read(), groupCols, sumCols)),
        properties = p + (LastKey -> cur.toString),
        replace = true)
      "rebuild"
    }
  }

  /** Fold accumulated delta rows back to ONE partial row per key — a
    * REPLACE commit; read results are invariant. Run when the partial
    * row count grows past a few multiples of the group count.
    */
  def compact(spark: SparkSession, location: String): Unit = {
    val t = LakeTable.forLocation(spark, location)
    LakeTable.create(spark, location, Right(folded(spark, t)),
      properties = t.properties, replace = true)
  }

  private def folded(spark: SparkSession, t: LakeTable): DataFrame = {
    val groupCols = t.properties(GroupKey).split(",").toSeq
    val sumCols = t.properties(SumsKey).split(",").toSeq
    t.read().groupBy(groupCols.map(col): _*)
      .agg(sum(col("_mv_count")).as("_mv_count"),
        sumCols.map(c => sum(col(s"_mv_sum_$c")).as(s"_mv_sum_$c")): _*)
  }

  /** The aggregate view: partials summed per key (map-side combined;
    * one row per key after [[compact]]).
    */
  def read(spark: SparkSession, location: String): DataFrame = {
    val t = LakeTable.forLocation(spark, location)
    val groupCols = t.properties(GroupKey).split(",").toSeq
    val sumCols = t.properties(SumsKey).split(",").toSeq
    folded(spark, t)
      .select((groupCols.map(col) :+ col("_mv_count").as("n_rows")) ++
        sumCols.map(c => col(s"_mv_sum_$c").as(s"sum_$c")): _*)
  }
}
