package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Funnel attrition accounting — the "where did my data go" report
  * every curation pipeline publishes next to its dataset card: one row
  * per pipeline stage with the documents and tokens surviving that
  * stage and the count the stage dropped.
  *
  * Contract: the caller supplies per-row boolean PASS columns in
  * funnel order (already joined/derived on `df` — e.g. a dedup flag
  * needs its window first). A row survives stage k iff it passes
  * flags 1..k, i.e. stages compose conjunctively exactly like the
  * sequential pipeline they describe. This makes the report a pure
  * FOLD over per-row flags: stage counts are conditional aggregates
  * of cumulative conjunctions, not k re-filtered scans.
  *
  * Scale shape: ONE corpus pass, ONE exchange — the final global
  * aggregation, whose exchange carries one (2·(stages+1))-column
  * partial per task (map-side combined). The stage explosion happens
  * AFTER aggregation on a single metadata-sized row. Flags that need
  * their own exchange (dedup windows) pay it in the caller's plan,
  * where the optimizer can share it with other consumers; `report`
  * itself adds none. Nothing here carries text: callers should
  * project flags + a token count at the scan and drop the body (the
  * [[graft.queries.PipelineQueries.pipelineAttrition]] query does).
  */
object Attrition {

  /** One row per stage: (stage_ord, stage, n_docs, n_tokens,
    * n_dropped), with stage_ord 0 = the unconditional "ingest" row
    * (n_dropped 0) and each later stage's n_dropped = the previous
    * stage's survivors minus its own. `tokens` is summed over each
    * stage's survivors (pass a `lit(0L)` to skip token accounting).
    */
  def report(df: DataFrame, stages: Seq[(String, Column)],
      tokens: Column, ingestName: String = "ingest"): DataFrame = {
    require(stages.nonEmpty, "attrition needs at least one stage")
    require(stages.map(_._1).distinct.size == stages.size,
      "stage names must be unique")
    // cumulative conjunction: surv(k) = flags(1) && ... && flags(k).
    // Nulls are failures by fiat (a null verdict must not silently
    // count as kept): each flag folds through coalesce(_, false).
    val surv = stages.scanLeft(lit(true)) { case (acc, (_, flag)) =>
      acc && coalesce(flag, lit(false))
    }
    val names = ingestName +: stages.map(_._1)
    // Outer coalesce: `sum` over ZERO rows is NULL, so an empty input
    // must still report zeros, not a null-count row (the SQL oracle's
    // count(*) would say 0 and hash-mismatch a null). Inner coalesce:
    // a null token count on a surviving row must read as 0, not
    // silently drop the row from the token sum while the doc count
    // keeps it.
    val aggs = surv.zipWithIndex.flatMap { case (sv, k) =>
      Seq(
        coalesce(sum(when(sv, lit(1L)).otherwise(lit(0L))), lit(0L))
          .as(s"_n$k"),
        coalesce(sum(when(sv, coalesce(tokens.cast("long"), lit(0L)))
          .otherwise(lit(0L))), lit(0L)).as(s"_t$k"))
    }
    val one = df.agg(aggs.head, aggs.tail: _*)
    val rows = names.zipWithIndex.map { case (name, k) =>
      val dropped =
        if (k == 0) lit(0L)
        else col(s"_n${k - 1}") - col(s"_n$k")
      struct(lit(k).as("stage_ord"), lit(name).as("stage"),
        col(s"_n$k").as("n_docs"), col(s"_t$k").as("n_tokens"),
        dropped.as("n_dropped"))
    }
    one.select(explode(array(rows: _*)).as("_s"))
      .select(col("_s.stage_ord"), col("_s.stage"), col("_s.n_docs"),
        col("_s.n_tokens"), col("_s.n_dropped"))
  }
}
