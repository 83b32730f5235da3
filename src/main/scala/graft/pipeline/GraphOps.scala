package graft.pipeline

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Graph analytics over similarity graphs ([[Similarity.knnGraph]]) —
  * the coreset-selection / diversity-weighting layer of a curation
  * pipeline: a document central in the semantic graph represents many
  * near-duplicates of itself; a peripheral one is informative.
  */
object GraphOps {

  /** Damped PageRank with a FIXED iteration count — deterministic by
    * construction (no convergence test, no float-dependent stopping),
    * so the whole computation replays in an ANSI oracle with the
    * iterations unrolled.
    *
    * rank_0(v) = 1/N;
    * rank_{i+1}(v) = (1-d)/N + d·Σ_{u→v} rank_i(u)/outdeg(u).
    *
    * Contributions from dangling nodes (no out-edges) are dropped, not
    * redistributed — the kNN graph has none (every vector emits k
    * edges), and the oracle mirrors the same convention. Ranks round
    * to a 1e-12 grid each iteration (the kmeans stance: absorbs
    * summation-order ulp noise so results are layout- and
    * engine-stable), 1e-6 on output.
    *
    * Scale shape: per iteration ONE aggregation of contributions and
    * one broadcast-scalar join — the exchanges carry (node, rank)
    * pairs only, never vectors or edge payloads; the edge list itself
    * shuffles once per iteration on `src`, co-partitioned with the
    * rank relation (at a fixed iteration count Spark reuses the edge
    * exchange across iterations). Deep iteration counts would
    * localCheckpoint every ~10 rounds (the connected-components
    * idiom); at the 3-5 used for curation weighting the lazy plan is
    * fine.
    */
  def pageRank(edges: DataFrame, iters: Int = 3, damping: Double = 0.85,
      srcCol: String = "src", dstCol: String = "dst"): DataFrame = {
    require(iters >= 1, "pageRank: iters must be >= 1")
    val e = edges.select(col(srcCol).cast("long").as("src"),
      col(dstCol).cast("long").as("dst"))
    val nodes = e.select(col("src").as("node"))
      .union(e.select(col("dst").as("node"))).distinct()
    // N rides a broadcast 1-row aggregate — no driver-side count()
    // during plan construction
    val n1 = broadcast(nodes.agg(count(lit(1)).as("_nn")))
    val outdeg = e.groupBy(col("src")).agg(count(lit(1)).as("_od"))
    val weighted = e.join(outdeg, Seq("src"))
    var ranks = nodes.crossJoin(n1)
      .select(col("node"), (lit(1.0) / col("_nn")).as("rank"))
    for (_ <- 1 to iters) {
      val contrib = weighted
        .join(ranks.withColumnRenamed("node", "src"), Seq("src"))
        .groupBy(col("dst").as("node"))
        .agg(sum(col("rank") / col("_od")).as("_s"))
      ranks = nodes.crossJoin(n1)
        .join(contrib, Seq("node"), "left")
        .select(col("node"),
          round((lit(1.0) - lit(damping)) / col("_nn") +
            lit(damping) * coalesce(col("_s"), lit(0.0)), 12).as("rank"))
    }
    ranks.select(col("node"), round(col("rank"), 6).as("rank"))
  }
}
