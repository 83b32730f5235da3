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

  /** Semi-supervised label propagation over a kNN edge list — the
    * cheap-label amplifier of a curation pipeline (a small
    * hand/model-labeled seed set spread over the semantic graph labels
    * the corpus for stratified sampling or quality routing).
    *
    * Synchronous, FIXED iteration count (the [[pageRank]] stance: no
    * convergence test, so the whole computation replays in an ANSI
    * oracle with the rounds unrolled). Per round every node takes the
    * MAJORITY label among its out-neighbors' current labels —
    * unlabeled neighbors don't vote, vote-count ties break to the
    * smallest label, nodes whose neighborhood is entirely unlabeled
    * stay unlabeled — except seeds, which are CLAMPED to their given
    * label (the standard semi-supervised convention; also what makes
    * the fixpoint non-degenerate).
    *
    * Scale shape: exchanges carry (node, label) and (node, label,
    * count) rows only — never vectors or edge payloads; one vote
    * aggregation + one per-node ranking window (node keys — maximal
    * parallelism) per round, and the edge list shuffles on its join
    * key exactly as in [[pageRank]].
    */
  def labelPropagation(edges: DataFrame, seeds: DataFrame, iters: Int = 2,
      srcCol: String = "src", dstCol: String = "dst",
      nodeCol: String = "node", labelCol: String = "label"): DataFrame = {
    require(iters >= 1, "labelPropagation: iters must be >= 1")
    import org.apache.spark.sql.expressions.Window
    val e = edges.select(col(srcCol).cast("long").as("src"),
      col(dstCol).cast("long").as("dst"))
    val seed = seeds.select(col(nodeCol).cast("long").as("node"),
      col(labelCol).cast("int").as("_seed"))
    // node set = edge endpoints ∪ seed ids: a clamped seed with no
    // incident edge still has a KNOWN label and must appear in the
    // output rather than be silently dropped
    val nodes = e.select(col("src").as("node"))
      .union(e.select(col("dst").as("node")))
      .union(seed.select(col("node"))).distinct()
    var labels = nodes.join(seed, Seq("node"), "left")
      .select(col("node"), col("_seed").as("lbl"))
    for (_ <- 1 to iters) {
      val votes = e
        .join(labels.select(col("node").as("dst"), col("lbl")), Seq("dst"))
        .filter(col("lbl").isNotNull)
        .groupBy(col("src").as("node"), col("lbl"))
        .agg(count(lit(1)).as("_n"))
      val w = Window.partitionBy(col("node"))
        .orderBy(col("_n").desc, col("lbl"))
      val winner = votes.withColumn("_rk", row_number().over(w))
        .filter(col("_rk") === 1)
        .select(col("node"), col("lbl").as("_win"))
      labels = nodes.join(seed, Seq("node"), "left")
        .join(winner, Seq("node"), "left")
        .select(col("node"), coalesce(col("_seed"), col("_win")).as("lbl"))
    }
    labels.select(col("node"), col("lbl").cast("int").as("label"))
  }
}
