package graft.lake

import java.nio.file.Files
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark

/** Physical-plan assertions — the properties that decide whether these
  * operators survive a 100× scale-up (SURVEY §4): residual filters must
  * reach the parquet reader, MoR delete application must broadcast the
  * delete side (never shuffle the data side), and scans must stay inside
  * whole-stage codegen.
  */
class PlanSpec extends AnyFunSuite {
  import TestSpark._
  private lazy val s = spark

  private def freshTable(mode: String): LakeTable = {
    val customers = s.read.parquet(s"$sf/customer.parquet")
      .select(col("c_custkey").as("custkey"), col("c_name").as("name"),
        col("c_acctbal").as("bal"), col("c_mktsegment").as("mktsegment"))
    LakeTable.create(s,
      Files.createTempDirectory("plan-").resolve("t").toString,
      Right(customers), partitioning = Seq("mktsegment"),
      properties = Map("merge_mode" -> mode))
  }

  test("lake scan pushes residual filter into the parquet reader") {
    val t = freshTable("merge-on-read")
    val plan = t.read(col("custkey") > 100L)
      .queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters: [IsNotNull(custkey), GreaterThan(custkey,100)]"),
      plan.linesIterator.filter(_.contains("PushedFilters")).mkString("\n"))
  }

  test("MoR read broadcasts deletion vectors — data side never shuffles") {
    val t = freshTable("merge-on-read")
    t.delete(col("custkey") % 7 === 0)
    val plan = t.read().queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin") && plan.contains("LeftAnti"),
      plan.take(2000))
    assert(!plan.contains("SortMergeJoin"), "delete application must not " +
      "sort-merge (shuffles the full data side)")
  }

  test("lake scan participates in whole-stage codegen") {
    val t = freshTable("merge-on-read")
    val plan = t.read().queryExecution.executedPlan.toString
    // compact plan strings mark WholeStageCodegen stages with "*(n)"
    assert(plan.contains("*("), plan.take(1500))
  }

  test("pruned scan reads strictly fewer files (manifest-level prune)") {
    val orders = s.read.parquet(s"$sf/orders.parquet")
    val t = LakeTable.create(s,
      Files.createTempDirectory("plan-").resolve("t").toString,
      Right(orders), partitioning = Seq("year(o_orderdate)"))
    val m = t.meta
    val (files, _) = Meta.liveFiles(m, m.currentSnapshot.get)
    val pred = col("o_orderdate") >=
      lit(java.sql.Timestamp.valueOf("1997-01-01 00:00:00")) &&
      col("o_orderdate") < lit(java.sql.Timestamp.valueOf("1998-01-01 00:00:00"))
    val pruned = Scan.pruneFiles(m, files, Some(pred))
    assert(pruned.size == 1, s"${pruned.size} of ${files.size} files " +
      "survived a single-year predicate over year partitioning")
  }

  test("narrow-source MERGE scans only key-range-overlapping files") {
    val customers = s.read.parquet(s"$sf/customer.parquet")
      .select(col("c_custkey").as("custkey"), col("c_name").as("name"),
        col("c_acctbal").as("bal"))
    val loc = Files.createTempDirectory("plan-").resolve("t").toString
    // several appends over disjoint key ranges → several files with
    // disjoint custkey stats (sf0.001 has ~150 customers)
    val t = LakeTable.create(s, loc,
      Right(customers.filter(col("custkey") < 30)),
      properties = Map("merge_mode" -> "merge-on-read"))
    (1 to 4).foreach { i =>
      t.append(customers.filter(
        col("custkey") >= i * 30 && col("custkey") < (i + 1) * 30))
    }
    val totalFiles =
      Meta.liveFiles(t.meta, t.meta.currentSnapshot.get)._1.size
    assert(totalFiles >= 5)
    // source touches only keys [60, 75) — one append's range
    val snap = t.merge(
      customers.filter(col("custkey") >= 60 && col("custkey") < 75)
        .withColumn("bal", col("bal") + 1),
      keys = Seq("custkey")).get
    val cand = snap.summary("candidate-data-files").toInt
    assert(cand < totalFiles && cand >= 1,
      s"merge read $cand of $totalFiles files for a 1-range source")
    // and the merge is still correct: updated rows present, rest intact
    assert(t.read().count() == customers.filter(col("custkey") < 150).count())
    assert(t.read(col("custkey") === 61).select("bal").head().getDouble(0) ==
      customers.filter(col("custkey") === 61).select("bal").head()
        .getDouble(0) + 1)
  }

  test("curation chain: ≤3 shuffle exchanges, blocklist broadcast pinned") {
    import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
    val conf = s.conf
    val aqe = conf.get("spark.sql.adaptive.enabled", "true")
    val thr = conf.get("spark.sql.autoBroadcastJoinThreshold", "10485760")
    try {
      // AQE off so the static plan (what a fresh cluster plans from
      // stats alone) is what we pin, not a runtime re-plan
      conf.set("spark.sql.adaptive.enabled", "false")
      val plan = graft.queries.PipelineQueries.pipelineCurate(s, sf)
        .queryExecution.executedPlan
      val shuffles = plan.collect { case e: ShuffleExchangeExec => e }
      // 1: dedup's hash-agg (map-side combine collapses duplicate texts
      //    before the wire); 2: accounting groupBy(lang, source);
      // 3: final ORDER BY range exchange
      assert(shuffles.size <= 3,
        s"${shuffles.size} exchanges:\n${plan.toString.take(3000)}")
      // The blocklist anti-join must ride an EXPLICIT broadcast hint:
      // with the auto-threshold disabled entirely (the "source table
      // grew past the threshold" scenario) the plan must still
      // broadcast the 3-row blocklist, never sort-merge the corpus.
      conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val pinned = graft.queries.PipelineQueries.pipelineCurate(s, sf)
        .queryExecution.executedPlan.toString
      assert(pinned.contains("BroadcastHashJoin") &&
        pinned.contains("LeftAnti"),
        "blocklist must stay a broadcast anti-join with auto-broadcast off")
    } finally {
      conf.set("spark.sql.adaptive.enabled", aqe)
      conf.set("spark.sql.autoBroadcastJoinThreshold", thr)
    }
  }

  test("pretrain mix+pack: no post-scan exchange carries document text") {
    import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
    val conf = s.conf
    val aqe = conf.get("spark.sql.adaptive.enabled", "true")
    try {
      conf.set("spark.sql.adaptive.enabled", "false")
      // the pipeline_pretrain shape: text is consumed at the scan
      // (scoring + token counting) and DROPPED; every exchange the
      // budget mix and the pack layout plan afterwards must move only
      // narrow (id, stratum, tokens, quality) rows — a text column on
      // any of them re-ships the corpus at 100 TB
      val docs = s.read.parquet(s"$sf/documents.parquet")
      val scored = graft.pipeline.TextAnalysis.qualityScore(docs)
        .withColumn("n_tokens", size(split(trim(col("text")), "\\s+")))
      val gated = scored.filter(col("quality_score") >= 0.5)
        .select("doc_id", "lang", "n_tokens", "quality_score")
      val packed = graft.pipeline.Packing.packCounts(
        graft.pipeline.Sampling.tokenBudgetMix(gated, 4000L),
        col("n_tokens"), carryCols = Seq("lang", "quality_score"))
      val plan = packed.queryExecution.executedPlan
      val shuffles = plan.collect { case e: ShuffleExchangeExec => e }
      assert(shuffles.nonEmpty, "expected mix/pack exchanges")
      val carrying = shuffles.filter(_.output.exists(_.name == "text"))
      assert(carrying.isEmpty, "document text on an exchange:\n" +
        carrying.map(_.simpleStringWithNodeId()).mkString("\n"))
    } finally conf.set("spark.sql.adaptive.enabled", aqe)
  }

  test("blob dedup: no exchange carries the payload bytes — digest and " +
      "dhash are computed in the scan projection") {
    import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
    val conf = s.conf
    val aqe = conf.get("spark.sql.adaptive.enabled", "true")
    try {
      conf.set("spark.sql.adaptive.enabled", "false")
      // a binary column on any exchange re-ships the 100 TB blob
      // corpus; both dedup stages must reduce to (digest|sketch, id)
      // before their first shuffle
      for (q <- Seq(
          graft.queries.PipelineQueries.dedupBlobExact(s, sf),
          graft.queries.PipelineQueries.dedupBlobNear(s, sf),
          graft.queries.PipelineQueries.pipelineMultimodalCurate(s, sf))) {
        val plan = q.queryExecution.executedPlan
        val shuffles = plan.collect { case e: ShuffleExchangeExec => e }
        assert(shuffles.nonEmpty, "expected dedup exchanges")
        val carrying = shuffles.filter(_.output.exists(a =>
          a.name == "content" ||
            a.dataType == org.apache.spark.sql.types.BinaryType))
        assert(carrying.isEmpty, "blob bytes on an exchange:\n" +
          carrying.map(_.simpleStringWithNodeId()).mkString("\n"))
      }
    } finally conf.set("spark.sql.adaptive.enabled", aqe)
  }

  test("DSIR: the corpus is tokenized ONCE — model counts and scoring " +
      "read the checkpointed bucket-count frame") {
    val conf = s.conf
    val aqe = conf.get("spark.sql.adaptive.enabled", "true")
    try {
      conf.set("spark.sql.adaptive.enabled", "false")
      val docs = s.read.parquet(s"$sf/documents.parquet")
      val plan = graft.pipeline.Sampling
        .dsirScores(docs, col("lang") === "en")
        .queryExecution.executedPlan
      // target counts, raw counts, and candidate scoring must all read
      // the ONE checkpointed (doc, bucket, count) frame — re-running
      // the bigram kernel per consumer re-tokenizes the corpus three
      // times at 100 TB. The tokenize pass is spent BEFORE this plan
      // (the fused kernel + explode inside the eager checkpoint), so
      // the plan must contain NO parquet scan of the corpus at all.
      assert(plan.toString.contains("ExistingRDD"),
        "expected the checkpointed bucket-count frame at the leaves:\n" +
          plan.toString.take(2000))
      assert(!plan.toString.contains("Scan parquet"),
        "a consumer re-scanned the corpus instead of reading the " +
          "checkpoint:\n" + plan.toString.take(2000))
    } finally conf.set("spark.sql.adaptive.enabled", aqe)
  }

  test("DSIR pre-scored: corpus tokenized once into the checkpointed " +
      "narrow frame; no exchange carries text or grams") {
    import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
    val conf = s.conf
    val aqe = conf.get("spark.sql.adaptive.enabled", "true")
    try {
      conf.set("spark.sql.adaptive.enabled", "false")
      // the pipeline_pretrain shape: text rides (id, text) into the
      // fused bigram-bucket kernel ONCE, whose pre-counted output is
      // materialized as a checkpoint; candidacy/target metadata joins
      // onto the narrow (id, bkt, count) rows ABOVE it. Downstream,
      // every exchange must carry only narrow columns — never text or
      // gram strings — and the scoring weight table must come back as
      // a broadcast, not a corpus-side shuffle.
      val docs = s.read.parquet(s"$sf/documents.parquet")
      val out = graft.pipeline.Sampling.dsirScoresPreScored(
          docs.select(col("doc_id"), col("text")),
          docs.select(col("doc_id"), (col("lang") === "en").as("_t")))
      val plan = out.queryExecution.executedPlan
      // the tokenize pass is spent BEFORE this plan: the corpus enters
      // as the checkpoint RDD, so the plan re-tokenizes nothing
      assert(plan.toString.contains("ExistingRDD"),
        "expected the checkpointed bucket-count frame at the leaves:\n" +
          plan.toString.take(2000))
      val wide = plan.collect { case e: ShuffleExchangeExec => e }
        .filter(_.output.exists(a =>
          a.name == "text" || a.name == "gram"))
      assert(wide.isEmpty, "text/gram on an exchange:\n" +
        wide.map(_.simpleStringWithNodeId()).mkString("\n"))
      assert(plan.toString.contains("BroadcastHashJoin"),
        "the log-ratio weight table must broadcast back onto the " +
          "bucket counts")
    } finally conf.set("spark.sql.adaptive.enabled", aqe)
  }

  test("rag retrieval: fused kernel scores; only the corpus pack moves " +
      "vectors — ranking exchanges are id-sized") {
    import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
    val conf = s.conf
    val aqe = conf.get("spark.sql.adaptive.enabled", "true")
    try {
      conf.set("spark.sql.adaptive.enabled", "false")
      val plan = graft.queries.PipelineQueries.pipelineRag(s, sf)
        .queryExecution.executedPlan
      assert(plan.toString.toLowerCase.contains("topkneighborsagainst"),
        "retrieval must score through the fused top-k kernel")
      val shuffles = plan.collect { case e: ShuffleExchangeExec => e }
      // exchanges allowed to carry array payloads: the ONE corpus pack
      // aggregate (its partial rows hold the collect_list buffer). The
      // kernel join rides a broadcast of the skinny query×key side, and
      // everything after the kernel — merge explode, ranking window,
      // final sort — must move (query_id, cid, cosine)-sized rows only:
      // an array on any of those re-ships corpus vectors at 100 TB.
      val arrayCarrying = shuffles.filter(_.output.exists(a =>
        a.dataType.isInstanceOf[org.apache.spark.sql.types.ArrayType]))
      assert(arrayCarrying.size <= 1,
        s"${arrayCarrying.size} exchanges carry arrays:\n" +
          arrayCarrying.map(_.simpleStringWithNodeId()).mkString("\n"))
      assert(shuffles.forall(!_.output.exists(_.name == "qvec")),
        "query vectors must ride the broadcast, never a shuffle")
    } finally conf.set("spark.sql.adaptive.enabled", aqe)
  }

  test("temperature sampling never shuffles the corpus") {
    import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
    val conf = s.conf
    val aqe = conf.get("spark.sql.adaptive.enabled", "true")
    try {
      conf.set("spark.sql.adaptive.enabled", "false")
      val docs = s.read.parquet(s"$sf/documents.parquet")
      val plan = graft.pipeline.Sampling
        .temperatureSample(docs, targetFraction = 0.5, sourceCol = "lang")
        .queryExecution.executedPlan
      // exchanges exist only under the metadata-sized per-stratum
      // count/total aggregates; the corpus side of the keep-fraction
      // join must be a broadcast probe over the raw scan. One corpus
      // scan feeds the counts (aggregated to ~|strata| rows before any
      // wire) — the corpus ROWS themselves never ride an exchange, so
      // every shuffle in the plan must sit below a broadcast-exchange
      // build side.
      val straying = plan.collect { case e: ShuffleExchangeExec => e }
        .filterNot { e =>
          plan.exists {
            case b: org.apache.spark.sql.execution.exchange
                .BroadcastExchangeExec => b.exists(_ eq e)
            case _ => false
          }
        }
      assert(straying.isEmpty,
        s"corpus-side shuffle:\n${straying.mkString("\n").take(2000)}")
      assert(plan.toString.contains("BroadcastHashJoin"))
    } finally conf.set("spark.sql.adaptive.enabled", aqe)
  }

  test("funnel plan: partial min-agg, no window, no per-user sort") {
    val raw = s.read.parquet(s"$sf/events.parquet")
    val ev = raw.select(col("user_id"), col("event_type"),
        graft.functions.TrinoFunctions.eventTime(raw).as("t"))
    val plan = graft.operators.Funnel.funnel(ev,
        Seq("view", "click", "purchase"), tsCol = col("t"))
      .queryExecution.executedPlan.toString
    // each step's min must map-side-combine (partial_min before the
    // exchange) — the property that makes a hot user a non-event
    assert(plan.contains("partial_min"), plan.take(2000))
    // and the funnel must never materialize per-user event order
    assert(!plan.contains("WindowExec") && !plan.contains("Window "),
      "funnel must not use a window over per-user events")
  }

  test("embedding LSH: band shuffles carry ids only, never the vectors") {
    // The scale contract of the banded candidate join: embedding arrays
    // ride at most the final per-doc verification joins — any exchange
    // keyed or carrying band values must be (id, band) tuples only.
    // At 100 TB a vector-carrying band shuffle is corpus-size × nBands
    // × dim floats of network; the ids-only shape is corpus × nBands
    // longs.
    val emb = s.read.parquet(s"$sf/embeddings.parquet")
    val explained = graft.pipeline.Dedup
      .embeddingNearDup(emb, cosineThreshold = 0.9)
      .queryExecution.explainString(
        org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
    // formatted mode prints one "(n) <Node>" block per operator with an
    // "Input [k]: [...]" attribute list. At harness scale AQE turns the
    // band join into a broadcast (zero shuffle — the degenerate good
    // case); at corpus scale it shuffles — either way every exchange
    // (shuffle OR broadcast) that moves band values must be ids-only.
    val blocks = explained.split("\\(\\d+\\) ").toSeq
    val bandExchanges = blocks.filter(b =>
      (b.startsWith("Exchange") || b.startsWith("BroadcastExchange") ||
        b.startsWith("ShuffleQueryStage")) && b.contains("band_val"))
    assert(bandExchanges.nonEmpty, "expected a banded candidate exchange:\n" +
      explained.take(1500))
    bandExchanges.foreach { b =>
      assert(!b.contains("embedding"),
        s"band exchange carries the vector column:\n${b.take(800)}")
    }
  }

  test("semantic dedup: argmax assignment is a projection; no " +
      "all-pairs operator anywhere in the plan") {
    // The scale contract: the quadratic is bounded by the CELL, which
    // means the pair stage must be an equi-join on the cell key — a
    // CartesianProduct or nested-loop join would mean the cell scoping
    // fell out of the plan and the operator is all-pairs again.
    val emb = s.read.parquet(s"$sf/embeddings.parquet")
    val cents = emb.filter(col("vec_id") < 8)
      .select(col("vec_id").as("cell"), col("embedding").as("cvec"))
    val plan = graft.pipeline.Dedup
      .semanticDedup(emb, cents, cosineThreshold = 0.98)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct"),
      s"cell-scoped pair join degenerated to all-pairs:\n${plan.take(1200)}")
    assert(!plan.contains("BroadcastNestedLoopJoin"),
      s"cell-scoped pair join degenerated to nested-loop:\n${plan.take(1200)}")
  }

  test("heavy hitters: candidate recount joins by BROADCAST — the " +
      "corpus is filtered, never shuffled, before the exact count") {
    // The point of the Misra–Gries route: the first exchange carries at
    // most counters×tasks candidate words; the corpus-sized word stream
    // must meet the candidate set through a broadcast membership filter
    // (a shuffle join here would move every word occurrence — the exact
    // cost the operator exists to avoid).
    val docs = s.read.parquet(s"$sf/documents.parquet")
    val plan = graft.pipeline.TextAnalysis
      .heavyHitters(docs, topK = 10, counters = 256)
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"),
      s"candidate recount must broadcast the candidate set:\n" +
        plan.take(1200))
    assert(!plan.contains("SortMergeJoin"),
      s"corpus-side shuffle join in the recount:\n${plan.take(1200)}")
  }

  test("approx quantiles: the rank-certificate pass broadcasts the " +
      "5-row sketch table — the event stream never shuffles for it") {
    val plan = graft.queries.CoreQueries
      .approxQuantiles(s, sf)
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"),
      s"certificate join must broadcast the per-group sketch rows:\n" +
        plan.take(1200))
    assert(!plan.contains("CartesianProduct") &&
      !plan.contains("BroadcastNestedLoopJoin"),
      s"certificate join degenerated:\n${plan.take(1200)}")
  }

  test("disjunctive-sale: hand-factored OR implications reach both scans") {
    // The OR spans part and lineitem, so Catalyst alone can push none of
    // it; disjunctiveSale factors the single-table hulls out by hand.
    // The pin: brand IN-list on the part SCAN, quantity range on the
    // lineitem SCAN — at 100 TB these are the difference between two
    // full scans and two pruned ones.
    val plan = graft.queries.CoreQueries.disjunctiveSale(s, sf)
      .queryExecution.executedPlan.toString
    val pushed = plan.linesIterator
      .filter(_.contains("PushedFilters")).mkString("\n")
    assert(pushed.contains("In(p_brand"), pushed)
    assert(pushed.contains("GreaterThanOrEqual(l_quantity,1.0)") &&
      pushed.contains("LessThanOrEqual(l_quantity,30.0)"), pushed)
  }

  test("returned-revenue: flag and date filters are scan-pushed") {
    val plan = graft.queries.CoreQueries.returnedItemRevenue(s, sf)
      .queryExecution.executedPlan.toString
    val pushed = plan.linesIterator
      .filter(_.contains("PushedFilters")).mkString("\n")
    assert(pushed.contains("EqualTo(l_returnflag,R)"), pushed)
    assert(pushed.contains("GreaterThanOrEqual(o_orderdate"), pushed)
  }

  test("idle-customers: scalar avg broadcasts; anti-join pre-aggregated") {
    val plan = graft.queries.CoreQueries.idleWealthyCustomers(s, sf)
      .queryExecution.executedPlan.toString
    // 1-row aggregate joined via broadcast nested-loop (scalar-subquery
    // shape) and the "no early orders" test as an anti join
    assert(plan.contains("BroadcastNestedLoopJoin"), plan.take(2000))
    assert(plan.contains("LeftAnti"), plan.take(2000))
    // the nation rollup must map-side-combine, and the distinct
    // custkey pre-aggregation must appear as its two-level hash-agg
    // pair so the anti build side is ≤ |customers|, not |orders|
    assert(plan.contains("partial_count"), plan.take(2000))
    assert(plan.linesIterator.count(l =>
      l.contains("HashAggregate(keys=[o_custkey")) >= 2,
      plan.linesIterator.filter(_.contains("HashAggregate"))
        .mkString("\n"))
  }

  test("IN-list prunes via bucket transform partitioning") {
    val customers = s.read.parquet(s"$sf/customer.parquet")
    val t = LakeTable.create(s,
      Files.createTempDirectory("plan-").resolve("t").toString,
      Right(customers), partitioning = Seq("bucket(c_custkey, 8)"))
    val m = t.meta
    val (files, _) = Meta.liveFiles(m, m.currentSnapshot.get)
    assert(files.size > 4)
    val pruned = Scan.pruneFiles(m, files,
      Some(col("c_custkey").isin(11L, 47L)))
    assert(pruned.size <= 2, s"${pruned.size} files for a 2-key IN-list " +
      "over bucket(8) partitioning")
    assert(t.read(col("c_custkey").isin(11L, 47L)).count() == 2)
  }

  test("drift PSI: corpus rows never shuffle; exchanges carry only " +
      "the 10-bin aggregate") {
    import org.apache.spark.sql.execution.exchange.{
      BroadcastExchangeExec, ShuffleExchangeExec}
    val conf = s.conf
    val aqe = conf.get("spark.sql.adaptive.enabled", "true")
    try {
      conf.set("spark.sql.adaptive.enabled", "false")
      val docs = s.read.parquet(s"$sf/documents.parquet")
        .select(col("doc_id"), (col("doc_id") % 2 === 0).as("_ref"),
          size(split(trim(col("text")), "\\s+")).cast("long")
            .as("n_tokens"))
      val plan = graft.pipeline.TextAnalysis
        .driftPsi(docs, col("_ref"), "n_tokens")
        .queryExecution.executedPlan
      // bin assignment folds the plan-shipped cutoffs into a pure
      // projection, so the only exchanges outside broadcast build
      // sides are the groupBy(bin) partial-agg exchange (and its
      // totals-side reuse): their rows must be (bin, count, count)
      // partials — never doc ids, values, or text
      val straying = plan.collect { case e: ShuffleExchangeExec => e }
        .filterNot { e =>
          plan.exists {
            case b: BroadcastExchangeExec => b.exists(_ eq e)
            case _ => false
          }
        }
      assert(straying.size <= 2,
        s"unexpected exchanges:\n${straying.mkString("\n").take(2000)}")
      val leaked = straying.flatMap(_.output.map(_.name))
        .filter(n => Set("doc_id", "n_tokens", "text", "_v").contains(n))
      assert(leaked.isEmpty,
        s"corpus column on an exchange: ${leaked.mkString(", ")}")
    } finally conf.set("spark.sql.adaptive.enabled", aqe)
  }

  test("KMV sketch: shingle strings never become columns — exchanges " +
      "carry (group, 8-byte hash) rows only") {
    import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
    import org.apache.spark.sql.types.{ArrayType, StringType}
    val conf = s.conf
    val aqe = conf.get("spark.sql.adaptive.enabled", "true")
    try {
      conf.set("spark.sql.adaptive.enabled", "false")
      // The fused kernel hashes grams in-row, so the only string on ANY
      // exchange is the group key itself — a gram/term string column
      // would mean the shuffle re-ships corpus text; an array column
      // would mean the kernel output wasn't exploded before moving.
      for (q <- Seq(
          graft.queries.PipelineQueries.sketchDistinctKmv(s, sf),
          graft.queries.PipelineQueries.sketchJaccardKmv(s, sf),
          graft.queries.PipelineQueries.sketchQuantilesKmv(s, sf))) {
        val plan = q.queryExecution.executedPlan
        val shuffles = plan.collect { case e: ShuffleExchangeExec => e }
        assert(shuffles.nonEmpty, "expected sketch exchanges")
        val groupKeys = Set("grp", "lang", "lang_a", "lang_b")
        val bad = shuffles.flatMap(_.output).filter(a =>
          (a.dataType == StringType && !groupKeys.contains(a.name)) ||
            a.dataType.isInstanceOf[ArrayType])
        assert(bad.isEmpty, "corpus-sized column on a sketch exchange: " +
          bad.map(a => s"${a.name}: ${a.dataType}").mkString(", "))
      }
      // the k-min selection must be the typed aggregate with a partial
      // (map-side) phase — a distinct + window formulation would
      // shuffle the whole distinct element set instead of ≤ k-hash
      // partial sketches. (The jaccard row builds the same member
      // sketches behind its checkpoint, so only the distinct row's
      // plan can show the aggregate.)
      val ps = graft.queries.PipelineQueries.sketchDistinctKmv(s, sf)
        .queryExecution.executedPlan.toString
      assert(ps.contains("ObjectHashAggregate"), ps.take(1500))
      assert(ps.contains("partial_kmv_sketch") ||
        ps.contains("partial kmv_sketch"),
        "sketch must combine map-side before the exchange:\n" +
          ps.take(1500))
    } finally conf.set("spark.sql.adaptive.enabled", aqe)
  }

  test("IVF kNN graph: merged edges are materialized once — mutuality " +
      "is a broadcast self-join, no post-merge shuffle") {
    import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
    val emb = s.read.parquet(s"$sf/embeddings.parquet")
    val plan = graft.pipeline.Similarity.knnGraphIvf(emb)
      .queryExecution.executedPlan
    // knnGraphIvf localCheckpoints the ranked edge frame, so the
    // returned plan must read the checkpoint and broadcast the
    // reversed-edge side: a shuffle here would re-exchange the k·N
    // edge set (and at corpus scale re-run the probe join) for a
    // mutuality flag that is broadcast-sized by construction.
    val shuffles = plan.collect { case e: ShuffleExchangeExec => e }
    assert(shuffles.isEmpty,
      s"post-merge shuffle in the mutual join:\n${plan.toString.take(1500)}")
    assert(plan.toString.contains("BroadcastHashJoin"),
      s"mutuality must broadcast:\n${plan.toString.take(1500)}")
  }
}
