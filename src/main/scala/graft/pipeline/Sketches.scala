package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Deterministic distinct-value sketches — the corpus-statistics layer
  * a 100 TB pipeline runs where exact `COUNT(DISTINCT token)` is a
  * vocabulary-sized shuffle it can't afford to repeat per slice.
  *
  * The sketch is KMV (k minimum values — Bar-Yossef et al. 2002;
  * Beyer et al., "On Synopses for Distinct-Value Estimation Under
  * Multiset Operations", SIGMOD 2007): hash every element to a uniform
  * 60-bit value, keep the k smallest DISTINCT hashes; the k-th
  * smallest h estimates the distinct count as `(k−1) · 2⁶⁰ / h`
  * (relative error ~ 1/√k). Chosen over HLL for the same reason the
  * ANN layer uses the in-house quantizer: the sketch must be
  * REPLAY-EXACT in ANSI SQL so the row hash-checks against DuckDB —
  * `approx_count_distinct`'s HLL++ never would. The element hash is
  * the winnowing family's 60-bit md5 gram hash (positive in a signed
  * long; replayed as `('0x' || substr(md5(gram), 18, 15))::BIGINT`),
  * computed by the SAME fused kernel: [[graft.functions
  * .ShingleExpressions.winnowFingerprints]] at window w=1 degenerates
  * to exactly the sorted distinct gram hashes (every length-1 window's
  * min is the gram itself), so the sketch rides the kernel's codegen
  * speed instead of the interpreted HOF shingle fold it replaced
  * (~10 s → sub-second at sf0.1).
  *
  * Scale shape: the k-min selection is a custom typed aggregate
  * ([[graft.functions.KmvAgg]]) — partial sketches combine MAP-SIDE
  * (union, re-truncate to k), so the one exchange carries a ≤ k-hash
  * buffer per (partition, group), NOT the distinct element set a
  * `distinct + window-rank` formulation would shuffle and sort. That
  * mergeability is the entire point of a sketch, and it makes the
  * whole plan corpus-pass + metadata: everything downstream is
  * k·groups rows. Sketch algebra (union/intersection for
  * [[kmvJaccard]]) touches only sketch rows — the property that makes
  * KMV the right tool for cross-slice overlap at scale: sketch once
  * per slice, compare pairs for free.
  */
object Sketches {

  /** (group, hash) gram frame — the shared first stage of both sketch
    * rows. The sketch element is a word 3-SHINGLE, not a token,
    * deliberately: shingle-set resemblance between corpus slices is
    * Broder's near-dup measure, and a token vocabulary is too small to
    * ever exercise the estimator. The kernel dedups per document
    * in-row (documents under 3 words emit nothing); cross-document
    * dedup is the sketch aggregate's own job. Hash collisions collapse
    * two shingles into one sketch element identically in both engines
    * (the estimator's documented bias at 2⁻⁶⁰, not a divergence).
    */
  private def gramHashes(df: DataFrame, textCol: String,
      groupCol: String): DataFrame = {
    import graft.functions.ShingleExpressions.winnowFingerprints
    df.select(col(groupCol).as("grp"),
      explode(winnowFingerprints(
        trim(lower(col(textCol))), 3, 1)).as("h"))
  }

  /** One ascending ≤ k-element sketch array per group — the
    * [[graft.functions.KmvAgg]] aggregate, map-side combined.
    */
  private def kminSketch(grams: DataFrame, k: Int): DataFrame = {
    import graft.functions.KmvAgg.kmvSketch
    grams.groupBy(col("grp")).agg(kmvSketch(col("h"), k).as("sk"))
  }

  /** Per-group distinct-3-shingle estimate from a k=`k` KMV sketch. One
    * row per group: `k_used` (sketch fill — < k means the group's
    * whole hashed vocabulary fit and the estimate is EXACT),
    * `kth_min` (the k-th smallest hash, the estimator's sufficient
    * statistic), `est_distinct`. Deterministic end-to-end, so the
    * oracle hash-checks the estimate itself, not a tolerance band.
    */
  def kmvDistinct(df: DataFrame, textCol: String = "text",
      groupCol: String = "lang", k: Int = 256): DataFrame = {
    require(k >= 2, "kmvDistinct: k must be >= 2")
    // the sketch array IS the sufficient statistic: fill, last element
    // (= the k-th smallest hash), and the estimate are projections
    val fill = size(col("sk"))
    val kth = element_at(col("sk"), fill)
    kminSketch(gramHashes(df, textCol, groupCol), k)
      .select(col("grp").as(groupCol),
        fill.as("k_used"),
        kth.as("kth_min"),
        when(fill < k, fill.cast("long"))
          .otherwise(round((fill - lit(1)).cast("double") *
            pow(lit(2.0), lit(60)) / kth).cast("long"))
          .as("est_distinct"))
  }

  /** Pairwise vocabulary-overlap estimate between groups via KMV set
    * algebra (Beyer et al. 2007 §4): for each group pair a < b, the
    * COMBINED sketch is the k smallest hashes of the union of the two
    * per-group sketches; `ρ = |combined ∩ A ∩ B| / |combined|`
    * estimates Jaccard, and the combined sketch's own k-th min
    * estimates |A ∪ B| — so `est_intersection = ρ · est_union`. Every
    * stage downstream of the per-group sketches touches ≤ 2k rows per
    * pair: comparing every slice pair of a 100-slice corpus costs
    * sketch-building once plus pennies, the whole point of KMV here.
    */
  def kmvJaccard(df: DataFrame, textCol: String = "text",
      groupCol: String = "lang", k: Int = 256): DataFrame = {
    require(k >= 2, "kmvJaccard: k must be >= 2")
    // explode the per-group sketch arrays back to ≤ k (grp, h) rows —
    // the set-algebra currency — and materialize them once (the group
    // list and the pair join both read this k·groups frame)
    val sk = kminSketch(gramHashes(df, textCol, groupCol), k)
      .select(col("grp"), explode(col("sk")).as("h")).localCheckpoint()
    // group pairs a < b from the sketch's own group list — a
    // groups²-sized metadata frame, broadcast on both hops so the plan
    // stays BroadcastNestedLoopJoin (bounded), never CartesianProduct
    val gs = sk.select(col("grp")).distinct()
    val pairs = gs.select(col("grp").as("lang_a"))
      .crossJoin(broadcast(gs.select(col("grp").as("lang_b"))))
      .filter(col("lang_a") < col("lang_b"))
    // union the two member sketches per pair; a hash present in both
    // collapses to one combined-sketch element with both flags set
    val uh = sk.join(broadcast(pairs), col("grp") === col("lang_a") ||
        col("grp") === col("lang_b"))
      .groupBy(col("lang_a"), col("lang_b"), col("h"))
      .agg(max(when(col("grp") === col("lang_a"), 1).otherwise(0))
          .as("in_a"),
        max(when(col("grp") === col("lang_b"), 1).otherwise(0))
          .as("in_b"))
    val w = Window.partitionBy(col("lang_a"), col("lang_b"))
      .orderBy(col("h"))
    val comb = uh.withColumn("rk", row_number().over(w))
      .filter(col("rk") <= k)
    // derived columns read the ROUNDED long est_union, so the chained
    // arithmetic is engine-identical
    comb.groupBy(col("lang_a"), col("lang_b"))
      .agg(count(lit(1)).cast("int").as("k_used"),
        sum(col("in_a") * col("in_b")).cast("long").as("k_both"),
        max(col("h")).as("_kth"))
      .select(col("lang_a"), col("lang_b"), col("k_used"), col("k_both"),
        when(col("k_used") < k, col("k_used").cast("long"))
          .otherwise(round((col("k_used") - lit(1)).cast("double") *
            pow(lit(2.0), lit(60)) / col("_kth")).cast("long"))
          .as("est_union"))
      .select(col("lang_a"), col("lang_b"), col("k_used"), col("k_both"),
        col("est_union"),
        round(col("k_both").cast("double") / col("k_used"), 6)
          .as("est_jaccard"),
        round(col("k_both").cast("double") / col("k_used") *
          col("est_union")).cast("long").as("est_intersection"))
  }

  /** Per-group token-length quantiles from a MERGEABLE bottom-k-by-hash
    * row sample — the third leg of the sketch kit (distinct counts,
    * resemblance, now distributions). The sample is the KMV idea
    * applied to ROW IDENTITY: keep the k rows whose 60-bit md5(id)
    * hashes are smallest (a uniform sample of the group, since the
    * hash is independent of the value), which merges exactly like the
    * distinct sketch — union + re-truncate — so per-partition samples
    * combine map-side through the SAME [[graft.functions.KmvAgg]]
    * aggregate, and incremental maintenance under appends is the
    * vocab-door merge. Quantiles are then RANK statistics of the
    * ≤ k-row sample: the value at ascending rank ceil(p·n/100), pure
    * integer arithmetic, ties irrelevant to the value — deterministic,
    * so the oracle hash-checks the estimates.
    *
    * `k_used < k` means the sample IS the whole group and the
    * quantiles are exact. Scale shape: one corpus pass computes
    * (group, value, hash); the sketch exchange carries ≤ k-hash
    * buffers; the value join-back broadcasts the k·groups sketch frame
    * against the corpus scan (hash re-derived per row — no id list
    * collected); the ranking window runs on ≤ k rows per group.
    */
  def kmvQuantiles(df: DataFrame, textCol: String = "text",
      groupCol: String = "lang", idCol: String = "doc_id",
      k: Int = 256): DataFrame = {
    import graft.functions.KmvAgg.kmvSketch
    require(k >= 2, "kmvQuantiles: k must be >= 2")
    val h = conv(substring(
      md5(concat(lit("q:"), col(idCol).cast("string"))), 18, 15),
      16, 10).cast("long")
    val rows = df.select(col(groupCol).as("grp"),
      col(idCol).cast("long").as("id"),
      size(split(trim(col(textCol)), "\\s+")).as("n_tokens"),
      h.as("h"))
    val sk = rows.groupBy(col("grp"))
      .agg(kmvSketch(col("h"), k).as("sk"))
      .select(col("grp"), explode(col("sk")).as("h"))
    val sample = rows.join(broadcast(sk), Seq("grp", "h"))
    val w = Window.partitionBy(col("grp"))
      .orderBy(col("n_tokens"), col("id"))
    val ranked = sample
      .withColumn("rn", row_number().over(w))
      .withColumn("n", count(lit(1)).over(
        Window.partitionBy(col("grp"))))
    // ceil(n·p/100) in integer arithmetic; Column./ is double division,
    // so floor it back (exact — n ≤ k fits a double)
    def at(p: Int): Column =
      max(when(col("rn") ===
        floor((col("n") * p + lit(99)) / lit(100)).cast("int"),
        col("n_tokens")))
    ranked.groupBy(col("grp").as(groupCol))
      .agg(max(col("n")).cast("int").as("k_used"),
        at(25).as("p25_tokens"), at(50).as("p50_tokens"),
        at(75).as("p75_tokens"), at(90).as("p90_tokens"))
  }

  /** Point-frequency estimates from a count-min sketch (Cormode &
    * Muthukrishnan, "An Improved Data Stream Summary: The Count-Min
    * Sketch and its Applications", J. Algorithms 55(1), 2005) — the
    * sketch kit's FREQUENCY leg. [[graft.pipeline.TextAnalysis
    * .heavyHitters]] answers "top-k right now" exactly, but its
    * Misra–Gries summary is query-bound: it keeps nothing a later
    * question can reuse. The CMS is the complement a 100 TB pipeline
    * persists PER SLICE: a fixed depth×width counter grid
    * (`counter[d][h_d(x) mod width] += 1`), whose merge across slices,
    * days, or stream batches is plain counter ADDITION, and which
    * answers any later point query `est(x) = min_d counter[d][h_d(x)]`
    * without re-reading the corpus. Estimates never undercount
    * (every counter a word hashes to holds at least that word's true
    * count); the overcount is bounded by collision mass
    * (E[over] ≤ N/width per row, so the min over `depth` independent
    * rows is within εN, ε = e/width, with probability 1−e^−depth).
    *
    * Determinism is the house sketch stance: the row hashes are the
    * md5 idiom (`h_d(w) = md5(d || ':' || w)` truncated to 60 bits,
    * mod width), so the ESTIMATES hash-check against the oracle —
    * no tolerance band, same reason the distinct leg is KMV and not
    * HLL++. The row certifies the sketch against ground truth where
    * ground truth is affordable: probes = the MG heavy-hitter row's
    * exact top-`topK` words, each reported with its true count, its
    * CMS estimate, and the overcount (≥ 0 by construction).
    *
    * Scale shape: ONE corpus pass — the fused
    * [[graft.functions.ShingleExpressions.cmsBuckets]] kernel emits
    * each document's grid cells PRE-COUNTED in the scan projection, so
    * no word or occurrence row ever exists in the plan; the per-slice
    * aggregate's map-side combine reduces every task to ≤ depth·width
    * partials, and the exchange carries counters, never words,
    * regardless of vocabulary size (plan-pinned). The global sketch is
    * then a second, counters-sized aggregate — the in-plan merge demo:
    * summing per-slice grids IS sketching the union, the property that
    * makes the per-slice grid worth persisting. Probe estimation
    * touches topK·depth rows against a broadcast ≤ depth·width frame.
    * The probe pass itself rides the MG row's bounded-exchange shape,
    * not a vocabulary shuffle.
    */
  def cmsFrequency(df: DataFrame, textCol: String = "text",
      groupCol: String = "lang", depth: Int = 4, width: Int = 1024,
      topK: Int = 20): DataFrame = {
    require(depth >= 1 && depth <= 10 && width >= 2,
      "cmsFrequency: 1 <= depth <= 10 and width >= 2 required")
    // the per-slice grid — what a real pipeline would persist. The
    // fused [[graft.functions.ShingleExpressions.cmsBuckets]] kernel
    // emits each document's grid cells PRE-COUNTED in the scan
    // projection (one byte-level pass, the bigramBuckets packing), so
    // the plan never explodes word × hash-row occurrence rows and the
    // only aggregate runs over ≤ depth·width cells per slice —
    // measured 2.7 → 1.0 s at sf0.1 vs the explode + hash-agg form.
    val perSlice = cmsGrid(df, textCol, depth, width, Seq(groupCol))
      .groupBy(col(groupCol), col("cell"))
      .agg(sum(col("cnt")).as("cnt"))
    // merge = addition: the corpus sketch from the slice sketches
    val global = perSlice.groupBy(col("cell"))
      .agg(sum(col("cnt")).as("cnt"))
    // probes: the exact top-k the MG pass certifies — known ground
    // truth to grade the sketch against (probe cells via the
    // composable md5 expression — topK·depth rows, cost-free)
    val probes = certifiedProbes(df, topK, textCol)
    probeCells(probes, depth, width).join(broadcast(global), Seq("cell"))
      .groupBy(col("rk"), col("word"), col("n_true"))
      .agg(min(col("cnt")).as("cms_est"))
      .select(col("rk"), col("word"), col("n_true"), col("cms_est"),
        (col("cms_est") - col("n_true")).as("overcount"))
  }

  /** (carried..., cell, cnt) pre-counted grid-cell rows from the fused
    * kernel — the shared scan stage of every CMS consumer (batch rows
    * and the streaming frequency door). `cell` = d·width + bucket,
    * decoded from the kernel's packed longs — this is the ONE place
    * that knows the packing.
    */
  private[graft] def cmsGrid(df: DataFrame, textCol: String, depth: Int,
      width: Int, carryCols: Seq[String]): DataFrame = {
    import graft.functions.ShingleExpressions.cmsBuckets
    df.select(carryCols.map(col) :+
        explode(cmsBuckets(trim(lower(col(textCol))), depth, width))
          .as("pc"): _*)
      .select(carryCols.map(col) ++ Seq(
        shiftright(col("pc"), 32).as("cell"),
        col("pc").bitwiseAND(lit(0xFFFFFFFFL)).as("cnt")): _*)
  }

  /** The MG heavy-hitter probe set with its exactness certificate
    * ENFORCED in-plan: the oracles replay an exact
    * `ORDER BY n DESC LIMIT topK`, so a corpus flat enough for
    * Misra–Gries to miss a true top-k word (certificate false) must
    * raise loudly here rather than let the probe set silently drift
    * from the oracle's.
    */
  private def certifiedProbes(df: DataFrame, topK: Int,
      textCol: String): DataFrame =
    TextAnalysis.heavyHitters(df, topK, 256, textCol)
      // the guard rides the WORD column — the one column every probe
      // consumer keeps, so column pruning can never drop the check
      .select(col("rk"),
        when(col("provably_exact"), col("word"))
          .otherwise(raise_error(lit("cms probes: the Misra-Gries " +
            "exactness certificate is false on this corpus — raise " +
            "heavyHitters counters")).cast("string")).as("word"),
        col("n").as("n_true"))

  /** Probe-side grid cells for a bounded word frame, via the
    * composable md5 expression (`('0x'||substr(md5(d||':'||w),18,15))
    * % width` — byte-identical to the kernel's cells).
    */
  private def probeCells(words: DataFrame, depth: Int,
      width: Int): DataFrame = {
    val d = col("d")
    val bkt = conv(substring(
      md5(concat(d.cast("string"), lit(":"), col("word"))), 18, 15),
      16, 10).cast("long") % width
    words
      .select(col("*"), explode(array((0 until depth).map(lit): _*)).as("d"))
      // d·width in LONG — the kernel's cells are d.toLong*width + bkt,
      // and an IntegerType product would overflow first at large widths
      .withColumn("cell", d.cast("long") * width + bkt)
      .drop("d")
  }

  /** Corpus-diff report — the sketch kit composed end-to-end on the
    * operational question a curation run always raises: WHAT did the
    * gate do to corpus composition, beyond how many rows it dropped
    * (that is [[graft.pipeline.Attrition]]'s ledger)? One
    * metadata-sized row compares the corpus before and after the
    * Gopher-style quality gate on three axes:
    *
    *  - exact size: docs and tokens, before/after (one corpus pass);
    *  - vocabulary: KMV distinct-3-shingle estimates per side plus the
    *    KMV-algebra resemblance (`est_jaccard`) between the two
    *    shingle sets — "did curation remove redundant mass or distinct
    *    content?" (for a pure subset, resemblance ≈ surviving share of
    *    the distinct-shingle space);
    *  - concentration: CMS-estimated total frequency of the BEFORE
    *    corpus's exact top-20 words on each side — boilerplate mass,
    *    the thing a gate is supposed to cut disproportionately.
    *
    * Every estimator is the deterministic house sketch (k-min md5 /
    * 4×1024 count-min), so the whole report hash-checks. Scale shape:
    * the gate verdict is computed NEXT TO the text in the scan
    * projection ([[graft.pipeline.TextAnalysis.qualityFlagged]]) —
    * no corpus-sized id join — and each axis aggregates both sides in
    * ONE pass over one exploded frame (the after-side feeds
    * null-skipping/conditional aggregates through the `keep` flag), so
    * the diff costs the same passes as sketching the corpus once. All
    * cross-frame joins are one-row broadcasts; sketch algebra runs on
    * ≤ 2k rows.
    */
  def corpusDiff(df: DataFrame, textCol: String = "text",
      idCol: String = "doc_id", k: Int = 256, topK: Int = 20)
      : DataFrame =
    // the gate's verdict expression (10-gram kernel + signal HOFs) is
    // the expensive per-row term and three axes consume it — hand the
    // shared diff the narrow (text, keep) projection (the
    // pipeline_pretrain stance: it localCheckpoints once; text still
    // never rides an exchange)
    corpusDiffFlagged(
      TextAnalysis.qualityFlagged(df, textCol, idCol)
        .select(col(textCol), col("keep")),
      textCol, k, topK)

  /** [[corpusDiff]]'s engine over an ALREADY-FLAGGED corpus: `before` =
    * every row of `flagged`, `after` = the rows with `keep` true. The
    * flag can come from any membership predicate — the quality gate
    * ([[corpusDiff]]), or a lake table's snapshot lineage
    * (`lake_corpus_diff` tags the time-traveled baseline true and the
    * CDC insert delta false, so "after" is the published version and
    * the before−after gap is the new wave's contribution).
    */
  def corpusDiffFlagged(flaggedIn: DataFrame, textCol: String = "text",
      k: Int = 256, topK: Int = 20): DataFrame = {
    import graft.functions.ShingleExpressions.winnowFingerprints
    import graft.functions.KmvAgg.kmvSketch
    require(k >= 2, "corpusDiffFlagged: k must be >= 2")
    val flagged = flaggedIn.select(col(textCol), col("keep"))
      .localCheckpoint()
    // axis 1 — exact sizes, one pass
    val toks = size(split(trim(lower(col(textCol))), "\\s+")).cast("long")
    val counts = flagged.agg(
      count(lit(1)).as("n_docs_before"),
      sum(when(col("keep"), 1L).otherwise(0L)).as("n_docs_after"),
      sum(toks).as("n_tokens_before"),
      sum(when(col("keep"), toks).otherwise(0L)).as("n_tokens_after"))
    // axis 2 — both shingle sketches from ONE gram pass: the after
    // side rides the same aggregate via a null-skipped conditional
    val grams = flagged.select(col("keep"),
      explode(winnowFingerprints(
        trim(lower(col(textCol))), 3, 1)).as("h"))
    val sks = grams.agg(
      kmvSketch(col("h"), k).as("sk_b"),
      kmvSketch(when(col("keep"), col("h")), k).as("sk_a"))
      .localCheckpoint()
    def est(sk: Column): Column = {
      val fill = size(sk)
      when(fill < k, fill.cast("long"))
        .otherwise(round((fill - lit(1)).cast("double") *
          pow(lit(2.0), lit(60)) / element_at(sk, fill)).cast("long"))
    }
    val vocab = sks.select(est(col("sk_b")).as("est_vocab_before"),
      est(col("sk_a")).as("est_vocab_after"))
    // KMV set algebra on the two ≤ k arrays (the kmvJaccard shape,
    // specialized to one pair): combined = k smallest of the union
    val tagged = sks.select(explode(concat(
        transform(col("sk_b"),
          h => struct(h.as("h"), lit(1).as("in_b"), lit(0).as("in_a"))),
        transform(col("sk_a"),
          h => struct(h.as("h"), lit(0).as("in_b"), lit(1).as("in_a")))))
        .as("e"))
      .groupBy(col("e.h").as("h"))
      .agg(max(col("e.in_b")).as("in_b"), max(col("e.in_a")).as("in_a"))
    val comb = tagged
      .withColumn("rk", row_number().over(Window.orderBy(col("h"))))
      .filter(col("rk") <= k)
    val jac = comb.agg(round(
      sum(col("in_b") * col("in_a")).cast("double") / count(lit(1)), 6)
      .as("est_jaccard"))
    // axis 3 — both CMS grids from ONE pre-counted kernel pass
    // (conditional counter sums), probed at the before corpus's exact
    // top-k words
    val grid = cmsGrid(flagged, textCol, 4, 1024, Seq("keep"))
      .groupBy(col("cell"))
      .agg(sum(col("cnt")).as("cnt_b"),
        sum(when(col("keep"), col("cnt")).otherwise(0L)).as("cnt_a"))
    val probes = certifiedProbes(flagged, topK, textCol)
      .select(col("word"))
    // column names carry the probe count so a non-default topK can't
    // mislabel the report (top20_* at the default, matching the
    // oracles' LIMIT 20 chain)
    val mass = probeCells(probes, 4, 1024)
      .join(broadcast(grid), Seq("cell"))
      .groupBy(col("word"))
      .agg(min(col("cnt_b")).as("eb"), min(col("cnt_a")).as("ea"))
      .agg(sum(col("eb")).as(s"top${topK}_mass_before"),
        sum(col("ea")).as(s"top${topK}_mass_after"))
    counts.crossJoin(broadcast(vocab)).crossJoin(broadcast(jac))
      .crossJoin(broadcast(mass))
  }
}
