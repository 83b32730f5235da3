package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Corpus-sampling operators for training-data curation: deterministic
  * train/valid/test assignment and per-domain capping — the two knobs
  * every pretraining mix pipeline turns (reproducible splits; no single
  * domain dominating the token budget).
  */
object Sampling {

  /** The md5 bucket as an inline column: low-60-bits-of-md5 of
    * `salt:id` mod 100. Stable across runs/cluster sizes (pure function
    * of the id), uniform (md5), salt-shiftable (a new salt re-rolls).
    * 60 bits (15 hex chars) keeps the value positive in a signed long,
    * so signed/unsigned modulo agree — the same arithmetic is
    * expressible in ANSI SQL for the oracle. Callers needing the bucket
    * on an existing plan use this directly instead of computing
    * [[assignSplits]] and joining back by id (which would co-shuffle
    * the corpus against itself). `buckets` defaults to percentile
    * granularity; sharding callers (e.g. [[Packing.packSequences]])
    * pass their own modulus.
    */
  def bucketCol(id: Column, salt: String = "graft",
      buckets: Int = 100): Column =
    pmod(hash60(id, salt), lit(buckets))

  /** The raw 60-bit md5 value both [[bucketCol]] and [[uniformSample]]
    * derive from — ONE definition so the documented relationships
    * between the samplers (nesting, retry-stability, shared
    * permutation) can't silently decorrelate.
    */
  private def hash60(id: Column, salt: String): Column =
    conv(substring(
      md5(concat(lit(salt), lit(":"), id.cast("string"))), 18, 15),
      16, 10).cast("long")

  /** Deterministic train/valid/test assignment: [[bucketCol]] split by
    * percentile band — the reproducible-splits knob of a pretraining
    * mix pipeline.
    */
  def assignSplits(df: DataFrame, idCol: String = "doc_id",
      salt: String = "graft", trainPct: Int = 80, validPct: Int = 10)
      : DataFrame = {
    require(trainPct + validPct <= 100, "percentile bands exceed 100")
    val bucket = bucketCol(col(idCol), salt)
    df.select(col(idCol), bucket.cast("int").as("bucket"),
      when(bucket < trainPct, "train")
        .when(bucket < trainPct + validPct, "valid")
        .otherwise("test").as("split"))
  }

  /** Deterministic stratified sampling: keep a row iff its md5 bucket
    * (same arithmetic as [[assignSplits]]) falls under its stratum's
    * percentage — per-language downsampling rates, the dial that
    * rebalances a web-crawl language mix. Pure per-row predicate: no
    * shuffle, no state, stable under retries and cluster resizes, and
    * a stratum's sample is a SUBSET of any higher rate's sample (nested
    * samples — rate changes don't churn the kept set).
    */
  def stratifiedSample(df: DataFrame, rates: Map[String, Int],
      defaultPct: Int = 100, stratumCol: String = "lang",
      idCol: String = "doc_id", salt: String = "graft"): DataFrame = {
    require((rates.values ++ Seq(defaultPct)).forall(p => p >= 0 && p <= 100),
      "rates are percentages")
    val bucket = bucketCol(col(idCol), salt)
    // rates is a compile-time-small map → a folded CASE chain, codegen'd.
    val rate = rates.toSeq.sortBy(_._1).foldLeft(lit(defaultPct)) {
      case (acc, (stratum, pct)) =>
        when(col(stratumCol) === stratum, lit(pct)).otherwise(acc)
    }
    // Keep ALL columns: the sample IS the training input — projecting
    // ids only would force consumers to join back to the corpus by id
    // (the self-co-shuffle bucketCol exists to avoid).
    df.filter(bucket < rate).withColumn("bucket", bucket.cast("int"))
  }

  /** Temperature-based source mixing — the data-mixing knob of a
    * pretraining pipeline: sample sources proportionally to
    * count^(1/T) instead of raw count, so with temperature T > 1
    * (here the fixed T = 2, i.e. sqrt weights) rare sources are
    * upweighted and the head domain stops dominating the token budget.
    *
    * Math: with per-source counts n_s, target mix p_s = √n_s / Σ√n_t
    * and total budget B = `targetFraction`·N, source s keeps
    * min(1, B·p_s / n_s) of its rows. Selection is the same
    * deterministic [[bucketCol]] predicate the split/stratify operators
    * use — retry-stable, cluster-size-independent, and a lower budget's
    * sample is a subset of a higher one's.
    *
    * Scale shape: one tiny per-source count aggregate (map-side
    * combined), its scalar total attached via a broadcast 1-row
    * aggregate, keep fractions joined back by broadcast — the corpus
    * itself never shuffles; the keep decision is a per-row predicate.
    * sqrt (not pow) deliberately: IEEE-754 requires sqrt be correctly
    * rounded, so the oracle's arithmetic is bit-identical.
    */
  def temperatureSample(df: DataFrame, targetFraction: Double = 0.5,
      sourceCol: String = "source", idCol: String = "doc_id",
      salt: String = "graft-temp"): DataFrame = {
    val counts = df.groupBy(col(sourceCol))
      .agg(count(lit(1)).cast("double").as("n_s"))
    val totals = counts.agg(sum(sqrt(col("n_s"))).as("z"),
      sum(col("n_s")).as("n"))
    val fracs = counts.crossJoin(broadcast(totals))
      .select(col(sourceCol),
        least(lit(1.0),
          lit(targetFraction) * col("n") * sqrt(col("n_s")) / col("z")
            / col("n_s")).as("keep_frac"))
    // All columns kept (plus the rate that admitted the row): the
    // sample IS the training input — same contract as stratifiedSample.
    df.join(broadcast(fracs), Seq(sourceCol))
      .filter(bucketCol(col(idCol), salt).cast("double")
        < col("keep_frac") * 100)
      .withColumn("keep_frac", round(col("keep_frac"), 6))
  }

  /** Exact-k uniform sample: rank rows by the same 60-bit md5 the
    * bucket predicates use — a deterministic uniform permutation of the
    * corpus — and keep the first `k`. Unlike the rate-based samplers
    * (percent granularity), this lands an exact count; like them it is
    * retry-stable and cluster-size-independent, and a smaller k's
    * sample is a PREFIX of a larger one's (growing the sample never
    * churns it). orderBy+limit compiles to TakeOrderedAndProject:
    * per-partition top-k, then a k-sized merge — no global sort at any
    * corpus size.
    */
  def uniformSample(df: DataFrame, k: Int, idCol: String = "doc_id",
      salt: String = "graft"): DataFrame =
    df.withColumn("_h", hash60(col(idCol), salt))
      .orderBy(col("_h"), col(idCol))
      .limit(k)
      .drop("_h")

  /** Curriculum ordering: assign every doc a training STAGE by quality
    * band (clean docs first — the easy-to-hard schedule curriculum
    * pretraining reads), and inside each stage a deterministic
    * position from the shared md5 permutation, sharded the
    * [[shardExport]] way so no single task ranks a whole stage.
    * Reading shards 0..N−1 of stage 0, then stage 1, … replays ONE
    * deterministic curriculum order.
    *
    * Stages compare the ROUNDED quality score (the published signal —
    * the [[TextAnalysis.qualityGate]] reproducibility rule), so the
    * band edges are immune to last-ulp drift. Scale shape: one
    * codegen projection + a (stage, shard) hash exchange + per-cell
    * sorts; parallelism = stages×nShards — pick nShards ≫ executors.
    */
  def curriculumOrder(df: DataFrame, qualityCol: Column, nShards: Int = 8,
      idCol: String = "doc_id", salt: String = "graft-cur"): DataFrame = {
    require(nShards > 0, "nShards must be positive")
    val stage = when(qualityCol >= 0.8, 0).when(qualityCol >= 0.5, 1)
      .when(qualityCol >= 0.3, 2).otherwise(3)
    val w = Window.partitionBy(col("stage"), col("shard"))
      .orderBy(col("_h"), col(idCol))
    df.withColumn("stage", stage)
      .withColumn("_h", hash60(col(idCol), salt))
      .withColumn("shard", pmod(col("_h"), lit(nShards.toLong)).cast("int"))
      .withColumn("pos", row_number().over(w))
      .drop("_h")
  }

  /** Weighted sampling WITHOUT replacement (Efraimidis–Spirakis 2006):
    * each row gets key u^(1/w) for a uniform u — the k largest keys
    * are a weighted sample without replacement. Ranked in LOG space
    * (ln(u)/w, same order, no underflow for large weights) and ROUNDED
    * so the ranking value is reproducible against the SQL oracle; ties
    * break by id. u derives from the shared [[hash60]] permutation
    * ((h+1)/2^60 ∈ (0,1]) — deterministic, retry-stable,
    * cluster-size-independent like every sampler here.
    *
    * Scale shape: one codegen projection + TakeOrderedAndProject(k) —
    * no shuffle, no full sort; identical to [[uniformSample]] but with
    * the weight folded into the ranking key. With w = token count this
    * is token-proportional document sampling (sample docs ∝ length ≈
    * uniform over tokens) — the standard way to draw an
    * inspection/eval slice that represents the TOKEN mass, not the
    * document count.
    *
    * CONTRACT: weights are expected ≥ 1 (counts — tokens, bytes,
    * occurrences). Weights below 1 — fractional importance weights,
    * zeros, negatives, and NULLs cast to NULL — are CLAMPED to 1 (the
    * `greatest(w, 1.0)` below), i.e. treated as unit weight, NOT
    * rejected and NOT honored as Efraimidis–Spirakis w<1 keys. The
    * clamp is what keeps `ln(u)/w` finite and the rounded ranking key
    * oracle-reproducible; callers with fractional weights must rescale
    * them into counts (e.g. multiply by 10^6 and round) before calling.
    */
  def weightedSample(df: DataFrame, k: Int, weightCol: Column,
      idCol: String = "doc_id", salt: String = "graft-w"): DataFrame = {
    val u = (hash60(col(idCol), salt).cast("double") + lit(1.0)) /
      lit(math.pow(2.0, 60))
    val key = round(log(u) /
      greatest(weightCol.cast("double"), lit(1.0)), 6)
    df.withColumn("es_key", key)
      .orderBy(col("es_key").desc, col(idCol))
      .limit(k)
  }

  /** Deterministic export sharding — "write the corpus as N shard
    * files, globally shuffled, reproducibly": every row gets
    * (shard, pos) where shard = md5-hash mod nShards and pos ranks the
    * SAME 60-bit hash within the shard. The hash is a uniform
    * permutation of the corpus, so concatenating shards 0..N−1 in pos
    * order replays one global deterministic shuffle — without any
    * global sort: each shard ranks independently.
    *
    * Scale shape: one hash-partition exchange on `shard`, then a
    * per-shard sort — exactly the work a shard writer must do anyway
    * to stream its file in order. Parallelism = nShards, so pick
    * nShards ≫ executors (training exports typically run 1k-100k shards);
    * per-shard sorts spill gracefully. Retry-stable and
    * cluster-size-independent like every [[hash60]] derivative: ids,
    * not partition layout, decide both shard and position.
    */
  def shardExport(df: DataFrame, nShards: Int, idCol: String = "doc_id",
      salt: String = "graft-shard"): DataFrame = {
    require(nShards > 0, "nShards must be positive")
    val w = Window.partitionBy(col("shard")).orderBy(col("_h"), col(idCol))
    df.withColumn("_h", hash60(col(idCol), salt))
      .withColumn("shard", pmod(col("_h"), lit(nShards.toLong)).cast("int"))
      .withColumn("pos", row_number().over(w))
      .drop("_h")
  }

  /** Epoch-weighted upsampling — the REPEAT factor of a pretraining mix
    * (high-value sources loop multiple epochs within one training run
    * while bulk web data sees less than one): each stratum's docs are
    * emitted `floor(w)` times, plus once more with probability
    * `frac(w)` decided by the same deterministic 60-bit md5 draw as the
    * rate samplers (retry-stable, layout-independent; the salt keeps
    * the draw uncorrelated with split/sample decisions). Rows carry a
    * 0-based `epoch`; a stratum absent from `epochs` defaults to one
    * epoch. Pure per-row generate: no shuffle, no state — downstream
    * shard/pack keys on (id, epoch) so repeats spread across training
    * shards instead of clumping.
    */
  def epochMix(df: DataFrame, epochs: Map[String, Double],
      stratumCol: String = "lang", idCol: String = "doc_id",
      salt: String = "graft-epoch"): DataFrame = {
    require(epochs.nonEmpty && epochs.values.forall(_ >= 0.0),
      "epoch weights must be non-negative")
    val w = coalesce(element_at(typedLit(epochs), col(stratumCol)),
      lit(1.0))
    val extra = (bucketCol(col(idCol), salt).cast("double")
      < (w - floor(w)) * 100).cast("int")
    df.withColumn("_reps", floor(w).cast("int") + extra)
      .filter(col("_reps") > 0)
      .withColumn("epoch", explode(sequence(lit(0), col("_reps") - 1)))
      .drop("_reps")
  }

  /** Token-budgeted mixing — the knob a pretraining mix actually runs
    * under: per stratum (language/source), admit documents BEST-FIRST
    * (quality desc, id tiebreak) while the stratum's cumulative TOKEN
    * count stays ≤ `budgetTokens` (token counts, not document counts,
    * decide a mix; a hard cap — the first overshooting doc is dropped).
    * Semantically identical to the flat greedy `cumsum ≤ B` over
    * (quality desc, id), but computed in the shape that survives 100 TB:
    *
    *  1. per-(stratum, quality-level) token sums — a map-side-combined
    *     aggregate, tiny output (strata × distinct quality values);
    *  2. the admit/drop/BOUNDARY verdict per level from a running sum
    *     over that tiny frame, broadcast back — levels wholly under the
    *     budget admit with NO per-row ordering work at all, levels
    *     wholly past it drop;
    *  3. only the single boundary level per stratum pays a per-row
    *     prefix sum (ordered by id) to place the cut exactly.
    *
    * The per-row window in phase 3 is bounded by the boundary TIE GROUP,
    * not the corpus — the quality score is deliberately coarse, so this
    * is the only place a hot group could serialize. At extreme tie
    * cardinality (a whole stratum collapsed onto one quality level —
    * e.g. a binary keep/drop gate used as the quality column), pass
    * `boundaryRangePartitions > 1` to upgrade phase 3 to a DISTRIBUTED
    * prefix sum with unchanged semantics: the tie group is
    * range-partitioned by id, per-range token partials roll into
    * exclusive range offsets through a window over the metadata-sized
    * partials frame (strata × ranges rows — no driver collect), and
    * each range computes its local running sum in parallel; global
    * prefix = range offset + local prefix. The switch is the CALLER's
    * (who knows the quality column's granularity): auto-detection would
    * spend a count job on every invocation to save a parameter.
    */
  def tokenBudgetMix(df: DataFrame, budgetTokens: Long,
      stratumCol: String = "lang", qualityCol: String = "quality_score",
      tokensCol: String = "n_tokens", idCol: String = "doc_id",
      spent: Map[String, Long] = Map.empty,
      boundaryRangePartitions: Int = 0): DataFrame = {
    require(budgetTokens > 0, "token budget must be positive")
    // `spent` = tokens already admitted per stratum by earlier batches
    // (continuous-ingest callers); each stratum's effective budget is
    // what remains. The map is metadata-sized by contract (strata, not
    // rows) and folds into the broadcast cut frame.
    val spentCol =
      if (spent.isEmpty) lit(0L)
      else element_at(typedLit(spent), col(stratumCol))
    val levels = df.groupBy(col(stratumCol), col(qualityCol))
      .agg(sum(col(tokensCol)).cast("long").as("_level_toks"))
    val wl = Window.partitionBy(col(stratumCol))
      .orderBy(col(qualityCol).desc)
      .rowsBetween(Window.unboundedPreceding, -1)
    val cut = levels.withColumn("_better_toks",
      coalesce(sum(col("_level_toks")).over(wl), lit(0L)))
    val annotated = df.join(broadcast(cut), Seq(stratumCol, qualityCol))
      .withColumn("_budget",
        lit(budgetTokens) - coalesce(spentCol, lit(0L)))
    val full = annotated
      .filter(col("_better_toks") + col("_level_toks") <= col("_budget"))
    val boundary = annotated
      .filter(col("_better_toks") < col("_budget") &&
        col("_better_toks") + col("_level_toks") > col("_budget"))
    val withPrior =
      if (boundaryRangePartitions <= 1) {
        // one sorted task per boundary tie group — right as long as the
        // quality score keeps groups narrow
        val wb = Window.partitionBy(col(stratumCol), col(qualityCol))
          .orderBy(col(idCol))
          .rowsBetween(Window.unboundedPreceding, -1)
        boundary
          .withColumn("_prior", coalesce(sum(col(tokensCol)).over(wb), lit(0L)))
      } else {
        // distributed prefix sum over id ranges. Range partition i holds
        // strictly smaller ids than i+1, so global exclusive prefix =
        // (sum of whole earlier ranges) + (local exclusive prefix within
        // the range). The ranged frame is MATERIALIZED (localCheckpoint)
        // before its two consumers read it: RangePartitioner samples its
        // boundaries, so two independent instantiations of this subtree
        // (exchange reuse disabled, or a future plan change breaking
        // canonicalized equality) could draw DIFFERENT boundaries — the
        // offsets' _pid would then describe partitions the main branch
        // doesn't have, silently corrupting every prefix. Correctness
        // must not depend on an optimizer reuse rule; the frame is the
        // boundary tie group, which this path exists to handle at bulk,
        // and executor-storage materialization is the price of making
        // the shared partitioning physical.
        val ranged = boundary
          .repartitionByRange(boundaryRangePartitions, col(idCol))
          .withColumn("_pid", spark_partition_id())
          .localCheckpoint(true)
        val wOff = Window.partitionBy(col(stratumCol), col(qualityCol))
          .orderBy(col("_pid"))
          .rowsBetween(Window.unboundedPreceding, -1)
        val offsets = ranged
          .groupBy(col(stratumCol), col(qualityCol), col("_pid"))
          .agg(sum(col(tokensCol)).cast("long").as("_ptoks"))
          .withColumn("_offset", coalesce(sum(col("_ptoks")).over(wOff), lit(0L)))
          .drop("_ptoks")
        val wLocal = Window
          .partitionBy(col(stratumCol), col(qualityCol), col("_pid"))
          .orderBy(col(idCol))
          .rowsBetween(Window.unboundedPreceding, -1)
        ranged
          .join(broadcast(offsets), Seq(stratumCol, qualityCol, "_pid"))
          .withColumn("_local",
            coalesce(sum(col(tokensCol)).over(wLocal), lit(0L)))
          .withColumn("_prior", col("_offset") + col("_local"))
          .drop("_pid", "_offset", "_local")
      }
    val boundaryKept = withPrior
      .filter(col("_better_toks") + col("_prior") + col(tokensCol)
        <= col("_budget"))
      .drop("_prior")
    full.unionByName(boundaryKept)
      .drop("_level_toks", "_better_toks", "_budget")
  }

  /** Keep at most `k` rows per domain, best-first (`orderCol` desc, id
    * tiebreak) — domain capping. TWO-PHASE so a hot domain cannot
    * serialize onto one task: phase one ranks within (domain, salt)
    * subgroups — `salts` bounded sorts of |domain|/salts rows — and
    * keeps k per subgroup; phase two ranks the surviving k·salts
    * candidates per domain. Provably exact: the global top-k of a
    * domain is contained in the union of its per-salt top-k.
    */
  def capPerDomain(df: DataFrame, domainCol: String = "source",
      orderCol: String = "n_chars", idCol: String = "doc_id", k: Int = 50,
      salts: Int = 16): DataFrame = {
    val salted = df.withColumn("_salt", pmod(col(idCol), lit(salts)))
    val w1 = Window.partitionBy(col(domainCol), col("_salt"))
      .orderBy(col(orderCol).desc, col(idCol))
    val candidates = salted
      .withColumn("_rk1", row_number().over(w1))
      .filter(col("_rk1") <= k)
    val w2 = Window.partitionBy(col(domainCol))
      .orderBy(col(orderCol).desc, col(idCol))
    candidates
      .withColumn("rk", row_number().over(w2))
      .filter(col("rk") <= k)
      .select(col(idCol), col(domainCol), col("rk").cast("int").as("rk"))
  }

  /** DSIR-style importance selection (Xie et al. 2023, "Data Selection
    * for Language Models via Importance Resampling", arXiv:2302.03169):
    * rank candidate documents by how much their hashed-n-gram
    * distribution resembles a TARGET corpus — the published recipe for
    * "find me more data like this high-quality set" at pretraining
    * scale. Features are word bigrams hashed into `buckets` buckets
    * (the hashed feature space is the whole trick: the model is two
    * B-sized count vectors, not a vocabulary); each candidate scores
    * Σ log(p̂_target(b)/p̂_raw(b)) over its bigram OCCURRENCES with
    * add-one smoothing.
    *
    * Scale shape: the per-(doc, bucket) occurrence counts come out of
    * the fused [[graft.functions.ShingleKernel.bigramBuckets]] kernel
    * IN-ROW — word scan, bigram md5, bucket mod, run-length count in
    * one byte-level pass, packed `(bkt << 32) | count` longs — so the
    * explode emits pre-counted rows and the plan needs no
    * per-occurrence (doc, bucket) aggregate at all (the composable
    * zip_with gram fold + groupBy it replaces ran interpreted — HOFs
    * are CodegenFallback — and cost ~3 s single-task at sf0.1; the
    * kernel is ~0.2 s). The skinny decoded frame is materialized ONCE
    * (localCheckpoint — ≤min(grams, docs×B) integer rows, the
    * fewshot stance) and all three consumers read it: bucket-level
    * model counts roll up from it (≤B×tasks partials), the totals are
    * two 1-row folds, and the per-bucket log-ratio table is ≤B rows,
    * BROADCAST back for the final per-doc weighted sum. Nothing
    * corpus-sized ever sits on the driver, the corpus is tokenized
    * exactly once, and the per-doc bucket counts remain DSIR's natural
    * reusable artifact (they ARE the hashed feature vectors).
    *
    * Determinism/oracle: the bucket hash is the first 8 md5 hex chars
    * as an integer (the [[bucketCol]] stance — expressible identically
    * in ANSI SQL), and scores are ranked ROUNDED (1e-6) with id
    * tie-break so engine-order log-sum ulps can't flip the selection.
    */
  def dsirScores(df: DataFrame, targetFilter: Column, buckets: Int = 1024,
      textCol: String = "text", idCol: String = "doc_id"): DataFrame =
    scoreBucketCounts(
      bigramBucketCounts(
        df.select(col(idCol), targetFilter.as("_t"), col(textCol)),
        buckets, textCol, keepCols = Seq(idCol, "_t")),
      buckets, idCol)

  /** ONE corpus pass through the fused
    * [[graft.functions.ShingleKernel.bigramBuckets]] kernel: per-doc
    * pre-counted packed `(bkt << 32) | count` longs, decoded with a
    * shift + mask, checkpointed so every downstream consumer reads
    * the skinny (keepCols, bkt, _c) frame instead of re-scanning and
    * re-tokenizing the corpus. ONE definition of the packing layout —
    * [[dsirScores]] and [[dsirScoresPreScored]] must never decode it
    * differently.
    */
  private def bigramBucketCounts(rows: DataFrame, buckets: Int,
      textCol: String, keepCols: Seq[String]): DataFrame = {
    val ks = keepCols.map(col)
    rows.select(ks :+
        explode(graft.functions.ShingleExpressions.bigramBuckets(
          trim(lower(col(textCol))), buckets)).as("_e"): _*)
      .select(ks :+ shiftright(col("_e"), 32).as("bkt") :+
        col("_e").bitwiseAND(lit(0xFFFFFFFFL)).as("_c"): _*)
      .localCheckpoint(true)
  }

  /** [[dsirScores]] for a corpus whose per-doc metadata (candidacy +
    * target flag) is ALREADY computed — the composed-pipeline shape:
    * `text` carries (id, text) only, `meta` carries (id, targetCol)
    * for exactly the docs admitted to the model (inner membership —
    * docs absent from `meta` count on NEITHER side). The gram explode
    * and the per-(doc, bucket) pre-aggregation run over `text` with
    * no metadata attached, and `meta` joins onto the PRE-AGGREGATED
    * narrow (id, bkt, count) rows — so a caller that materialized its
    * scoring pass once (e.g. a checkpointed quality projection) never
    * re-runs it here, and document text still never rides an exchange:
    * the join moves integer count rows and the metadata frame only.
    * Same model arithmetic, smoothing, and rounding as [[dsirScores]]
    * — the two agree bucket-for-bucket on identical inputs.
    */
  def dsirScoresPreScored(text: DataFrame, meta: DataFrame,
      buckets: Int = 1024, textCol: String = "text",
      idCol: String = "doc_id", targetCol: String = "_t"): DataFrame = {
    // ONE corpus pass through the shared [[bigramBucketCounts]]
    // helper; the checkpointed narrow frame is the shared artifact,
    // and the meta join sits ABOVE it, so per-consumer target filters
    // push into the (cheap, narrow) meta side and the corpus is never
    // re-tokenized
    val counts = bigramBucketCounts(text, buckets, textCol,
      keepCols = Seq(idCol))
    val db = counts.join(
      meta.select(col(idCol), col(targetCol).cast("boolean").as("_t")),
      Seq(idCol))
    scoreBucketCounts(db, buckets, idCol)
  }

  /** Shared DSIR scoring tail over per-(doc, bucket) counts
    * `db = (idCol, bkt, _c, _t)`: model counts, smoothed log-ratio
    * table, broadcast-back weighted sum. Factored so [[dsirScores]]
    * and [[dsirScoresPreScored]] stay arithmetic-identical.
    */
  private def scoreBucketCounts(db: DataFrame, buckets: Int,
      idCol: String): DataFrame = {
    val tc = db.filter(col("_t")).groupBy(col("bkt"))
      .agg(sum(col("_c")).as("_tc"))
    val rc = db.filter(!col("_t")).groupBy(col("bkt"))
      .agg(sum(col("_c")).as("_rc"))
    // totals fold over the ≤B-row count frames, NOT the gram stream —
    // a separate corpus aggregate here would re-explode every document
    // twice for two scalars the bucket counts already contain. coalesce:
    // an EMPTY side (targetFilter matches nothing, or only sub-2-word
    // docs) sums to NULL, which would silently null every lam/score —
    // with 0 the add-one smoothing degenerates gracefully to the
    // uniform prior, matching the oracle's count(*) semantics.
    val tt = broadcast(tc.agg(coalesce(sum(col("_tc")), lit(0L)).as("_T")))
    val rt = broadcast(rc.agg(coalesce(sum(col("_rc")), lit(0L)).as("_R")))
    // λ on the raw-side bucket set — candidates can only hit buckets
    // their own grams created, so this covers every scored lookup
    val lam = rc.join(tc, Seq("bkt"), "left").crossJoin(tt).crossJoin(rt)
      .select(col("bkt"),
        (log((coalesce(col("_tc"), lit(0L)) + lit(1.0)) /
            (col("_T") + lit(buckets.toDouble))) -
          log((col("_rc") + lit(1.0)) /
            (col("_R") + lit(buckets.toDouble)))).as("lam"))
    // score = Σ_buckets lam·count — identical to the per-occurrence sum
    // term-for-term; the oracle aggregates per (doc, bucket) the same
    // way so the 1e-6-rounded scores stay bit-comparable
    db.filter(!col("_t"))
      .join(broadcast(lam), Seq("bkt"))
      .groupBy(col(idCol))
      .agg(round(sum(col("lam") * col("_c")), 6).as("score"))
  }

  /** Greedy k-center coreset (Gonzalez 1985 farthest-point traversal):
    * select `k` vectors such that each new pick is the corpus point
    * FARTHEST (max-min squared L2) from everything already selected —
    * the standard diverse-subset selector of a curation pipeline
    * (seed sets for labeling, balanced eval slices, coverage-maximal
    * few-shot pools), with the classic 2-approximation guarantee for
    * the k-center objective.
    *
    * Scale shape: the selected set is metadata-sized by construction
    * (k × dim doubles), so each corpus pass is ONE pure codegen
    * projection — the min-distance folds the selected vectors as
    * plan-shipped constants, no join, no shuffle — followed by a
    * TakeOrderedAndProject(`batch`) argmax (per-partition heap +
    * driver merge). The per-pass collect is ≤ `batch` rows — the
    * [[graft.pipeline.Similarity.kmeansTrain]] contract.
    *
    * Batched picks: each pass over-selects the top `batch` candidates
    * by current max-min distance, then consumes them greedily on the
    * driver, re-verifying each remaining candidate's distance against
    * the picks accepted WITHIN the batch. A candidate is accepted only
    * while its re-verified rounded distance strictly exceeds the
    * pass's collection floor (the last collected candidate's rounded
    * distance): every corpus point outside the batch sits at or below
    * that floor and can only shrink, so a strict winner is the exact
    * global argmax — the traversal is IDENTICAL to the sequential
    * algorithm, only the driver round-trips drop ~batch-fold (16 picks
    * in 3-4 passes instead of 15). Rounding is monotonic, so
    * round(min(a,b)) = min(round(a), round(b)) and the driver-side
    * re-verification on 6-dp-rounded values is exact, not approximate.
    *
    * Determinism/oracle: the seed is the md5-ranked first vector (the
    * shared uniform-permutation idiom); each argmax ranks the
    * 1e-6-ROUNDED min squared distance with id tie-break, so
    * engine-order ulps can't flip a pick and the whole traversal
    * unrolls in ANSI SQL. Output: (rk, id, dist) — dist is the
    * selection-time max-min distance (NULL for the seed), a useful
    * coverage-radius diagnostic in its own right.
    */
  def coresetKCenter(vectors: DataFrame, k: Int,
      vecCol: String = "embedding", idCol: String = "vec_id",
      batch: Int = 8): DataFrame = {
    require(k >= 1, "coresetKCenter: k must be >= 1")
    require(batch >= 1, "coresetKCenter: batch must be >= 1")
    val spark = vectors.sparkSession
    import spark.implicits._
    val v = vectors.select(col(idCol).cast("long").as("_id"),
      col(vecCol).cast("array<double>").as("_v"))
      .filter(col("_v").isNotNull)
    val seedRow = v.orderBy(md5(col("_id").cast("string")), col("_id"))
      .limit(1).collect()
    require(seedRow.nonEmpty, "coresetKCenter: empty corpus")
    val selected = scala.collection.mutable.ArrayBuffer(
      (seedRow(0).getLong(0), seedRow(0).getSeq[Double](1).toArray))
    val out = scala.collection.mutable.ArrayBuffer[(Int, Long, Option[Double])](
      (1, selected(0)._1, None))
    def r6(x: Double): Double =
      BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    def sq(a: Array[Double], b: Array[Double]): Double = {
      var s = 0.0; var i = 0
      while (i < a.length) { val d = a(i) - b(i); s += d * d; i += 1 }
      s
    }
    var r = 2
    var exhausted = false
    while (r <= k && !exhausted) {
      val dists = selected.map { case (_, c) =>
        aggregate(zip_with(col("_v"), lit(c), (x, y) => (x - y) * (x - y)),
          lit(0.0d), (acc, x) => acc + x)
      }
      val minD = round(dists.reduce(least(_, _)), 6)
      val want = math.min(batch, k - r + 1)
      val top = v.filter(!col("_id").isin(selected.map(_._1).toSeq: _*))
        .select(col("_id"), col("_v"), minD.as("_d"))
        .orderBy(col("_d").desc, col("_id")).limit(want).collect()
      if (top.isEmpty) exhausted = true
      else {
        // Collection floor = the LAST collected row's rounded distance:
        // every corpus point outside the batch sits at or below it and
        // can only shrink as picks accumulate. A short collect means
        // the batch IS the whole remaining corpus — no outside points.
        val floor = if (top.length < want) Double.NegativeInfinity
                    else top.last.getDouble(2)
        var cand = top.map(row => (row.getLong(0),
          row.getSeq[Double](1).toArray, row.getDouble(2))).toVector
        var first = true
        var live = true
        while (r <= k && live && cand.nonEmpty) {
          val best = cand.minBy { case (id, _, d) => (-d, id) }
          // The pass's first candidate is the global argmax by
          // construction; later ones only while strictly above the
          // floor (at a tie an outside point could win on id).
          if (first || best._3 > floor) {
            selected += ((best._1, best._2))
            out += ((r, best._1, Some(best._3)))
            r += 1
            // Fold the new pick into the survivors' rounded max-min:
            // round is monotonic, so min(round(a), round(b)) ==
            // round(min(a, b)) — exact, not approximate.
            cand = cand.filterNot(_._1 == best._1).map {
              case (id, vec, d) =>
                (id, vec, math.min(d, r6(sq(vec, best._2))))
            }
            first = false
          } else live = false
        }
      }
    }
    out.toSeq.toDF("rk", idCol, "dist")
  }

  /** Top-`n` candidates by DSIR score (rounded-score desc, id) — the
    * selection step of importance resampling. orderBy+limit compiles
    * to TakeOrderedAndProject (per-partition heap + driver merge of n
    * rows — no global sort); the rank window then runs over the ≤n
    * already-selected rows.
    */
  def dsirSelect(df: DataFrame, targetFilter: Column, n: Int,
      buckets: Int = 1024, textCol: String = "text",
      idCol: String = "doc_id"): DataFrame =
    rankTopScores(dsirScores(df, targetFilter, buckets, textCol, idCol),
      n, idCol)

  /** [[dsirSelect]] over [[dsirScoresPreScored]] — same rounded-score
    * ranking with id tie-break.
    */
  def dsirSelectPreScored(text: DataFrame, meta: DataFrame, n: Int,
      buckets: Int = 1024, textCol: String = "text",
      idCol: String = "doc_id", targetCol: String = "_t"): DataFrame =
    rankTopScores(
      dsirScoresPreScored(text, meta, buckets, textCol, idCol, targetCol),
      n, idCol)

  private def rankTopScores(scores: DataFrame, n: Int,
      idCol: String): DataFrame = {
    val w = Window.orderBy(col("score").desc, col(idCol))
    scores.orderBy(col("score").desc, col(idCol)).limit(n)
      .withColumn("rk", row_number().over(w))
      .select(col(idCol), col("score"), col("rk").cast("int").as("rk"))
  }

  /** Model-informed mixture reweighting — the DoReMi idea with the
    * reference LM standing in for the proxy model: per-domain mean LM
    * score, softmaxed at `temperature` into sampling weights that
    * upweight domains the reference model likes. The weights feed
    * [[temperatureSample]]/[[epochMix]] as the per-domain rates. One
    * aggregation tree: doc scores → domain means (map-side combined)
    * → a broadcast 1-row partition-function aggregate; output is
    * domain-count-sized. Only LM-scorable docs (≥ 2 words) enter the
    * means — the same support the scores themselves have.
    */
  def domainWeights(df: DataFrame, trainFilter: Column,
      temperature: Double = 1.0, domainCol: String = "source",
      textCol: String = "text", idCol: String = "doc_id"): DataFrame = {
    val scored = TextAnalysis.lmScore(df, trainFilter, textCol, idCol)
    // materialized ONCE (domain-count-sized): both the partition
    // function and the output read it — without this the corpus-scale
    // scoring subtree underneath would run twice
    val means = df.select(col(idCol), col(domainCol))
      .join(scored, Seq(idCol))
      .groupBy(col(domainCol))
      .agg(avg(col("lm_score")).as("_mean"), count(lit(1)).as("n_docs"))
      .localCheckpoint()
    val z = broadcast(means.agg(
      sum(exp(col("_mean") / temperature)).as("_z")))
    means.crossJoin(z).select(col(domainCol), col("n_docs"),
      round(col("_mean"), 6).as("mean_lm_score"),
      round(exp(col("_mean") / temperature) / col("_z"), 6).as("weight"))
  }
}
