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

  /** Deterministic split assignment: bucket = low-60-bits-of-md5 of
    * `salt:id` mod 100, split by percentile band. Properties the
    * pipeline needs: stable across runs/cluster sizes (pure function of
    * the id), uniform (md5), and salt-shiftable (a new salt re-rolls
    * the assignment). 60 bits (15 hex chars) keeps the value positive
    * in a signed long, so signed/unsigned modulo agree — the same
    * arithmetic is expressible in ANSI SQL for the oracle.
    */
  /** The split bucket as an inline column expression — callers needing
    * the bucket on an existing plan use this directly instead of
    * computing [[assignSplits]] and joining back by id (which would
    * co-shuffle the corpus against itself; the bucket is a pure
    * function of the id).
    */
  def bucketCol(id: Column, salt: String = "graft"): Column = {
    val h = conv(substring(
      md5(concat(lit(salt), lit(":"), id.cast("string"))), 18, 15),
      16, 10).cast("long")
    pmod(h, lit(100))
  }

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
    df.filter(bucket < rate)
      .select(col(idCol), col(stratumCol), bucket.cast("int").as("bucket"))
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
}
