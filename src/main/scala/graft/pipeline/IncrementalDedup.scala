package graft.pipeline

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Incremental near-duplicate detection: dedup a NEW batch of documents
  * against an already-indexed corpus without re-processing the corpus —
  * the shape a daily-ingest pipeline needs at 100 TB, where
  * re-shingling the full history per batch is the difference between a
  * bounded nightly job and an unbounded one.
  *
  * The persisted index is two lake tables under one root:
  *  - `bands/`  — (band_idx, band_hash, doc_id), identity-partitioned
  *    by band_idx: the LSH candidate-probe side. Append-only commits.
  *  - `tokens/` — (doc_id, n, toks array<long>): hashed shingle sets
  *    for exact-Jaccard verification of candidates. Only
  *    candidate-matched rows are read per batch (semi-join by id —
  *    AQE broadcasts the candidate id set when small).
  *
  * A batch costs: shingle/sketch the NEW docs only, one join of the new
  * bands against the band table (shuffle keyed on (band_idx,
  * band_hash) — never all-pairs), verification on candidates only,
  * then two appends. Snapshot isolation makes concurrent probes safe.
  */
object IncrementalDedup {

  case class Index(
      bands: graft.lake.LakeTable,
      tokens: graft.lake.LakeTable,
      numHashes: Int,
      lshBands: Int,
      shingleK: Int)

  private def bandsOf(df: DataFrame, textCol: String, idCol: String,
      numHashes: Int, lshBands: Int, shingleK: Int): DataFrame = {
    val rows = numHashes / lshBands
    val sigs = Dedup.minhashSignature(df, textCol, idCol, numHashes, shingleK)
    sigs.select(col(idCol).as("doc_id"), posexplode(
      array((0 until lshBands).map { b =>
        xxhash64(concat_ws(",",
          transform(slice(col("sig"), lit(b * rows + 1), lit(rows)),
            x => x.cast("string"))))
      }: _*)).as(Seq("band_idx", "band_hash")))
      .select(col("band_idx"), col("band_hash"), col("doc_id"))
  }

  private def tokensOf(df: DataFrame, textCol: String, idCol: String,
      shingleK: Int): DataFrame =
    df.select(col(idCol).as("doc_id"),
      graft.functions.ShingleExpressions
        .hashedShingles(trim(lower(col(textCol))), shingleK).as("toks"))
      .select(col("doc_id"), size(col("toks")).as("n"), col("toks"))

  /** Index an initial corpus at `location` (replacing any prior index). */
  def build(df: DataFrame, location: String, textCol: String = "text",
      idCol: String = "doc_id", numHashes: Int = 32, lshBands: Int = 16,
      shingleK: Int = 3): Index = {
    val spark = df.sparkSession
    val props = Map(
      "graft.dedup.numHashes" -> numHashes.toString,
      "graft.dedup.lshBands" -> lshBands.toString,
      "graft.dedup.shingleK" -> shingleK.toString,
      "row-lineage" -> "false")
    val bandsT = graft.lake.LakeTable.create(spark, s"$location/bands",
      Right(bandsOf(df, textCol, idCol, numHashes, lshBands, shingleK)
        .repartition(col("band_idx"))),
      partitioning = Seq("band_idx"), properties = props, replace = true)
    val toksT = graft.lake.LakeTable.create(spark, s"$location/tokens",
      Right(tokensOf(df, textCol, idCol, shingleK)),
      properties = props, replace = true)
    Index(bandsT, toksT, numHashes, lshBands, shingleK)
  }

  def load(spark: SparkSession, location: String): Index = {
    val bandsT = graft.lake.LakeTable.forLocation(spark, s"$location/bands")
    val p = bandsT.properties
    Index(bandsT,
      graft.lake.LakeTable.forLocation(spark, s"$location/tokens"),
      p("graft.dedup.numHashes").toInt,
      p("graft.dedup.lshBands").toInt,
      p("graft.dedup.shingleK").toInt)
  }

  /** Near-duplicate pairs of `batch` against the indexed corpus AND
    * within the batch itself, exact-Jaccard-verified at `threshold`.
    * `id_b` is always the new doc; `id_a` is its (older or batch-mate)
    * counterpart. The corpus is touched only through (a) the band join
    * and (b) the candidate-filtered token fetch.
    */
  def nearDupPairs(index: Index, batch: DataFrame, threshold: Double,
      textCol: String = "text", idCol: String = "doc_id"): DataFrame =
    nearDupPairsSketched(index,
      bandsOf(batch, textCol, idCol, index.numHashes, index.lshBands,
        index.shingleK),
      tokensOf(batch, textCol, idCol, index.shingleK),
      threshold, idCol)

  /** The batch's LSH sketch — (bands, tokens) exactly as the index
    * stores them. Streaming callers materialize this ONCE per batch
    * (`localCheckpoint`) and feed it to BOTH the probe
    * ([[nearDupPairsSketched]]) and the admit
    * ([[appendIdempotentSketched]]): shingling + minhashing is the
    * map-side cost of the whole operator, and the lazy-lineage form
    * paid it twice per ingested document.
    */
  def sketch(index: Index, batch: DataFrame, textCol: String = "text",
      idCol: String = "doc_id"): (DataFrame, DataFrame) =
    (bandsOf(batch, textCol, idCol, index.numHashes, index.lshBands,
      index.shingleK),
      tokensOf(batch, textCol, idCol, index.shingleK))

  /** [[nearDupPairs]] over a precomputed batch sketch. */
  def nearDupPairsSketched(index: Index, newBands: DataFrame,
      newToks: DataFrame, threshold: Double,
      idCol: String = "doc_id"): DataFrame = {
    val oldBands = index.bands.read()
    val vsCorpus = oldBands.select(col("band_idx"), col("band_hash"),
        col("doc_id").as("id_a"))
      .join(newBands.select(col("band_idx"), col("band_hash"),
        col("doc_id").as("id_b")), Seq("band_idx", "band_hash"))
      // a re-run batch (or a crash between nearDupPairs and append) has
      // its docs in the index already: without this guard every such doc
      // pairs with itself at jaccard 1.0 and gets dropped as its own
      // duplicate downstream
      .filter(col("id_a") =!= col("id_b"))
    val vsBatch = newBands.select(col("band_idx"), col("band_hash"),
        col("doc_id").as("id_a"))
      .join(newBands.select(col("band_idx"), col("band_hash"),
        col("doc_id").as("id_b")), Seq("band_idx", "band_hash"))
      .filter(col("id_a") < col("id_b"))
    val candidates = vsCorpus.select("id_a", "id_b")
      .unionByName(vsBatch.select("id_a", "id_b"))
      .distinct()
    // token sets: fresh for the batch, candidate-filtered from the index
    // anti-join before the union: a doc present in BOTH the index and
    // the batch (operator re-run) would otherwise contribute its token
    // rows twice, inflating `inter` for every pair it appears in.
    // dropDuplicates: a doc whose index append was REPLAYED (crash
    // between append and the caller's checkpoint advancing) has two
    // identical token rows — exploding both doubles `inter` and
    // inflates jaccard (2I/(n_a+n_b−2I)), falsely dropping novel docs.
    // Applied AFTER the candidate semi-join, so the shuffle it costs is
    // candidate-sized, never corpus-sized.
    val oldToks = index.tokens.read().join(
      candidates.select(col("id_a").as("doc_id")).distinct(),
      Seq("doc_id"), "left_semi")
      .dropDuplicates("doc_id")
      .join(newToks.select("doc_id"), Seq("doc_id"), "left_anti")
    val toks = oldToks.unionByName(newToks)
      .select(col("doc_id").as(idCol), col("n"),
        explode(col("toks")).as("tok"))
    candidates
      .join(toks.select(col(idCol).as("id_a"), col("n").as("n_a"),
        col("tok")), Seq("id_a"))
      .join(toks.select(col(idCol).as("id_b"), col("n").as("n_b"),
        col("tok")), Seq("id_b", "tok"))
      .groupBy(col("id_a"), col("id_b"), col("n_a"), col("n_b"))
      .agg(count(lit(1)).as("inter"))
      .withColumn("jaccard", col("inter").cast("double") /
        (col("n_a") + col("n_b") - col("inter")))
      .filter(col("jaccard") >= threshold)
      .select(col("id_a"), col("id_b"),
        round(col("jaccard"), 6).as("jaccard"))
  }

  /** Admit a batch into the index (after the caller dropped its dups):
    * two snapshot-isolated appends, corpus files untouched.
    */
  def append(index: Index, batch: DataFrame, textCol: String = "text",
      idCol: String = "doc_id"): Unit = {
    index.bands.append(bandsOf(batch, textCol, idCol, index.numHashes,
      index.lshBands, index.shingleK).repartition(col("band_idx")))
    index.tokens.append(tokensOf(batch, textCol, idCol, index.shingleK))
  }

  /** [[append]] made REPLAY-SAFE for at-least-once callers (streaming
    * `foreachBatch`): each index table records `stampKey -> stampValue`
    * on its append snapshot, and a table that already carries the stamp
    * skips its append. The two appends are not one atomic commit, so
    * each guards ITSELF — a crash between them replays only the missing
    * half. The stamp check is a snapshot-summary scan: metadata-only,
    * no data read.
    */
  def appendIdempotent(index: Index, batch: DataFrame, stampKey: String,
      stampValue: String, textCol: String = "text",
      idCol: String = "doc_id"): Unit =
    appendIdempotentSketched(index,
      bandsOf(batch, textCol, idCol, index.numHashes, index.lshBands,
        index.shingleK),
      tokensOf(batch, textCol, idCol, index.shingleK),
      stampKey, stampValue)

  /** [[appendIdempotent]] over a precomputed (and typically
    * kept-filtered) batch sketch — the no-reshingle admit path.
    */
  def appendIdempotentSketched(index: Index, newBands: DataFrame,
      newToks: DataFrame, stampKey: String, stampValue: String): Unit = {
    def stamped(t: graft.lake.LakeTable): Boolean =
      t.meta.snapshots.exists(_.summary.get(stampKey).contains(stampValue))
    if (!stamped(index.bands))
      index.bands.append(newBands.repartition(col("band_idx")),
        summary = Map(stampKey -> stampValue))
    if (!stamped(index.tokens))
      index.tokens.append(newToks,
        summary = Map(stampKey -> stampValue))
  }
}
