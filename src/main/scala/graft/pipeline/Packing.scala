package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Training-sequence shaping: concat-and-split packing and
  * sliding-window chunking — the two operators that turn a curated
  * document corpus into fixed-length model inputs.
  *
  * Packing is inherently a prefix sum (every document's offset depends
  * on every document before it), so a naive "global order + running
  * total" is a single-partition sort — the textbook 100 TB
  * scale-killer. The industry shape (and ours) is SHARD-THEN-PACK:
  * documents are assigned to `shards` deterministic md5 shards first,
  * and the prefix sum runs independently per shard. Real pipelines
  * shard their output into files anyway, so per-shard sequence ids are
  * the natural product, not a compromise. `shards` is the parallelism
  * knob: at 100 TB pick it so one shard's token count fits a task
  * (thousands of shards), exactly like choosing output file counts.
  *
  * Chunking has no cross-row dependency at all — pure per-document
  * explode, embarrassingly parallel at any scale.
  */
object Packing {

  /** Concat-and-split packing (the standard LLM-pretraining shaper):
    * within each shard, documents are concatenated in `idCol` order and
    * the token stream is cut every `seqLen` tokens; a document may
    * straddle a cut. Emits one row per document with its shard, token
    * count, start offset in the shard's stream, and the first/last
    * sequence ids it lands in (`shard` + `first_seq` globally identify
    * a training sequence).
    *
    * Tokens are whitespace tokens (the same tokenizer as
    * [[TextAnalysis.tokenCounts]]); a real deployment swaps in its BPE
    * counts — the packing arithmetic is tokenizer-agnostic.
    *
    * The per-shard window is an exchange on `shard` followed by an
    * in-task ordered scan: one shuffle, carrying (id, shard, n_tokens)
    * only — text never leaves the scan.
    */
  def packSequences(df: DataFrame, seqLen: Int = 512, shards: Int = 4,
      textCol: String = "text", idCol: String = "doc_id",
      salt: String = "pack", carryCols: Seq[String] = Nil): DataFrame =
    packCounts(df, size(split(trim(col(textCol)), "\\s+")).cast("long"),
      seqLen, shards, idCol, salt, carryCols)

  /** [[packSequences]] with the token count supplied as an EXPRESSION
    * instead of re-tokenizing text — the entry point for a pipeline
    * that already carries counts (its own BPE tokenizer, or an
    * upstream stage like token-budget admission): the packing
    * arithmetic is tokenizer-agnostic, and a frame that dropped its
    * text column upstream (so only narrow rows ride the mix/pack
    * exchanges) packs without ever re-joining the corpus.
    */
  def packCounts(df: DataFrame, tokens: Column, seqLen: Int = 512,
      shards: Int = 4, idCol: String = "doc_id", salt: String = "pack",
      carryCols: Seq[String] = Nil): DataFrame = {
    require(seqLen >= 1 && shards >= 1, "seqLen and shards are positive")
    val w = Window.partitionBy(col("shard")).orderBy(col(idCol))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    // carryCols ride through the pack (chain composition: lang/quality
    // next to the layout) — they join the (id, shard, n_tokens) shuffle
    // rows, so keep them narrow; text never leaves the scan.
    df.select(col(idCol) +: tokens.cast("long").as("n_tokens") +:
        Sampling.bucketCol(col(idCol), salt, shards).as("shard") +:
        carryCols.map(col): _*)
      .withColumn("start_offset",
        sum(col("n_tokens")).over(w) - col("n_tokens"))
      // integer `div`, not floating floor(x/y): exact at any offset
      .withColumn("first_seq", expr(s"start_offset div ${seqLen}L"))
      .withColumn("last_seq",
        expr(s"(start_offset + n_tokens - 1) div ${seqLen}L"))
  }

  /** Per-shard packing-efficiency report — the utilization numbers a
    * pipeline watches when shaping training data: documents, tokens,
    * emitted sequences, documents straddling a sequence boundary
    * (they need cross-document attention masking or boundary resets),
    * tail waste (the only padding concat-and-split produces: the
    * unfilled end of each shard's last sequence) and utilization
    * (tokens / capacity). One aggregation over [[packSequences]]'s
    * narrow per-doc rows — shards×1 output rows, no extra corpus
    * pass; `n_seqs = ceil(tokens/seqLen)` is exact because the shard
    * stream is gapless by construction (PackingSpec pins that).
    */
  def packReport(df: DataFrame, seqLen: Int = 512, shards: Int = 4,
      textCol: String = "text", idCol: String = "doc_id",
      salt: String = "pack"): DataFrame = {
    val capacity = expr(s"n_seqs * ${seqLen}L")
    packSequences(df, seqLen, shards, textCol, idCol, salt)
      .groupBy(col("shard"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("n_tokens")).as("n_tokens"),
        sum((col("first_seq") =!= col("last_seq")).cast("long"))
          .as("n_split_docs"))
      .withColumn("n_seqs",
        expr(s"(n_tokens + ${seqLen - 1}L) div ${seqLen}L"))
      .withColumn("tail_waste", capacity - col("n_tokens"))
      .withColumn("utilization",
        round(col("n_tokens").cast("double") / capacity, 6))
      .select(col("shard"), col("n_docs"), col("n_tokens"),
        col("n_seqs"), col("n_split_docs"), col("tail_waste"),
        col("utilization"))
  }

  /** Sliding-window chunking for embedding/retrieval pipelines: each
    * document yields chunks of up to `chunk` tokens starting every
    * `stride` tokens (overlap = chunk - stride), covering every token.
    * The trailing chunk may be short. Emits (id, chunk_idx,
    * chunk_tokens, chunk_md5) — the md5 stands in for the chunk payload
    * so the (much larger) text doesn't ride the result; a pipeline
    * materializing chunk text selects the slice itself.
    *
    * Whole operator is one per-row generate: no shuffle, no state.
    */
  def chunkSliding(df: DataFrame, chunk: Int = 64, stride: Int = 48,
      textCol: String = "text", idCol: String = "doc_id"): DataFrame = {
    require(chunk >= 1 && stride >= 1, "chunk and stride are positive")
    require(stride <= chunk,
      "stride > chunk would skip tokens — the contract covers every token")
    df.select(col(idCol),
        split(trim(col(textCol)), "\\s+").as("_toks"))
      .select(col(idCol), posexplode(expr(
        s"""transform(sequence(0L, (size(_toks) - 1) div ${stride}L),
            k -> slice(_toks, cast(k * $stride + 1 as int), $chunk))""")))
      .select(col(idCol), col("pos").cast("int").as("chunk_idx"),
        size(col("col")).as("chunk_tokens"),
        md5(concat_ws(" ", col("col")).cast("binary")).as("chunk_md5"))
  }
}
