package graft.streaming

import org.apache.spark.sql.DataFrame
import graft.lake.LakeTable

/** Streaming ingestion into a lake table: `foreachBatch` → one append
  * snapshot per micro-batch, stamped with the batch id.
  *
  * Structured Streaming's `foreachBatch` contract is at-least-once — a
  * batch is REPLAYED if the sink commits but the driver dies before the
  * checkpoint advances. The stamp turns that into exactly-once table
  * state: before committing, the sink reads the table's already-ingested
  * batch ids for this query (snapshot summaries are metadata — no data
  * scan) and skips a batch it has already durably committed. This is the
  * standard idempotent-sink pattern (Iceberg/Delta streaming writers do
  * exactly this) and the only part of end-to-end exactly-once the engine
  * must supply; source replay is the checkpoint's job.
  *
  * At scale each micro-batch is one snapshot-isolated commit: readers
  * never see a torn batch, CDC/incremental readers consume batch
  * boundaries for free, and manifest-list compaction (LakeTable) keeps
  * the metadata chain bounded under a high-frequency trigger.
  */
object StreamIngest {

  /** Summary key carrying `<queryName>:<batchId>` on ingest snapshots. */
  val BatchStamp = "graft.streaming.batch"

  private def stamp(queryName: String, batchId: Long) = s"$queryName:$batchId"

  /** Already-committed batch ids for `queryName` (all branches' history
    * — summaries live on snapshots, which rollback keeps reachable).
    * The batch id is everything after the LAST ':' — query names may
    * themselves contain ':' (`a` must not claim `a:v2`'s stamps).
    */
  def committedBatches(table: LakeTable, queryName: String): Set[Long] =
    table.meta.snapshots.flatMap(_.summary.get(BatchStamp))
      .flatMap { s =>
        val cut = s.lastIndexOf(':')
        if (cut == queryName.length && s.substring(0, cut) == queryName)
          s.substring(cut + 1).toLongOption
        else None
      }
      .toSet

  /** Start `stream` UPSERTING into `table` by `keys` — one MERGE per
    * micro-batch (matched rows updated from the stream, unmatched
    * inserted), with the same batch-stamp idempotency as
    * [[ingestAvailable]]. This is the CDC-materialization shape: a
    * change stream keyed by primary key keeps a lake table current,
    * and an at-least-once replay of a batch is rejected by its stamp
    * before any work runs. Rows are deduplicated per key WITHIN each
    * batch first (MERGE correctly refuses multi-matches): duplicate
    * deliveries are identical by contract, so any representative wins;
    * a true multi-version CDC feed would pre-reduce by its sequence
    * column instead.
    *
    * At scale each micro-batch MERGE prunes target files by the batch's
    * key bounding box (LakeTable.merge) — a batch touching a narrow key
    * range never rewrites the rest of a 100 TB table.
    */
  def upsertAvailable(stream: DataFrame, table: LakeTable, keys: Seq[String],
      queryName: String, checkpointDir: String): Long = {
    var committed = 0L
    val seen = scala.collection.mutable.Set.empty[Long] ++=
      committedBatches(table, queryName)
    val q = stream.writeStream
      .outputMode("append")
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        if (!seen.contains(batchId) && !batch.isEmpty) {
          val snap = table.merge(batch.dropDuplicates(keys), keys,
            summary = Map(BatchStamp -> stamp(queryName, batchId)))
          if (snap.nonEmpty) { seen += batchId; committed += 1 }
        }
      }
      .start()
    try q.processAllAvailable() finally q.stop()
    committed
  }

  /** Start `stream` appending into `table`, drain everything currently
    * available, and stop. Returns the number of micro-batches that
    * actually committed (replays and empty batches are skipped).
    */
  def ingestAvailable(stream: DataFrame, table: LakeTable,
      queryName: String, checkpointDir: String): Long = {
    var committed = 0L
    // One metadata read up front; this writer is the only one stamping
    // `queryName`, so tracking its own commits locally avoids an O(#
    // snapshots) metadata load + parse per micro-batch.
    val seen = scala.collection.mutable.Set.empty[Long] ++=
      committedBatches(table, queryName)
    val q = stream.writeStream
      .outputMode("append")
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        if (!seen.contains(batchId) && !batch.isEmpty) {
          table.append(batch,
            summary = Map(BatchStamp -> stamp(queryName, batchId)))
          seen += batchId
          committed += 1
        }
      }
      .start()
    try q.processAllAvailable() finally q.stop()
    committed
  }
}
