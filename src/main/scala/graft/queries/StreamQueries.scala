package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.streaming.EventStreams

/** Structured Streaming surfaced through the driver contract: the
  * streaming plans execute to completion against the static event files
  * (memory sink, `processAllAvailable`) and the materialized result is
  * returned — so the incremental path is oracle-checked against the same
  * DuckDB SQL as its batch twin.
  */
object StreamQueries {

  /** Watermarked hourly tumbling windows, streaming execution; same
    * oracle as the batch `q_events_hourly`.
    */
  def streamHourly(s: SparkSession, d: String): DataFrame = {
    val name = "graft_stream_hourly_" + Math.abs(d.hashCode)
    val q = EventStreams.hourlyCounts(EventStreams.readEvents(s, s"$d/events.parquet"))
      .writeStream.outputMode("complete")
      .format("memory").queryName(name).start()
    try q.processAllAvailable() finally q.stop()
    s.table(name).orderBy("hour_bucket", "event_type")
  }

  /** Stateful gap sessionization (flatMapGroupsWithState): emitted
    * (closed) sessions, deterministic columns; rows-only check here,
    * exact batch-oracle equivalence asserted in StreamingSpec.
    */
  def streamSessions(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val name = "graft_stream_sessions_" + Math.abs(d.hashCode)
    val stream = EventStreams.readEvents(s, s"$d/events.parquet")
      .select(col("user_id"), col("event_time"), col("value"))
      .as[EventStreams.Event]
    val q = EventStreams.sessionize(stream, gapMs = 600000L)
      .writeStream.outputMode("append")
      .format("memory").queryName(name).start()
    try q.processAllAvailable() finally q.stop()
    s.table(name)
      .select(col("user_id"), col("session_start"), col("session_end"),
        col("n_events"), round(col("sum_value"), 4).as("sum_value"))
      .orderBy("user_id", "session_start")
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "stream_hourly_counts" -> streamHourly _,
    "stream_sessions" -> streamSessions _
  )

  val oracleSql: Map[String, String] = Map(
    "stream_hourly_counts" ->
      """SELECT CAST(date_trunc('hour', ts) AS TIMESTAMP) AS hour_bucket,
                event_type, count(*) AS n_events,
                round(sum(value), 4) AS sum_value
         FROM events GROUP BY 1, 2 ORDER BY hour_bucket, event_type"""
    // stream_sessions: closed-session subset is engine-defined → rows-only;
    // exact equivalence to the batch window oracle is in StreamingSpec.
  )
}
