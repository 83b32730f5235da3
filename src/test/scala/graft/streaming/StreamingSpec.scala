package graft.streaming

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark
import graft.queries.CoreQueries

/** Streaming ≡ batch equivalence: the incremental plans must produce
  * exactly what their batch counterparts produce over the same files.
  */
class StreamingSpec extends AnyFunSuite {
  import TestSpark._
  private lazy val s = spark

  test("streamed hourly counts equal the batch aggregation") {
    val events = EventStreams.readEvents(s, s"$sf/events.parquet")
    val q = EventStreams.hourlyCounts(events)
      .writeStream.outputMode("complete")
      .format("memory").queryName("hourly_out").start()
    try {
      q.processAllAvailable()
      val streamed = s.table("hourly_out")
        .orderBy("hour_bucket", "event_type").collect().toSeq
      val batch = CoreQueries.eventsHourly(s, sf).collect().toSeq
      assert(streamed.map(_.toString) == batch.map(_.toString))
    } finally q.stop()
  }

  test("stateful sessionization matches the batch window oracle") {
    import s.implicits._
    val batchEvents = s.read.parquet(s"$sf/events.parquet")
      .withColumn("event_time",
        graft.functions.TrinoFunctions.nanosToTimestamp(col("ts")))
      .select(col("user_id"), col("event_time"), col("value"))
    val expected = EventStreams.sessionizeBatch(batchEvents, gapMs = 600000L)
      .orderBy("user_id", "session_start")

    val stream = EventStreams.readEvents(s, s"$sf/events.parquet")
      .select(col("user_id"), col("event_time"), col("value"))
      .as[EventStreams.Event]
    val q = EventStreams.sessionize(stream, gapMs = 600000L)
      .writeStream.outputMode("append")
      .format("memory").queryName("sessions_out").start()
    try {
      q.processAllAvailable()
      val got = s.table("sessions_out")
      // streaming emits only *closed* sessions (the last session per user
      // stays open in state) → got ⊆ expected, and any session it does
      // emit must match the batch oracle exactly.
      val expKeys = expected.collect()
        .map(r => (r.getLong(0), r.getTimestamp(1), r.getTimestamp(2),
          r.getInt(3), r.getDouble(4))).toSet
      val gotRows = got.collect()
        .map(r => (r.getLong(0), r.getTimestamp(1), r.getTimestamp(2),
          r.getInt(3), r.getDouble(4))).toSet
      assert(gotRows.nonEmpty, "no sessions closed — gap too large?")
      assert(gotRows.subsetOf(expKeys),
        s"streaming emitted sessions the batch oracle doesn't have: " +
          s"${(gotRows -- expKeys).take(3)}")
      // every user's non-final batch sessions must have been emitted
      val openPerUser = expected.collect().groupBy(_.getLong(0))
        .view.mapValues(_.maxBy(_.getTimestamp(1).getTime)).toMap
      val expectedClosed = expKeys.filterNot { k =>
        openPerUser.get(k._1).exists(r => r.getTimestamp(1) == k._2)
      }
      assert(expectedClosed.subsetOf(gotRows),
        s"batch-closed sessions missing from stream output: " +
          s"${(expectedClosed -- gotRows).take(3)}")
    } finally q.stop()
  }
}
