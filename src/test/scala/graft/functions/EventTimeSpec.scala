package graft.functions

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark

/** Fixture-type defense for event time: the driver's events.ts has
  * shipped both as int64 epoch-nanos and as parquet timestamp[us]
  * (TIMESTAMP_NTZ in Spark) across regenerations — r6 lost 20 queries
  * to an analysis-time crash on that drift. eventTime must yield the
  * SAME wall-clock instants from either physical layout, and refuse
  * non-time types loudly at plan time.
  */
class EventTimeSpec extends AnyFunSuite {
  import TestSpark._
  private lazy val s = spark

  test("long-nanos and timestamp_ntz layouts read to identical instants") {
    import s.implicits._
    val micros = Seq(0L, 1704067200000000L, 1704067200123456L,
      1704067200999999L)
    val dir = java.nio.file.Files.createTempDirectory("evt-")
    val nanosPath = dir.resolve("nanos").toString
    val ntzPath = dir.resolve("ntz").toString
    micros.map(_ * 1000L).toDF("ts").write.parquet(nanosPath)
    micros.toDF("us")
      .select(timestamp_micros(col("us")).cast("timestamp_ntz").as("ts"))
      .write.parquet(ntzPath)
    def instants(path: String): Seq[Long] = {
      val df = s.read.parquet(path)
      df.select(unix_micros(TrinoFunctions.eventTime(df)).as("us"))
        .collect().map(_.getLong(0)).toSeq.sorted
    }
    assert(instants(nanosPath) == micros.sorted)
    assert(instants(ntzPath) == micros.sorted)
  }

  test("non-time ts type fails at plan time, not as a wrong answer") {
    import s.implicits._
    val df = Seq("oops").toDF("ts")
    val e = intercept[IllegalArgumentException] {
      TrinoFunctions.eventTime(df)
    }
    assert(e.getMessage.contains("unsupported event-time type"))
  }
}
