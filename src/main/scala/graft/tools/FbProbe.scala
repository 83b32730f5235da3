package graft.tools

/** Scratch diagnostic: what conf does the foreachBatch session clone
  * actually run with, and do tiny shuffles coalesce there?
  */
object FbProbe {
  def main(args: Array[String]): Unit = {
    val spark = graft.SparkEnv.session()
    import org.apache.spark.sql.functions._
    val dir = java.nio.file.Files.createTempDirectory("fbprobe-")
    spark.range(100).withColumn("k", col("id") % 7)
      .write.parquet(dir.resolve("in").toString)
    val st = spark.readStream
      .schema("id LONG, k LONG").parquet(dir.resolve("in").toString)
    val q = st.writeStream
      .option("checkpointLocation", dir.resolve("ckpt").toString)
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
        val ss = batch.sparkSession
        println("FB adaptive.enabled=" +
          ss.conf.get("spark.sql.adaptive.enabled"))
        println("FB shuffle.partitions=" +
          ss.conf.get("spark.sql.shuffle.partitions"))
        val agg = batch.groupBy("k").count()
        val n = agg.rdd.getNumPartitions
        println(s"FB post-shuffle partitions=$n")
        ()
      }
      .start()
    q.processAllAvailable(); q.stop()
    println("MAIN adaptive.enabled=" +
      spark.conf.get("spark.sql.adaptive.enabled"))
    spark.stop()
  }
}
