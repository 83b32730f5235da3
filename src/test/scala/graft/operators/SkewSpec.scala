package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark

class SkewSpec extends AnyFunSuite {
  import TestSpark._
  private lazy val s = spark

  // 90% of rows share one key — the shape that stalls a single reducer.
  private lazy val skewed = {
    import s.implicits._
    (1 to 5000).map { i =>
      (if (i % 10 != 0) 1L else (i % 100).toLong, i.toDouble)
    }.toDF("k", "v")
  }

  private lazy val dim = {
    import s.implicits._
    (0L to 100L).map(k => (k, s"name$k")).toDF("k", "kname")
  }

  test("salted join ≡ plain join") {
    val plain = skewed.join(dim, Seq("k"))
      .groupBy("k").agg(count(lit(1)).as("n"), round(sum("v"), 4).as("s"))
      .orderBy("k").collect().toSeq
    val salted = Skew.saltedJoin(skewed, dim, "k", saltFactor = 8)
      .groupBy("k").agg(count(lit(1)).as("n"), round(sum("v"), 4).as("s"))
      .orderBy("k").collect().toSeq
    assert(salted == plain)
  }

  test("salted aggregate ≡ plain aggregate, with spread partials") {
    val plain = skewed.groupBy("k")
      .agg(count(lit(1)).as("n"), round(sum("v"), 4).as("s"))
      .orderBy("k").collect().toSeq
    val salted = Skew.saltedAggregate(skewed, "k", saltFactor = 8,
      partialAggs = Seq(count(lit(1)).as("pn"), sum("v").as("ps")),
      finalAggs = Seq(sum("pn").as("n"), round(sum("ps"), 4).as("s")))
      .orderBy("k").collect().toSeq
    assert(salted == plain)
    // the hot key really is spread: >1 distinct salt for k=1
    val spread = skewed.withColumn("_salt",
      pmod(xxhash64(struct(col("k"), col("v"))), lit(8)).cast("int"))
      .filter(col("k") === 1L).select("_salt").distinct().count()
    assert(spread > 4, s"hot key landed on only $spread salts")
  }
}
