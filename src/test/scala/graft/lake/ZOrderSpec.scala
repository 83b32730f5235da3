package graft.lake

import java.nio.file.Files
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark

/** Z-order compaction: after clustering on (a, b), min/max file pruning
  * must cut the file list for predicates on EITHER column — the
  * multi-dimensional locality a plain sort can't give.
  */
class ZOrderSpec extends AnyFunSuite {
  import TestSpark._
  private lazy val s = spark

  test("morton interleave is monotone in both dimensions") {
    import s.implicits._
    val df = Seq((1L, 1L), (1L, 2L), (2L, 1L), (3L, 3L))
      .toDF("x", "y")
      .select(ZOrder.interleave(Seq(col("x"), col("y")), 4).as("z"))
    val zs = df.collect().map(_.getLong(0)).toSeq
    // (1,1)=0b0011=3, (1,2)=0b1001=9, (2,1)=0b0110=6, (3,3)=0b1111=15
    assert(zs == Seq(3L, 9L, 6L, 15L))
  }

  test("z-order compaction enables pruning on both columns") {
    val orders = s.read.parquet(s"$sf/orders.parquet")
    val t = LakeTable.create(s,
      Files.createTempDirectory("zorder-").resolve("t").toString,
      Right(orders.repartition(6))) // several input files to compact
    val before = t.read().orderBy("o_orderkey").collect().toSeq

    val snap = t.optimize(fileSizeThresholdBytes = 1L << 30,
      clusterBy = Seq("o_custkey", "o_totalprice"),
      targetFileCount = Some(8))
    assert(snap.nonEmpty && snap.get.operation == "replace")
    assert(t.read().orderBy("o_orderkey").collect().toSeq == before,
      "clustering must not change results")

    val m = t.meta
    val (files, _) = Meta.liveFiles(m, m.currentSnapshot.get)
    assert(files.size >= 6, s"expected ~8 clustered files, got ${files.size}")

    def survivors(pred: org.apache.spark.sql.Column): Int =
      Scan.pruneFiles(m, files, Some(pred)).size

    // tight predicate on the FIRST clustered column prunes
    val byCust = survivors(col("o_custkey") < 10L)
    assert(byCust < files.size,
      s"custkey predicate kept all ${files.size} files")
    // ...and on the SECOND clustered column too (the z-order payoff)
    val byPrice = survivors(col("o_totalprice") < 20000.0)
    assert(byPrice < files.size,
      s"totalprice predicate kept all ${files.size} files")
  }
}
