package graft.lake

import java.nio.file.Files
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark

/** Model-based testing of the snapshot/DML machinery (SURVEY §5.3):
  * a seeded random op sequence runs against both the LakeTable and a
  * trivial in-memory model; after every op the table must agree with the
  * model, in both merge modes. Plus randomized pruning equivalence:
  * for random predicates, the pruned scan must equal brute-force filter.
  */
class ModelCheckSpec extends AnyFunSuite {
  import TestSpark._
  private lazy val s = spark

  def runModelCheckPublic(mode: String, seed: Long, nOps: Int): Unit = {
    import s.implicits._
    val rnd = new scala.util.Random(seed)
    val loc = Files.createTempDirectory(s"model-$mode-").resolve("t").toString
    var nextId = 0L
    def freshRows(n: Int): Seq[(Long, Long, String)] =
      (0 until n).map { _ =>
        val id = nextId; nextId += 1
        (id, rnd.nextInt(100).toLong, s"s${rnd.nextInt(5)}")
      }
    val init = freshRows(20)
    val t = LakeTable.create(s, loc,
      Right(init.toDF("id", "v", "tag")),
      partitioning = Seq("tag"),
      properties = Map("merge_mode" -> mode))
    // model: id -> (v, tag); snapshots of the model for rollback
    var model = init.map(r => r._1 -> (r._2, r._3)).toMap
    var history = Map[Long, Map[Long, (Long, String)]](
      t.meta.currentSnapshotId.get -> model)

    def check(opDesc: String): Unit = {
      val got = t.read().select("id", "v", "tag").collect()
        .map(r => r.getLong(0) -> (r.getLong(1), r.getString(2))).toMap
      assert(got == model, s"divergence after $opDesc (seed=$seed): " +
        s"missing=${(model.keySet -- got.keySet).take(5)} " +
        s"extra=${(got.keySet -- model.keySet).take(5)} " +
        s"diff=${model.collect { case (k, v) if got.get(k).exists(_ != v) => k }.take(5)}")
    }

    (1 to nOps).foreach { i =>
      rnd.nextInt(7) match {
        case 0 => // append
          val rows = freshRows(1 + rnd.nextInt(5))
          t.append(rows.toDF("id", "v", "tag"))
          model ++= rows.map(r => r._1 -> (r._2, r._3))
          history += t.meta.currentSnapshotId.get -> model
          check(s"op$i append")
        case 1 => // delete by predicate
          val m = 2 + rnd.nextInt(5); val r0 = rnd.nextInt(m)
          t.delete(col("v") % m === r0)
          model = model.filterNot { case (_, (v, _)) => v % m == r0 }
          history += t.meta.currentSnapshotId.getOrElse(-1L) -> model
          check(s"op$i delete v%$m==$r0")
        case 2 => // update
          val cut = rnd.nextInt(100); val add = 1 + rnd.nextInt(7)
          t.update(col("v") < cut, Map("v" -> (col("v") + add)))
          model = model.map { case (k, (v, tag)) =>
            k -> (if (v < cut) (v + add, tag) else (v, tag))
          }
          history += t.meta.currentSnapshotId.getOrElse(-1L) -> model
          check(s"op$i update v<$cut +=$add")
        case 3 => // rollback to a random known snapshot
          val snaps = history.keySet.filter(_ >= 0).toSeq.sorted
          val target = snaps(rnd.nextInt(snaps.length))
          t.rollback(target)
          model = history(target)
          // later model snapshots are now stale for rollback purposes:
          // the table keeps them in its log, and so do we in `history`.
          check(s"op$i rollback->$target")
        case 4 => // optimize must never change results
          t.optimize(fileSizeThresholdBytes = 1L << 30)
          check(s"op$i optimize")
        case 5 => // merge: upsert a random mix of existing and fresh ids
          val existing = rnd.shuffle(model.keys.toSeq).take(rnd.nextInt(4))
            .map(id => (id, 500L + rnd.nextInt(100),
              s"s${rnd.nextInt(5)}"))
          val srcRows = existing ++ freshRows(1 + rnd.nextInt(3))
          t.merge(srcRows.toDF("id", "v", "tag"), Seq("id"))
          model ++= srcRows.map(r => r._1 -> (r._2, r._3))
          history += t.meta.currentSnapshotId.getOrElse(-1L) -> model
          check(s"op$i merge upsert ${srcRows.map(_._1)}")
        case 6 => // equality delete by key set (no table read in MoR)
          val ids = rnd.shuffle(model.keys.toSeq).take(rnd.nextInt(4))
          t.deleteByKeys(ids.toDF("id"), Seq("id"))
          model --= ids
          history += t.meta.currentSnapshotId.getOrElse(-1L) -> model
          check(s"op$i deleteByKeys $ids")
      }
    }
  }

  test("random DML sequence matches model (merge-on-read)") {
    runModelCheckPublic("merge-on-read", seed = 1001, nOps = 18)
  }

  test("random DML sequence matches model (copy-on-write)") {
    runModelCheckPublic("copy-on-write", seed = 2002, nOps = 18)
  }

  /** Branch-epoch model check (write-audit-publish shape): each epoch
    * creates `dev` from main's head, runs random DML against the BRANCH
    * — asserting after every op that dev tracks its model AND main is
    * byte-untouched (isolation) — then fast-forwards main and asserts
    * convergence. Ancestry stays legal by construction (main never
    * advances mid-epoch), which is exactly the WAP protocol.
    */
  def runBranchModelCheck(mode: String, seed: Long, epochs: Int): Unit = {
    import s.implicits._
    val rnd = new scala.util.Random(seed)
    val loc = Files.createTempDirectory(s"branch-model-$mode-")
      .resolve("t").toString
    var nextId = 0L
    def freshRows(n: Int): Seq[(Long, Long, String)] =
      (0 until n).map { _ =>
        val id = nextId; nextId += 1
        (id, rnd.nextInt(100).toLong, s"s${rnd.nextInt(5)}")
      }
    val init = freshRows(15)
    val t = LakeTable.create(s, loc, Right(init.toDF("id", "v", "tag")),
      properties = Map("merge_mode" -> mode))
    var mainModel = init.map(r => r._1 -> (r._2, r._3)).toMap
    def snap(df: org.apache.spark.sql.DataFrame) =
      df.select("id", "v", "tag").collect()
        .map(r => r.getLong(0) -> (r.getLong(1), r.getString(2))).toMap

    (1 to epochs).foreach { e =>
      t.createBranch("dev")
      var devModel = mainModel
      (1 to 1 + rnd.nextInt(4)).foreach { i =>
        rnd.nextInt(4) match {
          case 0 =>
            val rows = freshRows(1 + rnd.nextInt(4))
            t.append(rows.toDF("id", "v", "tag"), branch = "dev")
            devModel ++= rows.map(r => r._1 -> (r._2, r._3))
          case 1 =>
            val m = 2 + rnd.nextInt(4); val r0 = rnd.nextInt(m)
            t.delete(col("v") % m === r0, branch = "dev")
            devModel = devModel.filterNot { case (_, (v, _)) => v % m == r0 }
          case 2 =>
            val cut = rnd.nextInt(100); val add = 1 + rnd.nextInt(9)
            t.update(col("v") < cut, Map("v" -> (col("v") + add)),
              branch = "dev")
            devModel = devModel.map { case (k, (v, tag)) =>
              k -> (if (v < cut) (v + add, tag) else (v, tag))
            }
          case 3 =>
            val existing = rnd.shuffle(devModel.keys.toSeq)
              .take(rnd.nextInt(3))
              .map(id => (id, 700L + rnd.nextInt(50), s"s${rnd.nextInt(5)}"))
            val srcRows = existing ++ freshRows(1 + rnd.nextInt(2))
            t.merge(srcRows.toDF("id", "v", "tag"), Seq("id"),
              branch = "dev")
            devModel ++= srcRows.map(r => r._1 -> (r._2, r._3))
        }
        assert(snap(t.readRef("dev")) == devModel,
          s"epoch $e op $i: dev diverged from model (seed=$seed)")
        assert(snap(t.read()) == mainModel,
          s"epoch $e op $i: branch DML leaked onto main (seed=$seed)")
      }
      t.fastForward("main", "dev")
      mainModel = devModel
      assert(snap(t.read()) == mainModel,
        s"epoch $e: fast-forward did not converge main onto dev")
      t.dropBranch("dev")
    }
  }

  test("random branch DML: isolation + fast-forward (merge-on-read)") {
    runBranchModelCheck("merge-on-read", seed = 4004, epochs = 3)
  }

  test("random branch DML: isolation + fast-forward (copy-on-write)") {
    runBranchModelCheck("copy-on-write", seed = 5005, epochs = 3)
  }

  test("random predicates: pruned scan ≡ brute-force filter") {
    val rnd = new scala.util.Random(3003)
    val orders = s.read.parquet(s"$sf/orders.parquet")
    val loc = Files.createTempDirectory("prune-").resolve("t").toString
    val t = LakeTable.create(s, loc, Right(orders),
      partitioning = Seq("year(o_orderdate)", "o_orderstatus"))
    val full = t.read().cache()
    try {
      (1 to 12).foreach { i =>
        val pred = rnd.nextInt(4) match {
          case 0 =>
            val y = 1995 + rnd.nextInt(7)
            col("o_orderdate") >=
              lit(java.sql.Timestamp.valueOf(s"$y-01-01 00:00:00")) &&
              col("o_orderdate") <
              lit(java.sql.Timestamp.valueOf(s"${y + 1 + rnd.nextInt(2)}-01-01 00:00:00"))
          case 1 => col("o_orderstatus") === Seq("F", "O", "P")(rnd.nextInt(3))
          case 2 => col("o_totalprice") > lit(rnd.nextInt(400000).toDouble)
          case 3 => col("o_orderkey").isin(
            Seq.fill(5)(rnd.nextInt(1500).toLong): _*)
        }
        val got = t.read(pred).count()
        val want = full.filter(pred).count()
        assert(got == want, s"pruning changed results for predicate #$i: $pred")
      }
    } finally full.unpersist()
  }
}
