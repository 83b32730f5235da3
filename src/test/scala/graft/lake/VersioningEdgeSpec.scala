package graft.lake

import java.nio.file.Files
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark

/** Versioning edges the main lifecycle doesn't cover: tags, time travel
  * by timestamp, branch drop, and the optimistic-commit conflict path.
  */
class VersioningEdgeSpec extends AnyFunSuite {
  import TestSpark._
  private lazy val s = spark

  private def base() = {
    val df = s.read.parquet(s"$sf/customer.parquet")
      .filter(col("c_custkey") < 10)
      .select(col("c_custkey").as("custkey"), col("c_name").as("name"))
    LakeTable.create(s,
      Files.createTempDirectory("vedge-").resolve("t").toString, Right(df))
  }

  test("tags pin a snapshot; reads through the tag are frozen") {
    import s.implicits._
    val t = base()
    val snap1 = t.meta.currentSnapshotId.get
    t.createTag("v1.0", snap1)
    t.append(Seq((100L, "later")).toDF("custkey", "name"))
    assert(t.readRef("v1.0").count() == 10)
    assert(t.read().count() == 11)
    val refs = t.metaTable("refs").collect()
      .map(r => (r.getString(0), r.getString(1))).toMap
    assert(refs("v1.0") == "TAG" && refs("main") == "BRANCH")
  }

  test("FOR TIMESTAMP AS OF resolves along main ancestry") {
    import s.implicits._
    val t = base()
    val after1 = System.currentTimeMillis()
    Thread.sleep(15)
    t.append(Seq((100L, "later")).toDF("custkey", "name"))
    assert(t.asOfTime(after1).count() == 10)
    assert(t.asOfTime(System.currentTimeMillis()).count() == 11)
  }

  test("dropBranch removes the ref; main is protected") {
    val t = base()
    t.createBranch("scratch")
    assert(t.metaTable("refs").count() == 2)
    t.dropBranch("scratch")
    assert(t.metaTable("refs").count() == 1)
    intercept[IllegalArgumentException](t.readRef("scratch"))
    intercept[IllegalArgumentException](t.dropBranch("main"))
  }

  test("optimistic concurrency: stale metadata loses the commit race") {
    val t = base()
    val stale = t.meta // loaded at version N
    t.setProperties(Map("k" -> "v")) // advances to N+1
    intercept[IllegalStateException] {
      Meta.commit(stale.copy(properties = stale.properties + ("x" -> "y")))
    }
    // winner's commit is intact
    assert(t.properties("k") == "v")
  }

  test("readIncremental returns only appended rows, skips non-append commits") {
    import s.implicits._
    val t = base()
    val s0 = t.meta.currentSnapshotId.get
    t.append(Seq((100L, "a1")).toDF("custkey", "name"))
    t.update(col("custkey") === 100L, Map("name" -> lit("a1-upd")))
    t.append(Seq((101L, "a2")).toDF("custkey", "name"))
    val inc = t.readIncremental(s0)
    val keys = inc.select("custkey").collect().map(_.getLong(0)).toSet
    assert(keys == Set(100L, 101L),
      s"incremental read must cover only the two appends, got $keys")
    // empty range → empty result
    val head = t.meta.currentSnapshotId.get
    assert(t.readIncremental(head).count() == 0)
  }

  test("time travel reads with the snapshot's own schema") {
    import s.implicits._
    val t = base()
    val preEvo = t.meta.currentSnapshotId.get
    t.addColumn("phone", org.apache.spark.sql.types.StringType,
      default = Some("+00"))
    t.append(Seq((500L, "late")).toDF("custkey", "name"))
    // current read: evolved schema
    assert(t.read().columns.contains("phone"))
    // travel to pre-evolution snapshot: its schema, no phone column
    assert(!t.asOf(preEvo).columns.contains("phone"),
      "pre-evolution snapshot must read with its own schema")
    assert(t.asOf(preEvo).count() == 10)
    // across a REPLACE the old snapshot keeps its own columns
    val l = t.location
    val preReplace = t.meta.currentSnapshotId.get
    val t2 = LakeTable.create(s, l,
      Right(Seq(("x", 1L)).toDF("name2", "region")), replace = true)
    val old = t2.asOf(preReplace)
    assert(old.columns.toSet == Set("custkey", "name", "phone"))
    assert(old.count() == 11)
  }

  test("pruning after drop-then-re-add of a column name never skips old files") {
    import s.implicits._
    // old files: x = 10 (stats min=max=10). Drop x, re-add x DEFAULT '5':
    // old files now materialize x = 5. A name-keyed pruner would consult
    // the dead column's stats (10) and prune them for x = 5.
    val t = LakeTable.create(s,
      Files.createTempDirectory("vedge-").resolve("t").toString,
      Right(Seq((1L, 10L), (2L, 10L)).toDF("id", "x")))
    t.dropColumn("x")
    t.addColumn("x", org.apache.spark.sql.types.LongType, default = Some("5"))
    t.append(Seq((3L, 7L)).toDF("id", "x"))
    val hit = t.read(col("x") === 5L)
    assert(hit.collect().map(_.getLong(0)).toSet == Set(1L, 2L),
      "old files must survive pruning: their re-added column defaults to 5")
    // and DML goes through the same pruner
    t.delete(col("x") === 5L)
    assert(t.read().collect().map(_.getLong(0)).toSet == Set(3L))
  }

  test("rename keeps pruning keyed to the surviving field id") {
    import s.implicits._
    val t = LakeTable.create(s,
      Files.createTempDirectory("vedge-").resolve("t").toString,
      Right(Seq((1L, 100L), (2L, 200L)).toDF("id", "v")))
    t.renameColumn("v", "w")
    // predicate on the new name prunes with the old files' stats of the
    // SAME field — and still skips files correctly
    assert(t.read(col("w") === 100L).count() == 1)
    assert(t.read(col("w") === 999L).count() == 0)
  }

  test("version hint lagging behind a published version file self-heals") {
    import s.implicits._
    val t = base()
    t.setProperties(Map("a" -> "1"))
    val v = Meta.currentVersion(t.location).get
    // simulate a crash between version publish and hint update
    Files.writeString(Meta.metadataDir(t.location).resolve("version-hint.txt"),
      (v - 1).toString)
    assert(Meta.currentVersion(t.location).contains(v),
      "load must probe past a stale hint")
    // and the next commit proceeds instead of wedging on FileAlreadyExists
    t.setProperties(Map("b" -> "2"))
    assert(t.properties("a") == "1" && t.properties("b") == "2")
  }

  test("expireSnapshots never deletes files before its commit succeeds") {
    import s.implicits._
    val t = base()
    t.append(Seq((100L, "x")).toDF("custkey", "name"))
    Thread.sleep(15)
    // force a CAS failure for expire's commit: hand it stale metadata by
    // racing a property commit between load and commit. Easiest hook:
    // load meta, commit something else, then run expire on a table whose
    // metadata was just advanced — expire loads fresh, so instead verify
    // the ordering contract directly: files referenced by current
    // metadata survive expiration even when old snapshots are dropped.
    val liveBefore = t.read().count()
    t.expireSnapshots(olderThanMs = 0L) // drop all non-head history
    assert(t.read().count() == liveBefore, "head snapshot data intact")
    assert(t.meta.snapshots.map(_.snapshotId).toSet ==
      Set(t.meta.currentSnapshotId.get), "history dropped")
    // current metadata references only existing files
    val (d, del) = Meta.liveFiles(t.meta, t.meta.currentSnapshot.get)
    (d.map(_.path) ++ del.map(_.path)).foreach { p =>
      assert(Files.exists(java.nio.file.Paths.get(t.location, p)),
        s"committed metadata references a deleted file: $p")
    }
  }

  test("merge with NaN keys degrades to a full scan instead of throwing") {
    import s.implicits._
    val t = LakeTable.create(s,
      Files.createTempDirectory("nan-").resolve("t").toString,
      Right(Seq((1.0, "a"), (2.0, "b")).toDF("k", "name")))
    // a NaN source key makes max(k) = NaN: the derived pruning literal
    // must be skipped (prune-nothing), not crash BigDecimal("NaN")
    val snap = t.merge(
      Seq((1.0, "a2"), (Double.NaN, "ghost")).toDF("k", "name"),
      keys = Seq("k"))
    assert(snap.isDefined)
    val got = t.read().orderBy("k").collect()
      .map(r => (r.getDouble(0), r.getString(1)))
    // NaN never equals anything → the ghost row inserts; 1.0 updates
    assert(got.count(_._2 == "a2") == 1)
    assert(got.count(_._2 == "ghost") == 1)
    assert(got.length == 3)
  }

  test("concurrent loads and commits never corrupt the version hint") {
    import s.implicits._
    val t = base()
    val errors = new java.util.concurrent.ConcurrentLinkedQueue[Throwable]()
    val commits = new java.util.concurrent.atomic.AtomicInteger(0)
    // readers hammer currentVersion (which opportunistically rewrites
    // the hint) while writers race CAS commits with retry — the fixed
    // atomicWrite must never lose a tmp file or publish a torn hint
    val threads = (1 to 6).map { i =>
      new Thread(() => {
        try {
          (1 to 15).foreach { j =>
            if (i <= 2) { // writer with CAS retry
              var done = false
              while (!done) {
                try {
                  t.setProperties(Map(s"p$i-$j" -> "v"))
                  commits.incrementAndGet(); done = true
                } catch { case _: IllegalStateException => () }
              }
            } else { // reader
              assert(Meta.currentVersion(t.location).isDefined)
              t.read().count()
            }
          }
        } catch { case e: Throwable => errors.add(e) }
      })
    }
    threads.foreach(_.start()); threads.foreach(_.join())
    assert(errors.isEmpty, s"concurrent access failed: ${errors.peek()}")
    assert(commits.get() == 30)
    assert((1 to 2).forall(i => t.properties.contains(s"p$i-15")))
  }

  test("manifest chain stays bounded across many commits") {
    import s.implicits._
    val t = base()
    val firstSnap = t.meta.currentSnapshotId.get
    val baseRows = t.read().count()
    (1 to 50).foreach { i =>
      t.append(Seq((1000L + i, s"row$i")).toDF("custkey", "name"))
    }
    val m = t.meta
    val chain = m.currentSnapshot.get.manifests
    val mergeMin = 8 // default manifest_merge_min
    assert(chain.size <= mergeMin + 1,
      s"manifest chain grew to ${chain.size} after 50 commits")
    // compaction preserves the live set
    assert(t.read().count() == baseRows + 50)
    // old snapshots (their own manifest lists) still time-travel
    assert(t.asOf(firstSnap).count() == baseRows)
    // mid-history snapshot resolves too
    val mid = m.snapshots(m.snapshots.size / 2)
    assert(t.asOf(mid.snapshotId).count() > 0)
    // CDC still attributes per-commit deltas after compaction kicked in
    val lastTwo = m.snapshots.takeRight(2)
    val diff = t.changes(lastTwo.head.snapshotId, lastTwo.last.snapshotId)
    assert(diff.count() == 1, "one appended row between adjacent snapshots")
  }

  test("sorted_by table property orders rows within data files") {
    val df = s.read.parquet(s"$sf/customer.parquet")
      .select(col("c_custkey").as("custkey"), col("c_name").as("name"))
      .orderBy(rand(7)) // shuffle input order
    val t = LakeTable.create(s,
      Files.createTempDirectory("sorted-").resolve("t").toString,
      Right(df), properties = Map("sorted_by" -> "custkey"))
    // every file individually sorted: per-file check via $path
    val rows = t.readWithMetaColumns()
      .select(col("$path"), col("custkey")).collect()
      .groupBy(_.getString(0))
    rows.foreach { case (_, rs) =>
      val keys = rs.map(_.getLong(1)).toSeq
      assert(keys == keys.sorted, "file not sorted by custkey")
    }
  }
}
