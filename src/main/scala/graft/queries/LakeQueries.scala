package graft.queries

import java.nio.file.Files
import java.util.concurrent.ConcurrentHashMap
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.lake.{LakeTable, Scan}

/** Lake-layer operators exposed through the driver contract: each entry
  * builds a scenario (CTAS + DML on a temp lake table seeded from the
  * test parquet), then returns the observable result. Where the *final
  * state* is ANSI-expressible over the source tables, an oracle verifies
  * the whole lifecycle (write → snapshot log → MoR/CoW read) end to end;
  * versioning-only observables (snapshot logs, stats) get rows-only
  * checks and are covered by LakeLifecycleSpec instead.
  */
object LakeQueries {

  private val cache = new ConcurrentHashMap[String, LakeTable]()
  private lazy val base = Files.createTempDirectory("graft-lake-queries-")

  /** Build-once-per-JVM scenario table (Verify/Bench call every query
    * function; the DML lifecycle runs once, reads re-plan each call).
    */
  private def scenario(key: String, sfDir: String)(build: String => LakeTable)
      : LakeTable =
    cache.computeIfAbsent(s"$key|$sfDir", _ =>
      build(base.resolve(key + "-" + Math.abs(sfDir.hashCode)).toString))

  private def customerDf(s: SparkSession, d: String): DataFrame =
    Tables.customer(s, d).select(
      col("c_custkey").as("custkey"), col("c_name").as("name"),
      col("c_acctbal").as("account_balance"),
      col("c_mktsegment").as("mktsegment"))

  // ---- scenarios ------------------------------------------------------

  /** CTAS from the 3-way federation join, identity-partitioned
    * (`iceberg_trino_sqldemo.sql:19-44`), read back.
    */
  def ctasSelect(s: SparkSession, d: String): DataFrame = {
    val t = scenario("ctas", d) { loc =>
      val src = Tables.customer(s, d)
        .join(broadcast(Tables.nation(s, d)),
          col("c_nationkey") === col("n_nationkey"))
        .join(broadcast(Tables.region(s, d)),
          col("n_regionkey") === col("r_regionkey"))
        .filter(col("r_name") === "EUROPE")
        .select(col("c_custkey").as("custkey"), col("c_name").as("name"),
          col("c_mktsegment").as("mktsegment"), col("n_name").as("nation"))
      LakeTable.create(s, loc, Right(src), partitioning = Seq("mktsegment"))
    }
    t.read().orderBy("custkey")
  }

  /** MoR UPDATE (`sql:129`): balance := 1000 where custkey < 10. */
  def morUpdate(s: SparkSession, d: String): DataFrame = {
    val t = scenario("morupd", d) { loc =>
      val t0 = LakeTable.create(s, loc, Right(customerDf(s, d)),
        properties = Map("merge_mode" -> "merge-on-read"))
      t0.update(col("custkey") < 10, Map("account_balance" -> lit(1000.0)))
      t0
    }
    t.read().orderBy("custkey")
  }

  /** MoR DELETE (`sql:137`): drop every 10th customer. */
  def morDelete(s: SparkSession, d: String): DataFrame = {
    val t = scenario("mordel", d) { loc =>
      val t0 = LakeTable.create(s, loc, Right(customerDf(s, d)),
        properties = Map("merge_mode" -> "merge-on-read"))
      t0.delete(col("custkey") % 10 === 0)
      t0
    }
    t.read().orderBy("custkey")
  }

  /** Equality-delete MoR (public Iceberg v2/v3 delete shape — the form
    * streaming CDC writers emit; the reference script exercises only
    * position deletes). Deletes by KEY SET without reading the table,
    * then re-appends a subset of the deleted keys — the re-appended
    * rows carry a later sequence number, so the equality delete must
    * NOT hit them (sequence-immunity, the rule that makes
    * delete-then-reinsert CDC streams converge).
    */
  def equalityDelete(s: SparkSession, d: String): DataFrame = {
    val t = scenario("eqdel", d) { loc =>
      val src = customerDf(s, d)
      val t0 = LakeTable.create(s, loc, Right(src),
        properties = Map("merge_mode" -> "merge-on-read"))
      t0.deleteByKeys(
        src.filter(col("custkey") % 7 === 0).select("custkey"),
        Seq("custkey"))
      t0.append(src.filter(col("custkey") % 14 === 0))
      t0
    }
    t.read().orderBy("custkey")
  }

  /** CoW UPDATE+DELETE (`sql:25` copy-on-write mode). */
  def cowDml(s: SparkSession, d: String): DataFrame = {
    val t = scenario("cowdml", d) { loc =>
      val t0 = LakeTable.create(s, loc, Right(customerDf(s, d)),
        properties = Map("merge_mode" -> "copy-on-write"))
      t0.update(col("custkey") < 10, Map("account_balance" -> lit(1000.0)))
      t0.delete(col("custkey") % 10 === 0)
      t0
    }
    t.read().orderBy("custkey")
  }

  /** MERGE (`sql:146-157`): upsert shifted customer range. */
  def mergeUpsert(s: SparkSession, d: String): DataFrame = {
    val t = scenario("merge", d) { loc =>
      val target = customerDf(s, d).filter(col("custkey") < 100)
      val source = customerDf(s, d)
        .filter(col("custkey") >= 50 && col("custkey") < 150)
        .withColumn("name", concat(lit("M-"), col("name")))
        .withColumn("account_balance", col("account_balance") + lit(5.0))
      val t0 = LakeTable.create(s, loc, Right(target),
        properties = Map("merge_mode" -> "merge-on-read"))
      t0.merge(source, Seq("custkey"))
      t0
    }
    t.read().orderBy("custkey")
  }

  /** Time travel (`sql:216`): read the pre-append snapshot. */
  def timeTravel(s: SparkSession, d: String): DataFrame = {
    val t = scenario("travel", d) { loc =>
      val t0 = LakeTable.create(s, loc,
        Right(customerDf(s, d).filter(col("custkey") < 100)))
      t0.setProperties(Map("graft.test.snap1" ->
        t0.meta.currentSnapshotId.get.toString))
      t0.append(customerDf(s, d)
        .filter(col("custkey") >= 100 && col("custkey") < 120))
      t0
    }
    t.asOf(t.properties("graft.test.snap1").toLong).orderBy("custkey")
  }

  /** Branch isolation (`sql:238-247`): DML on dev, main untouched. */
  private def branchScenario(s: SparkSession, d: String): LakeTable =
    scenario("branch", d) { loc =>
      val t0 = LakeTable.create(s, loc,
        Right(customerDf(s, d).filter(col("custkey") < 100)),
        properties = Map("merge_mode" -> "merge-on-read"))
      t0.createBranch("dev")
      t0.append(customerDf(s, d)
        .filter(col("custkey") >= 100 && col("custkey") < 110), branch = "dev")
      t0.delete(col("custkey") < 5, branch = "dev")
      t0
    }

  def branchMain(s: SparkSession, d: String): DataFrame =
    branchScenario(s, d).read().orderBy("custkey")

  def branchDev(s: SparkSession, d: String): DataFrame =
    branchScenario(s, d).readRef("dev").orderBy("custkey")

  /** Branch DIFF — the audit a WAP flow runs before fast-forwarding:
    * both refs of the SAME table scanned in ONE plan (each ref must
    * resolve its own snapshot's file set — a scan-isolation property
    * the per-branch rows can't pin alone), full-outer joined on the
    * key and classified `both` / `dev_only` (would be published) /
    * `main_only` (was deleted on dev). Row-level output so the oracle
    * checks every key's classification, not just counts; the join
    * moves id-sized rows only.
    */
  def lakeBranchDiff(s: SparkSession, d: String): DataFrame = {
    val t = branchScenario(s, d)
    val main = t.read().select(col("custkey"), lit(true).as("_m"))
    val dev = t.readRef("dev").select(col("custkey"), lit(true).as("_d"))
    main.join(dev, Seq("custkey"), "full_outer")
      .select(col("custkey"),
        when(col("_m").isNotNull && col("_d").isNotNull, lit("both"))
          .when(col("_d").isNotNull, lit("dev_only"))
          .otherwise(lit("main_only")).as("status"))
      .orderBy("custkey")
  }

  /** CDC (`sql:114-125`): append + delete, then table_changes. */
  def cdcChanges(s: SparkSession, d: String): DataFrame = {
    val t = scenario("cdc", d) { loc =>
      val t0 = LakeTable.create(s, loc,
        Right(customerDf(s, d).filter(col("custkey") < 100)),
        properties = Map("merge_mode" -> "merge-on-read"))
      t0.setProperties(Map("graft.test.s0" ->
        t0.meta.currentSnapshotId.get.toString))
      t0.append(customerDf(s, d)
        .filter(col("custkey") >= 100 && col("custkey") < 150))
      t0.delete(col("custkey") % 7 === 0)
      t0.setProperties(Map("graft.test.s1" ->
        t0.meta.currentSnapshotId.get.toString))
      t0
    }
    t.changes(t.properties("graft.test.s0").toLong,
        t.properties("graft.test.s1").toLong)
      .select(col("_change_type").as("change_type"), col("custkey"))
      .orderBy("change_type", "custkey")
  }

  /** Cross-layer drift monitor: PSI of the token-count distribution
    * between a table's time-traveled BASELINE snapshot (`asOf` — the
    * accepted corpus as of the last publish) and the rows the next
    * ingest wave ADDED (the `table_changes` insert delta) — the "did
    * this wave shift the distribution?" check a curation pipeline
    * runs before publishing a new corpus snapshot. Composes three
    * already-oracled pieces — time travel, CDC, and
    * [[graft.pipeline.TextAnalysis.driftPsi]] — into one row, so a
    * contract drift between the versioned-scan layer and the drift
    * arithmetic cannot hide behind individually-green parts. Both
    * sides come off the SAME lake table (snapshot-pruned scans), and
    * the PSI keeps driftPsi's shape: one pass over the union, decile
    * edges from the baseline's capped deterministic sample,
    * metadata-sized exchanges only.
    *
    * Minimum-sample contract: BUILDING this frame collects the decile
    * sample eagerly and requires ≥ 10 sampled baseline docs (mod-10
    * id slice of the baseline snapshot) — a sub-100-doc fixture fails
    * fast at construction with driftPsi's explicit message, by
    * design, rather than lazily at execution.
    */
  /** Two-snapshot documents scenario SHARED by the drift-PSI and
    * corpus-diff rows (identical layout, ONE table build per dataset):
    * baseline snapshot s0 = even doc ids, one append wave of the odd
    * ids = s1, both snapshot ids stamped as table properties.
    */
  private def parityDocsScenario(s: SparkSession, d: String)
      : graft.lake.LakeTable =
    scenario("paritydocs", d) { loc =>
      val docs = s.read.parquet(s"$d/documents.parquet")
        .select(col("doc_id"), col("text"))
      val t0 = LakeTable.create(s, loc,
        Right(docs.filter(col("doc_id") % 2 === 0)))
      t0.setProperties(Map("graft.test.s0" ->
        t0.meta.currentSnapshotId.get.toString))
      t0.append(docs.filter(col("doc_id") % 2 =!= 0))
      t0.setProperties(Map("graft.test.s1" ->
        t0.meta.currentSnapshotId.get.toString))
      t0
    }

  def lakeDriftPsi(s: SparkSession, d: String): DataFrame = {
    val t = parityDocsScenario(s, d)
    val base = t.asOf(t.properties("graft.test.s0").toLong)
      .select(col("doc_id"), col("text"), lit(true).as("_ref"))
    val delta = t.changes(t.properties("graft.test.s0").toLong,
        t.properties("graft.test.s1").toLong)
      .filter(col("_change_type") === "insert")
      .select(col("doc_id"), col("text"), lit(false).as("_ref"))
    val tagged = base.unionByName(delta)
      .select(col("doc_id"), col("_ref"),
        size(split(trim(col("text")), "\\s+")).cast("long")
          .as("n_tokens"))
    graft.pipeline.TextAnalysis.driftPsi(tagged, col("_ref"), "n_tokens")
      .orderBy("bin")
  }

  /** Cross-layer corpus-version diff: the sketch kit
    * ([[graft.pipeline.Sketches.corpusDiffFlagged]]) run between a
    * table's time-traveled BASELINE snapshot and the CURRENT version —
    * "what did the ingest wave add?" as one hash-checked report row:
    * exact doc/token growth, per-version KMV vocabulary estimates, the
    * baseline's KMV resemblance to the new whole (how much of the
    * current corpus is old content), and CMS top-20 token mass per
    * version (did the wave amplify existing boilerplate). The frame is
    * the lake_drift_psi tagging — baseline scan ∪ CDC insert delta,
    * both snapshot-pruned off the SAME table, no id join — so `before`
    * = the current corpus and `after` (keep=true) = the baseline.
    */
  def lakeCorpusDiff(s: SparkSession, d: String): DataFrame = {
    val t = parityDocsScenario(s, d)
    val base = t.asOf(t.properties("graft.test.s0").toLong)
      .select(col("text"), lit(true).as("keep"))
    val delta = t.changes(t.properties("graft.test.s0").toLong,
        t.properties("graft.test.s1").toLong)
      .filter(col("_change_type") === "insert")
      .select(col("text"), lit(false).as("keep"))
    graft.pipeline.Sketches.corpusDiffFlagged(base.unionByName(delta))
      .select(col("n_docs_before").as("n_docs"),
        col("n_docs_after").as("n_docs_base"),
        col("n_tokens_before").as("n_tokens"),
        col("n_tokens_after").as("n_tokens_base"),
        col("est_vocab_before").as("est_vocab"),
        col("est_vocab_after").as("est_vocab_base"),
        col("est_jaccard").as("est_base_resemblance"),
        col("top20_mass_before").as("top20_mass"),
        col("top20_mass_after").as("top20_mass_base"))
  }

  /** Compaction invariance (`sql:258-265`): many small appends +
    * a delete, optimize, results unchanged.
    */
  def optimizeInvariance(s: SparkSession, d: String): DataFrame = {
    val t = scenario("optimize", d) { loc =>
      val t0 = LakeTable.create(s, loc,
        Right(customerDf(s, d).filter(col("custkey") < 40)),
        properties = Map("merge_mode" -> "merge-on-read"))
      (0 until 4).foreach { i =>
        t0.append(customerDf(s, d).filter(
          col("custkey") >= 40 + i * 10 && col("custkey") < 50 + i * 10))
      }
      t0.delete(col("custkey") % 9 === 0)
      t0.optimize(fileSizeThresholdBytes = 512L << 20)
      t0
    }
    t.read().orderBy("custkey")
  }

  /** Maintenance invariance (`sql:260-261`, SURVEY M1-M2): a lifecycle
    * of appends + DML, then expire_snapshots(retention 0) and
    * remove_orphan_files — history is dropped and storage reclaimed
    * (asserted in-scenario: snapshot count collapses to the ref heads,
    * a planted orphan file is deleted), but the CURRENT state must be
    * byte-identical to the oracle's replay of the same DML. The
    * companion ordering/crash-safety properties live in
    * LakeLifecycleSpec; this entry makes the end state driver-visible.
    */
  def maintenanceInvariance(s: SparkSession, d: String): DataFrame = {
    val t = scenario("maint", d) { loc =>
      val t0 = LakeTable.create(s, loc,
        Right(customerDf(s, d).filter(col("custkey") < 60)),
        properties = Map("merge_mode" -> "merge-on-read"))
      t0.append(customerDf(s, d)
        .filter(col("custkey") >= 60 && col("custkey") < 120))
      t0.update(col("custkey") < 10,
        Map("account_balance" -> lit(250.0)))
      t0.delete(col("custkey") % 11 === 0)
      // a stray tmp file the crash-cleanup sweep must remove
      val stray = java.nio.file.Paths.get(loc, "data", "stray-debris.tmp")
      java.nio.file.Files.createDirectories(stray.getParent)
      java.nio.file.Files.write(stray, Array[Byte](1, 2, 3))
      val before = t0.meta.snapshots.size
      t0.expireSnapshots(olderThanMs = 0L)
      t0.removeOrphanFiles(olderThanMs = 0L)
      require(t0.meta.snapshots.size < before,
        "retention-0 expiry must drop non-head history")
      require(!java.nio.file.Files.exists(stray),
        "orphan sweep must delete planted debris")
      t0
    }
    t.read().orderBy("custkey")
  }

  /** Hidden-partition pruned scan (`sql:13-15`): year(o_orderdate)
    * partitioning; the filter prunes year files before Spark plans.
    */
  def prunedScan(s: SparkSession, d: String): DataFrame = {
    val t = scenario("pruned", d) { loc =>
      LakeTable.create(s, loc, Right(Tables.orders(s, d)),
        partitioning = Seq("year(o_orderdate)"))
    }
    t.read(col("o_orderdate") >=
        lit(java.sql.Timestamp.valueOf("1997-01-01 00:00:00")) &&
        col("o_orderdate") <
        lit(java.sql.Timestamp.valueOf("1998-01-01 00:00:00")))
      .select(col("o_orderkey").as("orderkey"),
        to_date(col("o_orderdate")).as("order_date"),
        col("o_totalprice").as("totalprice"))
      .orderBy("orderkey")
  }

  /** Z-order clustered compaction: rewrite orders clustered on
    * (custkey, totalprice), then a selective filter on the *second*
    * clustered column — pruning works on either dimension, results
    * invariant (oracle = plain SQL over the source).
    */
  def zorderCompaction(s: SparkSession, d: String): DataFrame = {
    val t = scenario("zorder", d) { loc =>
      val t0 = graft.lake.LakeTable.create(s, loc,
        Right(Tables.orders(s, d).repartition(6)))
      t0.optimize(fileSizeThresholdBytes = 1L << 30,
        clusterBy = Seq("o_custkey", "o_totalprice"),
        targetFileCount = Some(8))
      t0
    }
    t.read(col("o_totalprice") < 20000.0)
      .select(col("o_orderkey").as("orderkey"),
        round(col("o_totalprice"), 2).as("totalprice"))
      .orderBy("orderkey")
  }

  /** Schema evolution with v3 defaults (`sql:166-169`). */
  def schemaEvolution(s: SparkSession, d: String): DataFrame = {
    val t = scenario("schevo", d) { loc =>
      val t0 = LakeTable.create(s, loc,
        Right(customerDf(s, d).filter(col("custkey") < 50)))
      t0.addColumn("phone", org.apache.spark.sql.types.StringType,
        default = Some("+33606060606"))
      t0
    }
    t.read().orderBy("custkey")
  }

  /** DROP COLUMN cycle (`sql:166-190`, E5): add `message`, insert a row
    * carrying it, DROP it, re-ADD a column with the SAME NAME, insert
    * again. The re-added column gets a FRESH field id (ids are never
    * reused across schema versions), so the pre-drop file's `message`
    * bytes must NOT resurface — the classic evolution bug this pins
    * driver-visibly: row 200000 reads NULL, row 200001 reads its value.
    */
  def dropColumnCycle(s: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.types.StringType
    val t = scenario("dropcol", d) { loc =>
      import s.implicits._
      val t0 = LakeTable.create(s, loc,
        Right(customerDf(s, d).filter(col("custkey") < 30)))
      t0.addColumn("message", StringType)
      t0.append(Seq((200000L, "COMMANDER BUN BUN", 1.0, "SQLENGINE",
          """{"company": "Starburst"}"""))
        .toDF("custkey", "name", "account_balance", "mktsegment", "message"))
      t0.dropColumn("message")
      t0.addColumn("message", StringType)
      t0.append(Seq((200001L, "TRINO", 1.0, "SQLENGINE", "fresh"))
        .toDF("custkey", "name", "account_balance", "mktsegment", "message"))
      t0
    }
    t.read().select("custkey", "name", "message").orderBy("custkey")
  }

  /** Partition-spec evolution (`sql:193-209`, E6): CTAS partitioned by
    * mktsegment (spec 0), evolve to ['mktsegment','custkey'] (spec 1) +
    * insert, evolve to ['nation'] (spec 2) + insert. `$partitions` then
    * shows every file generation under ITS OWN spec — per-file spec
    * resolution is the trickiest read-path piece of the lake layer, and
    * this makes it driver-visible. `file_count` is pinned to 1 per
    * partition: each write is repartitioned on its spec's source
    * columns, so one task holds each partition value.
    */
  def specEvolution(s: SparkSession, d: String): DataFrame = {
    val t = scenario("specevo", d) { loc =>
      import s.implicits._
      val src = Tables.customer(s, d)
        .join(broadcast(Tables.nation(s, d)),
          col("c_nationkey") === col("n_nationkey"))
        .filter(col("c_custkey") <= 40)
        .select(col("c_custkey").as("custkey"), col("c_name").as("name"),
          col("c_mktsegment").as("mktsegment"), col("n_name").as("nation"))
      val t0 = LakeTable.create(s, loc,
        Right(src.repartition(col("mktsegment"))),
        partitioning = Seq("mktsegment"))
      t0.setPartitioning(Seq("mktsegment", "custkey"))
      t0.append(Seq((200001L, "TRINO", "SQLENGINE", "FRANCE"))
        .toDF("custkey", "name", "mktsegment", "nation"))
      t0.append(Seq((200002L, "STARBURST", "SQLENGINE", "FRANCE"))
        .toDF("custkey", "name", "mktsegment", "nation"))
      t0.setPartitioning(Seq("nation"))
      t0.append(Seq((200003L, "TRINO", "SQLENGINE", "ITALY"))
        .toDF("custkey", "name", "mktsegment", "nation"))
      t0.append(Seq((200004L, "STARBURST", "SQLENGINE", "SPAIN"))
        .toDF("custkey", "name", "mktsegment", "nation"))
      t0
    }
    t.metaTable("partitions")
      .select("partition", "spec_id", "record_count", "file_count")
      .orderBy("spec_id", "partition")
  }

  /** Filtered OPTIMIZE (`sql:267-268`, M4): compact ONLY files whose
    * `$file_modified_time` falls inside the window — the nightly
    * "compact what today wrote" shape that keeps a 100 TB table's
    * maintenance cost proportional to the day's ingest, not the table.
    * Three old files are backdated 3 days; three recent ones are not;
    * optimize with `mtime > now−2d` must compact the recent three into
    * one and leave the old generation byte-identical. Both file-level
    * observables ride every row next to the invariant content.
    */
  def filteredOptimize(s: SparkSession, d: String): DataFrame = {
    val t = scenario("filtopt", d) { loc =>
      def livePaths(t0: LakeTable): Seq[String] =
        t0.metaTable("files").filter(col("content") === 0)
          .select("file_path").collect().map(_.getString(0)).toSeq
      val cust = customerDf(s, d)
      def slice(lo: Int, hi: Int) =
        cust.filter(col("custkey") >= lo && col("custkey") < hi).coalesce(1)
      val t0 = LakeTable.create(s, loc, Right(slice(0, 20)))
      t0.append(slice(20, 40))
      t0.append(slice(40, 60))
      val oldPaths = livePaths(t0)
      val backdated = java.nio.file.attribute.FileTime.fromMillis(
        System.currentTimeMillis() - 3L * 24 * 3600 * 1000)
      oldPaths.foreach(p => Files.setLastModifiedTime(
        java.nio.file.Paths.get(loc, p), backdated))
      t0.append(slice(60, 80))
      t0.append(slice(80, 100))
      t0.append(slice(100, 120))
      val recent = livePaths(t0).toSet -- oldPaths
      val cutoff = System.currentTimeMillis() - 2L * 24 * 3600 * 1000
      t0.optimize(filePredicate = Some((_, mtime) => mtime > cutoff))
      val after = livePaths(t0).toSet
      t0.setProperties(Map(
        "graft.test.old_untouched" ->
          (oldPaths.toSet.subsetOf(after)).toString,
        "graft.test.recent_compacted" ->
          (recent.intersect(after).isEmpty &&
            (after -- oldPaths).size == 1).toString))
      t0
    }
    t.read()
      .withColumn("old_files_untouched",
        lit(t.properties("graft.test.old_untouched").toBoolean))
      .withColumn("recent_files_compacted",
        lit(t.properties("graft.test.recent_compacted").toBoolean))
      .orderBy("custkey")
  }

  /** Snapshot log shape (rows-only check; deterministic columns). */
  def snapshotLog(s: SparkSession, d: String): DataFrame = {
    val t = scenario("snaplog", d) { loc =>
      val t0 = LakeTable.create(s, loc,
        Right(customerDf(s, d).filter(col("custkey") < 30)),
        properties = Map("merge_mode" -> "merge-on-read"))
      t0.append(customerDf(s, d)
        .filter(col("custkey") >= 30 && col("custkey") < 40))
      t0.update(col("custkey") === 1, Map("name" -> lit("u")))
      t0.delete(col("custkey") === 2)
      t0
    }
    t.metaTable("snapshots")
      .select("snapshot_id", "parent_id", "operation")
      .orderBy("snapshot_id")
  }

  /** Row lineage across UPDATE (`sql:133-135`): ids stable, seq bumps. */
  def rowLineage(s: SparkSession, d: String): DataFrame = {
    val t = scenario("lineage", d) { loc =>
      val t0 = LakeTable.create(s, loc,
        Right(customerDf(s, d).filter(col("custkey") < 20)),
        properties = Map("merge_mode" -> "merge-on-read"))
      t0.update(col("custkey") < 5, Map("account_balance" -> lit(7.0)))
      t0
    }
    t.readWithMetaColumns()
      .select(col("custkey"), col("$row_id").as("row_id"),
        col("$last_updated_sequence_number").as("last_seq"))
      .orderBy("custkey")
  }

  /** Incremental append consumption: rows added by append commits after
    * a base snapshot — the cheap downstream-pipeline path (full
    * row-level diffs incl. deletes → `lake_cdc_changes`).
    */
  def incrementalRead(s: SparkSession, d: String): DataFrame = {
    val t = scenario("increment", d) { loc =>
      val t0 = LakeTable.create(s, loc,
        Right(customerDf(s, d).filter(col("custkey") < 100)))
      t0.setProperties(Map("graft.test.base" ->
        t0.meta.currentSnapshotId.get.toString))
      t0.append(customerDf(s, d)
        .filter(col("custkey") >= 100 && col("custkey") < 150))
      t0.append(customerDf(s, d)
        .filter(col("custkey") >= 150 && col("custkey") < 200))
      t0
    }
    t.readIncremental(t.properties("graft.test.base").toLong)
      .orderBy("custkey")
  }

  /** Catalog + stored view over metadata tables — the script's
    * snapshot-history view (`sql:85-96`), re-planned at read.
    */
  def catalogViewHistory(s: SparkSession, d: String): DataFrame = {
    val t = scenario("catview", d) { loc =>
      val cat = new graft.lake.LakeCatalog(s,
        java.nio.file.Files.createTempDirectory("catq-").toString)
      cat.createSchema("demo")
      val t0 = cat.createTable("demo.vcust",
        customerDf(s, d).filter(col("custkey") < 50))
      t0.append(customerDf(s, d)
        .filter(col("custkey") >= 50 && col("custkey") < 80))
      cat.createView("v_hist",
        """SELECT s.snapshot_id, s.operation, h.is_current_ancestor
           FROM vcust_snapshots s
           JOIN vcust_history h ON s.snapshot_id = h.snapshot_id""")
      t0.setProperties(Map("graft.test.cat" -> cat.warehouse))
      t0
    }
    val cat = new graft.lake.LakeCatalog(s, t.properties("graft.test.cat"))
    cat.readView("v_hist").orderBy("snapshot_id")
  }

  /** The federation aggregate (`sql:286-295`) through the PUBLIC SQL
    * entry point: TPC-H inputs CTAS'd into catalog-managed lake tables
    * once, then `catalog.sql(...)` plans the reference's SELECT text
    * (bare table names) over their current snapshots. Oracled against
    * the same SQL in DuckDB — and it must hash-match `q_federation_agg`,
    * proving the SQL surface and the DataFrame surface agree.
    */
  def sqlFederation(s: SparkSession, d: String): DataFrame = {
    val t = scenario("sqlfed", d) { loc =>
      val cat = new graft.lake.LakeCatalog(s,
        java.nio.file.Files.createTempDirectory("sqlfed-").toString)
      cat.createSchema("tpch")
      cat.createTable("tpch.nation", Tables.nation(s, d))
      cat.createTable("tpch.orders", Tables.orders(s, d))
      val t0 = cat.createTable("tpch.customer", Tables.customer(s, d))
      t0.setProperties(Map("graft.test.cat" -> cat.warehouse))
      t0
    }
    val cat = new graft.lake.LakeCatalog(s, t.properties("graft.test.cat"))
    cat.sql(
      """SELECT n_name AS nation, round(sum(o_totalprice), 2) AS total_price
         FROM customer JOIN nation ON c_nationkey = n_nationkey
         JOIN orders ON o_custkey = c_custkey
         GROUP BY n_name ORDER BY total_price, nation""")
  }

  /** Write-audit-publish: the branch workflow production lake pipelines
    * run around every batch load. Stage on an isolated branch, validate
    * the STAGED table state (not just the batch — audit sees the merge
    * of new data with history), fast-forward main only if the audit
    * passes, tag the published state. A second, poisoned batch fails
    * its audit and is rolled back — main must never see it. The final
    * main state is the oracle; readers during the whole flow only ever
    * saw published snapshots.
    */
  private def wapScenario(s: SparkSession, d: String): graft.lake.LakeTable =
    scenario("wap", d) { loc =>
      val t0 = LakeTable.create(s, loc,
        Right(customerDf(s, d).filter(col("custkey") <= 1000)))
      // round 1: stage a clean batch → audit passes → publish + tag
      t0.createBranch("audit")
      t0.append(customerDf(s, d)
        .filter(col("custkey") > 1000 && col("custkey") <= 1200),
        branch = "audit")
      val staged = t0.readRef("audit")
      val bad = staged.filter(col("custkey").isNull ||
        col("name").isNull).count()
      require(bad == 0, s"audit failed: $bad invalid staged rows")
      t0.fastForward("main", "audit")
      t0.createTag("published-v1", t0.meta.refs("main").snapshotId)
      // round 2: a poisoned batch fails the audit → roll the audit
      // branch back to main's head; main is untouched by construction.
      // (The batch re-stages existing keys with a nulled column —
      // non-empty at every SF; it never survives to main anyway.)
      t0.append(customerDf(s, d)
        .filter(col("custkey") < 50)
        .withColumn("name", lit(null).cast("string")),
        branch = "audit")
      val bad2 = t0.readRef("audit").filter(col("name").isNull).count()
      require(bad2 > 0, "poisoned batch should fail its audit")
      t0.rollback(t0.meta.refs("main").snapshotId, branch = "audit")
      t0
    }

  def wapPublish(s: SparkSession, d: String): DataFrame =
    wapScenario(s, d).read().orderBy("custkey")

  /** ANALYZE + SHOW STATS (`sql:48-49`) as an oracled lifecycle: exact
    * NDV mode, so DuckDB aggregates over the same slice reproduce every
    * stat cell (HLL estimates are engine-specific; the approx default
    * stays the 100 TB route, exercised in LakeLifecycleSpec).
    */
  def statsShow(s: SparkSession, d: String): DataFrame = {
    val t = scenario("stats", d) { loc =>
      val t0 = LakeTable.create(s, loc,
        Right(customerDf(s, d).filter(col("custkey") < 200)))
      t0.analyze(exactNdv = true)
      t0
    }
    t.showStats().orderBy(asc_nulls_last("column_name"))
  }

  /** MATERIALIZED VIEW + REFRESH (`sql:57-61`) as an oracled lifecycle:
    * materialize an aggregate over half the orders, append the other
    * half (mview must keep serving the STALE materialization — asserted
    * in-scenario), REFRESH, read the fresh state. The oracle is the
    * aggregate over ALL orders — matching proves both that refresh
    * re-ran the stored SQL over the appended table and that reads come
    * from the materialized lake table, not a live re-plan.
    */
  def mviewRefresh(s: SparkSession, d: String): DataFrame = {
    val t = scenario("mview", d) { loc =>
      val cat = new graft.lake.LakeCatalog(s,
        java.nio.file.Files.createTempDirectory("mvq-").toString)
      cat.createSchema("demo")
      val ord = Tables.orders(s, d)
        .select(col("o_orderkey"), col("o_custkey"), col("o_totalprice"))
      val t0 = cat.createTable("demo.morders",
        ord.filter(col("o_orderkey") % 2 === 0))
      cat.createMaterializedView("mv_cust_totals",
        """SELECT o_custkey AS custkey, round(sum(o_totalprice), 2) AS total
           FROM morders GROUP BY o_custkey""")
      t0.append(ord.filter(col("o_orderkey") % 2 === 1))
      val stale = cat.readView("mv_cust_totals")
        .agg(sum(col("total"))).head().getDouble(0)
      cat.refreshMaterializedView("mv_cust_totals")
      val fresh = cat.readView("mv_cust_totals")
        .agg(sum(col("total"))).head().getDouble(0)
      require(stale < fresh,
        "mview must serve the materialized (stale) state until REFRESH")
      t0.setProperties(Map("graft.test.cat" -> cat.warehouse))
      t0
    }
    val cat = new graft.lake.LakeCatalog(s, t.properties("graft.test.cat"))
    cat.readView("mv_cust_totals").orderBy("custkey")
  }

  /** INCREMENTALLY-maintained materialized aggregate
    * ([[graft.lake.IncrementalMv]]): materialize over half the orders,
    * append the rest in two commits, refresh — the refresh must take
    * the INCREMENTAL path (asserted in-scenario: mode string + the MV
    * state advancing by one append commit, no rebuild) — then compact.
    * The oracle is the aggregate over ALL orders: matching proves
    * delta-partials + per-key summing ≡ a full recompute.
    */
  def mviewIncremental(s: SparkSession, d: String): DataFrame = {
    val t = scenario("mvinc", d) { loc =>
      val ord = Tables.orders(s, d)
        .select(col("o_orderkey"), col("o_custkey"), col("o_totalprice"))
      val src = LakeTable.create(s, loc,
        Right(ord.filter(col("o_orderkey") % 2 === 0)))
      val mvLoc = loc + "_mv"
      graft.lake.IncrementalMv.create(s, mvLoc, src,
        groupCols = Seq("o_custkey"), sumCols = Seq("o_totalprice"))
      src.append(ord.filter(col("o_orderkey") % 4 === 1))
      src.append(ord.filter(col("o_orderkey") % 4 === 3))
      val mode = graft.lake.IncrementalMv.refresh(s, mvLoc)
      require(mode == "incremental",
        s"append-only range must refresh incrementally, got $mode")
      require(LakeTable.forLocation(s, mvLoc).meta.snapshots
        .count(_.operation == "append") == 2,
        "incremental refresh must be ONE state append, not a rebuild")
      graft.lake.IncrementalMv.compact(s, mvLoc)
      src.setProperties(Map("graft.test.mv" -> mvLoc))
      src
    }
    graft.lake.IncrementalMv.read(s, t.properties("graft.test.mv"))
      .select(col("o_custkey").as("custkey"),
        col("n_rows").as("n_orders"),
        round(col("sum_o_totalprice"), 2).as("total"))
      .orderBy("custkey")
  }

  /** CALL system.register_table (`sql:276-281`): adopt an existing lake
    * directory into a catalog under a new name — metadata pointer only,
    * no data rewrite — then read through the catalog path.
    */
  def registerRead(s: SparkSession, d: String): DataFrame = {
    val t = scenario("register", d) { loc =>
      val t0 = LakeTable.create(s, loc,
        Right(customerDf(s, d).filter(col("custkey") < 120)))
      val cat = new graft.lake.LakeCatalog(s,
        java.nio.file.Files.createTempDirectory("regq-").toString)
      cat.createSchema("adopted")
      cat.registerTable("adopted.customer", loc)
      t0.setProperties(Map("graft.test.cat" -> cat.warehouse))
      t0
    }
    val cat = new graft.lake.LakeCatalog(s, t.properties("graft.test.cat"))
    cat.table("adopted.customer").read().orderBy("custkey")
  }

  /** SHOW CREATE TABLE (`sql:42`) as an oracled render: the DDL of a
    * catalog table carrying partitioning + a table property, split into
    * numbered lines. The oracle is the expected DDL as a literal — the
    * render must be byte-stable (column types, partition-transform
    * spelling, property order), which is exactly the contract a SHOW
    * CREATE surface makes with scripts that parse it.
    */
  def showCreateDdl(s: SparkSession, d: String): DataFrame = {
    val t = scenario("showcreate", d) { loc =>
      val cat = new graft.lake.LakeCatalog(s,
        Files.createTempDirectory("ddlq-").toString)
      cat.createSchema("demo")
      val t0 = cat.createTable("demo.customer_ddl",
        customerDf(s, d).filter(col("custkey") < 50),
        partitioning = Seq("mktsegment"),
        properties = Map("merge_mode" -> "merge-on-read"))
      t0.setProperties(Map("graft.test.cat" -> cat.warehouse))
      t0
    }
    val cat = new graft.lake.LakeCatalog(s, t.properties("graft.test.cat"))
    val lines = cat.showCreateTable("demo.customer_ddl").split("\n")
    import s.implicits._
    lines.toSeq.zipWithIndex.map { case (l, i) => (i + 1, l) }
      .toDF("line_no", "line").orderBy("line_no")
  }

  /** SHOW CREATE SCHEMA (`sql:6-9`) as an oracled render. The schema
    * lives at its DEFAULT location inside a per-run temp warehouse (no
    * world-shared path, no cross-run collisions); the one
    * nondeterministic token — the warehouse prefix — is replaced by a
    * stable `<warehouse>` placeholder so the rendered DDL stays a
    * byte-stable oracle literal. Cached through the scenario map like
    * every other catalog scenario, so repeated calls share one
    * warehouse instead of leaking a temp dir each.
    */
  def showCreateSchemaDdl(s: SparkSession, d: String): DataFrame = {
    val t = scenario("showcreateschema", d) { loc =>
      val cat = new graft.lake.LakeCatalog(s,
        Files.createTempDirectory("ddlsq-").toString)
      cat.createSchema("demo_fixed")
      val t0 = cat.createTable("demo_fixed.anchor",
        customerDf(s, d).filter(col("custkey") < 5))
      t0.setProperties(Map("graft.test.cat" -> cat.warehouse))
      t0
    }
    val cat = new graft.lake.LakeCatalog(s, t.properties("graft.test.cat"))
    val lines = cat.showCreateSchema("demo_fixed")
      .replace(cat.warehouse, "<warehouse>").split("\n")
    import s.implicits._
    lines.toSeq.zipWithIndex.map { case (l, i) => (i + 1, l) }
      .toDF("line_no", "line").orderBy("line_no")
  }

  /** Parquet bloom filters via the `bloom_filter_columns` table property
    * as an oracled scenario: a table over orders with a bloom on the
    * high-cardinality orderkey, appended twice (several data files),
    * then point lookups served through the scan path — where parquet's
    * row-group filter consults the bloom BELOW min/max pruning (an
    * equality probe on a scattered key defeats min/max; the bloom
    * answers membership per row group). The footer observable rides
    * every output row: true iff ALL data files carry the bloom for
    * orderkey and NONE pays the footprint for the unlisted totalprice.
    */
  def bloomPointLookup(s: SparkSession, d: String): DataFrame = {
    val t = scenario("bloom", d) { loc =>
      val ord = Tables.orders(s, d).select(
        col("o_orderkey").as("orderkey"), col("o_custkey").as("custkey"),
        round(col("o_totalprice"), 2).as("totalprice"))
      val t0 = LakeTable.create(s, loc,
        Right(ord.filter(col("orderkey") % 3 === 0)),
        properties = Map("bloom_filter_columns" -> "orderkey"))
      t0.append(ord.filter(col("orderkey") % 3 === 1))
      t0.append(ord.filter(col("orderkey") % 3 === 2))
      t0
    }
    import org.apache.parquet.hadoop.ParquetFileReader
    import org.apache.parquet.hadoop.util.HadoopInputFile
    import org.apache.hadoop.fs.{Path => HPath}
    import scala.jdk.CollectionConverters._
    val conf = s.sessionState.newHadoopConf()
    val dataFiles = java.nio.file.Files.list(
      java.nio.file.Paths.get(t.location, "data")).iterator().asScala
      .filter(_.toString.endsWith(".parquet")).toSeq
    val allBloomed = dataFiles.nonEmpty && dataFiles.forall { p =>
      val r = ParquetFileReader.open(
        HadoopInputFile.fromPath(new HPath(p.toString), conf))
      try r.getFooter.getBlocks.asScala.forall { b =>
        val cols = b.getColumns.asScala
        cols.find(_.getPath.toDotString == "orderkey")
          .exists(_.getBloomFilterOffset >= 0) &&
        cols.find(_.getPath.toDotString == "totalprice")
          .exists(_.getBloomFilterOffset < 0)
      } finally r.close()
    }
    t.read(col("orderkey")
        .isin(1L, 7L, 32L, 33L, 34L, 35L, 36L, 37L, 38L, 39L))
      .withColumn("bloom_on_all_files", lit(allBloomed))
      .orderBy("orderkey")
  }

  /** Tag read — `FOR VERSION AS OF 'published-v1'`: the immutable named
    * snapshot the WAP flow published. Same oracle as main (the tag IS
    * the published state), but through the ref-resolution scan path.
    */
  def tagRead(s: SparkSession, d: String): DataFrame =
    wapScenario(s, d).readRef("published-v1").orderBy("custkey")

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_sql_federation"     -> sqlFederation _,
    "lake_wap_publish"     -> wapPublish _,
    "lake_tag_read"        -> tagRead _,
    "lake_catalog_view"    -> catalogViewHistory _,
    "lake_ctas_select"     -> ctasSelect _,
    "lake_mor_update"      -> morUpdate _,
    "lake_mor_delete"      -> morDelete _,
    "lake_equality_delete" -> equalityDelete _,
    "lake_cow_dml"         -> cowDml _,
    "lake_merge_upsert"    -> mergeUpsert _,
    "lake_time_travel"     -> timeTravel _,
    "lake_branch_main"     -> branchMain _,
    "lake_branch_dev"      -> branchDev _,
    "lake_cdc_changes"     -> cdcChanges _,
    "lake_branch_diff"     -> lakeBranchDiff _,
    "lake_drift_psi"       -> lakeDriftPsi _,
    "lake_corpus_diff"     -> lakeCorpusDiff _,
    "lake_incremental_read" -> incrementalRead _,
    "lake_optimize_invariance" -> optimizeInvariance _,
    "lake_zorder_compaction" -> zorderCompaction _,
    "lake_pruned_scan"     -> prunedScan _,
    "lake_schema_evolution" -> schemaEvolution _,
    "lake_drop_column"     -> dropColumnCycle _,
    "lake_spec_evolution"  -> specEvolution _,
    "lake_filtered_optimize" -> filteredOptimize _,
    "lake_snapshot_log"    -> snapshotLog _,
    "lake_row_lineage"     -> rowLineage _,
    "lake_stats"           -> statsShow _,
    "lake_register"        -> registerRead _,
    "lake_mview_refresh"   -> mviewRefresh _,
    "lake_mview_incremental" -> mviewIncremental _,
    "lake_maintenance"     -> maintenanceInvariance _,
    "lake_show_create"     -> showCreateDdl _,
    "lake_show_create_schema" -> showCreateSchemaDdl _,
    "lake_bloom_pruning"   -> bloomPointLookup _
  )

  /** Oracles express the *final state* of each lifecycle in ANSI SQL over
    * the source parquet — DuckDB never sees the lake machinery, so a
    * match proves write+read round-trip semantics, not shared code.
    */
  val oracleSql: Map[String, String] = Map(
    "q_sql_federation" ->
      """SELECT n_name AS nation, round(sum(o_totalprice), 2) AS total_price
         FROM customer JOIN nation ON c_nationkey = n_nationkey
         JOIN orders ON o_custkey = c_custkey
         GROUP BY n_name ORDER BY total_price, nation""",
    "lake_ctas_select" ->
      """SELECT c_custkey AS custkey, c_name AS name,
                c_mktsegment AS mktsegment, n_name AS nation
         FROM customer JOIN nation ON c_nationkey = n_nationkey
         JOIN region ON n_regionkey = r_regionkey
         WHERE r_name = 'EUROPE' ORDER BY custkey""",
    // main = base + the one audited-clean batch; the poisoned batch
    // (custkey < 50 re-staged with a nulled name) must be invisible
    "lake_wap_publish" ->
      """SELECT c_custkey AS custkey, c_name AS name,
                c_acctbal AS account_balance, c_mktsegment AS mktsegment
         FROM customer WHERE c_custkey <= 1200 ORDER BY custkey""",
    "lake_tag_read" ->
      """SELECT c_custkey AS custkey, c_name AS name,
                c_acctbal AS account_balance, c_mktsegment AS mktsegment
         FROM customer WHERE c_custkey <= 1200 ORDER BY custkey""",
    "lake_mor_update" ->
      """SELECT c_custkey AS custkey, c_name AS name,
                CASE WHEN c_custkey < 10 THEN 1000.0 ELSE c_acctbal END
                  AS account_balance,
                c_mktsegment AS mktsegment
         FROM customer ORDER BY custkey""",
    "lake_mor_delete" ->
      """SELECT c_custkey AS custkey, c_name AS name,
                c_acctbal AS account_balance, c_mktsegment AS mktsegment
         FROM customer WHERE c_custkey % 10 <> 0 ORDER BY custkey""",
    // survivors = keys not deleted, plus the re-appended half of the
    // deleted keys (identical values, later sequence → immune)
    "lake_equality_delete" ->
      """SELECT c_custkey AS custkey, c_name AS name,
                c_acctbal AS account_balance, c_mktsegment AS mktsegment
         FROM customer WHERE c_custkey % 7 <> 0 OR c_custkey % 14 = 0
         ORDER BY custkey""",
    "lake_cow_dml" ->
      """SELECT c_custkey AS custkey, c_name AS name,
                CASE WHEN c_custkey < 10 THEN 1000.0 ELSE c_acctbal END
                  AS account_balance,
                c_mktsegment AS mktsegment
         FROM customer WHERE c_custkey % 10 <> 0 ORDER BY custkey""",
    "lake_merge_upsert" ->
      """SELECT c_custkey AS custkey,
                CASE WHEN c_custkey >= 50 THEN 'M-' || c_name ELSE c_name END
                  AS name,
                CASE WHEN c_custkey >= 50 THEN c_acctbal + 5.0 ELSE c_acctbal
                  END AS account_balance,
                c_mktsegment AS mktsegment
         FROM customer WHERE c_custkey < 150 ORDER BY custkey""",
    "lake_time_travel" ->
      """SELECT c_custkey AS custkey, c_name AS name,
                c_acctbal AS account_balance, c_mktsegment AS mktsegment
         FROM customer WHERE c_custkey < 100 ORDER BY custkey""",
    "lake_branch_main" ->
      """SELECT c_custkey AS custkey, c_name AS name,
                c_acctbal AS account_balance, c_mktsegment AS mktsegment
         FROM customer WHERE c_custkey < 100 ORDER BY custkey""",
    "lake_branch_dev" ->
      """SELECT c_custkey AS custkey, c_name AS name,
                c_acctbal AS account_balance, c_mktsegment AS mktsegment
         FROM customer WHERE c_custkey >= 5 AND c_custkey < 110
         ORDER BY custkey""",
    "lake_cdc_changes" ->
      """SELECT * FROM (
           SELECT 'insert' AS change_type, c_custkey AS custkey
           FROM customer WHERE c_custkey >= 100 AND c_custkey < 150
           UNION ALL
           SELECT 'delete' AS change_type, c_custkey AS custkey
           FROM customer WHERE c_custkey < 150 AND c_custkey % 7 = 0
         ) ORDER BY change_type, custkey""",
    // The branch states replayed as predicates (main = custkey<100;
    // dev = that plus the [100,110) append minus the <5 delete), then
    // the same full-outer classification.
    "lake_branch_diff" ->
      """WITH m AS (SELECT c_custkey AS custkey FROM customer
                    WHERE c_custkey < 100),
         dv AS (SELECT c_custkey AS custkey FROM customer
                WHERE c_custkey < 110 AND c_custkey >= 5)
         SELECT COALESCE(m.custkey, dv.custkey) AS custkey,
                CASE WHEN m.custkey IS NOT NULL AND dv.custkey IS NOT NULL
                       THEN 'both'
                     WHEN dv.custkey IS NOT NULL THEN 'dev_only'
                     ELSE 'main_only' END AS status
         FROM m FULL OUTER JOIN dv ON m.custkey = dv.custkey
         ORDER BY custkey""",
    // The parity replay of the scenario (even docs = the baseline
    // snapshot, odd docs = the CDC insert delta) fed through the
    // text_drift_psi CTE chain — same capped sample, integer decile
    // edges, add-one smoothing, and operand-for-operand ln term.
    "lake_drift_psi" ->
      """WITH t AS (
           SELECT doc_id, doc_id % 2 = 0 AS isref,
                  CAST(len(string_split_regex(trim(text), '\s+'))
                    AS BIGINT) AS nt
           FROM documents),
         samp AS (SELECT doc_id, nt FROM t
                  WHERE isref AND doc_id % 10 = 0 AND nt IS NOT NULL
                  ORDER BY doc_id LIMIT 1000),
         sn AS (SELECT count(*) AS n FROM samp),
         sv AS (SELECT nt, row_number() OVER (ORDER BY nt) AS rk
                FROM samp),
         cuts AS (SELECT CAST(q.q AS INT) AS bin, sv.nt AS v
                  FROM (SELECT unnest(range(1, 10)) AS q) q, sn, sv
                  WHERE sv.rk = (q.q * sn.n + 9) // 10),
         b AS (SELECT t.doc_id, t.isref,
                      CAST(count(c.v) AS INT) AS bin
               FROM t LEFT JOIN cuts c ON c.v <= t.nt
               GROUP BY t.doc_id, t.isref),
         g AS (SELECT bin,
                      count(*) FILTER (WHERE isref) AS ref_n,
                      count(*) FILTER (WHERE NOT isref) AS cur_n
               FROM b GROUP BY bin),
         tot AS (SELECT CAST(sum(ref_n) AS DOUBLE) AS rt,
                        CAST(sum(cur_n) AS DOUBLE) AS ct FROM g),
         bins AS (SELECT CAST(unnest(range(0, 10)) AS INT) AS bin),
         g2 AS (SELECT bins.bin,
                       coalesce(g.ref_n, 0) AS ref_n,
                       coalesce(g.cur_n, 0) AS cur_n
                FROM bins LEFT JOIN g ON g.bin = bins.bin)
         SELECT g2.bin, c.v AS lo_tokens, g2.ref_n, g2.cur_n,
                round((g2.ref_n + 1.0) / (tot.rt + 10.0), 6) AS p_ref,
                round((g2.cur_n + 1.0) / (tot.ct + 10.0), 6) AS p_cur,
                round(((g2.cur_n + 1.0) / (tot.ct + 10.0) -
                       (g2.ref_n + 1.0) / (tot.rt + 10.0)) *
                      ln(((g2.cur_n + 1.0) / (tot.ct + 10.0)) /
                         ((g2.ref_n + 1.0) / (tot.rt + 10.0))), 6)
                  AS psi_bin
         FROM g2 CROSS JOIN tot LEFT JOIN cuts c ON c.bin = g2.bin
         ORDER BY g2.bin""",
    // The parity replay of the corpus-diff scenario fed through the
    // sketch_corpus_diff CTE chain: before = the full corpus (baseline
    // ∪ insert delta = all documents), after (keep) = the even-id
    // baseline snapshot. Every axis is the deterministic house sketch,
    // so the single report row hash-checks.
    "lake_corpus_diff" ->
      ("""WITH base AS (SELECT doc_id % 2 = 0 AS keep,
                  string_split_regex(trim(lower(text)), '\s+') AS words
                FROM documents),
         """ + PipelineQueries.CorpusDiffChainCtes + """
         SELECT cnt.n_docs_before AS n_docs,
                cnt.n_docs_after AS n_docs_base,
                cnt.n_tokens_before AS n_tokens,
                cnt.n_tokens_after AS n_tokens_base,
                ev.est_vocab_before AS est_vocab,
                ev.est_vocab_after AS est_vocab_base,
                jac.est_jaccard AS est_base_resemblance,
                mass.top20_mass_before AS top20_mass,
                mass.top20_mass_after AS top20_mass_base
         FROM cnt, ev, jac, mass"""),
    "lake_optimize_invariance" ->
      """SELECT c_custkey AS custkey, c_name AS name,
                c_acctbal AS account_balance, c_mktsegment AS mktsegment
         FROM customer WHERE c_custkey < 80 AND c_custkey % 9 <> 0
         ORDER BY custkey""",
    "lake_zorder_compaction" ->
      """SELECT o_orderkey AS orderkey, round(o_totalprice, 2) AS totalprice
         FROM orders WHERE o_totalprice < 20000.0 ORDER BY orderkey""",
    "lake_pruned_scan" ->
      """SELECT o_orderkey AS orderkey, CAST(o_orderdate AS DATE) AS order_date,
                o_totalprice AS totalprice
         FROM orders
         WHERE o_orderdate >= TIMESTAMP '1997-01-01'
           AND o_orderdate <  TIMESTAMP '1998-01-01'
         ORDER BY orderkey""",
    "lake_schema_evolution" ->
      """SELECT c_custkey AS custkey, c_name AS name,
                c_acctbal AS account_balance, c_mktsegment AS mktsegment,
                '+33606060606' AS phone
         FROM customer WHERE c_custkey < 50 ORDER BY custkey""",
    // Field-id stability: the pre-drop file's message bytes must NOT
    // resurface under the re-added same-name column (fresh field id) —
    // row 200000 reads NULL, only post-re-add row 200001 has a value.
    "lake_drop_column" ->
      """SELECT custkey, name, message FROM (
           SELECT c_custkey AS custkey, c_name AS name,
                  CAST(NULL AS VARCHAR) AS message
           FROM customer WHERE c_custkey < 30
           UNION ALL
           SELECT * FROM (VALUES
             (200000, 'COMMANDER BUN BUN', CAST(NULL AS VARCHAR)),
             (200001, 'TRINO', 'fresh')) AS t(custkey, name, message)
         ) ORDER BY custkey""",
    // Each write generation appears under ITS OWN spec: the CTAS slice
    // under spec 0 (per-mktsegment counts recomputed from the source),
    // the two spec-1 inserts under (mktsegment, custkey) tuples, the
    // two spec-2 inserts under nation. file_count pinned to 1 by the
    // scenario's per-spec repartitioning.
    "lake_spec_evolution" ->
      """SELECT * FROM (
           SELECT '{mktsegment=' || c_mktsegment || '}' AS partition,
                  0 AS spec_id, count(*) AS record_count, 1 AS file_count
           FROM customer WHERE c_custkey <= 40 GROUP BY c_mktsegment
           UNION ALL
           SELECT * FROM (VALUES
             ('{mktsegment=SQLENGINE, custkey=200001}', 1, 1, 1),
             ('{mktsegment=SQLENGINE, custkey=200002}', 1, 1, 1),
             ('{nation=ITALY}', 2, 1, 1),
             ('{nation=SPAIN}', 2, 1, 1))
             AS t(partition, spec_id, record_count, file_count)
         ) ORDER BY spec_id, partition""",
    // Content invariant under the filtered compaction, plus the two
    // file-level observables computed in-scenario from `$files`: the
    // backdated generation's files survive untouched, the recent
    // generation collapsed to one file.
    "lake_filtered_optimize" ->
      """SELECT c_custkey AS custkey, c_name AS name,
                c_acctbal AS account_balance, c_mktsegment AS mktsegment,
                TRUE AS old_files_untouched, TRUE AS recent_files_compacted
         FROM customer WHERE c_custkey < 120 ORDER BY custkey""",
    "lake_incremental_read" ->
      """SELECT c_custkey AS custkey, c_name AS name,
                c_acctbal AS account_balance, c_mktsegment AS mktsegment
         FROM customer WHERE c_custkey >= 100 AND c_custkey < 200
         ORDER BY custkey""",
    // The scenario's commit sequence is fully deterministic (ids are a
    // monotone counter): create+append, append, update, delete.
    "lake_snapshot_log" ->
      """SELECT CAST(snapshot_id AS BIGINT) AS snapshot_id,
                CAST(parent_id AS BIGINT) AS parent_id, operation
         FROM (VALUES (1, NULL, 'append'), (2, 1, 'append'),
                      (3, 2, 'overwrite'), (4, 3, 'delete'))
           AS t(snapshot_id, parent_id, operation)
         ORDER BY snapshot_id""",
    "lake_catalog_view" ->
      """SELECT CAST(snapshot_id AS BIGINT) AS snapshot_id, operation,
                is_current_ancestor
         FROM (VALUES (1, 'append', true), (2, 'append', true))
           AS t(snapshot_id, operation, is_current_ancestor)
         ORDER BY snapshot_id""",
    // Every SHOW STATS cell recomputed from the same slice: NDV exact
    // (the scenario runs ANALYZE in exact mode), data_size = 8·rows for
    // fixed-width types / Σlength for strings, min/max rendered as
    // strings (both engines print shortest-round-trip doubles).
    "lake_stats" ->
      """WITH src AS (SELECT c_custkey AS custkey, c_name AS name,
                             c_acctbal AS account_balance,
                             c_mktsegment AS mktsegment
                      FROM customer WHERE c_custkey < 200),
              n AS (SELECT count(*) AS rc FROM src)
         SELECT * FROM (
           SELECT 'custkey' AS column_name,
                  CAST(8 * n.rc AS DOUBLE) AS data_size,
                  (SELECT CAST(count(DISTINCT custkey) AS DOUBLE) FROM src)
                    AS distinct_values_count,
                  (SELECT CAST(count(*) FILTER (WHERE custkey IS NULL)
                     AS DOUBLE) FROM src) / n.rc AS nulls_fraction,
                  CAST(NULL AS BIGINT) AS row_count,
                  (SELECT CAST(min(custkey) AS VARCHAR) FROM src)
                    AS low_value,
                  (SELECT CAST(max(custkey) AS VARCHAR) FROM src)
                    AS high_value
           FROM n
           UNION ALL
           SELECT 'account_balance', CAST(8 * n.rc AS DOUBLE),
                  (SELECT CAST(count(DISTINCT account_balance) AS DOUBLE)
                     FROM src),
                  (SELECT CAST(count(*) FILTER
                     (WHERE account_balance IS NULL) AS DOUBLE) FROM src)
                    / n.rc,
                  NULL,
                  (SELECT CAST(min(account_balance) AS VARCHAR) FROM src),
                  (SELECT CAST(max(account_balance) AS VARCHAR) FROM src)
           FROM n
           UNION ALL
           SELECT 'name',
                  (SELECT CAST(sum(length(name)) AS DOUBLE) FROM src),
                  (SELECT CAST(count(DISTINCT name) AS DOUBLE) FROM src),
                  (SELECT CAST(count(*) FILTER (WHERE name IS NULL)
                     AS DOUBLE) FROM src) / n.rc,
                  NULL,
                  (SELECT min(name) FROM src),
                  (SELECT max(name) FROM src)
           FROM n
           UNION ALL
           SELECT 'mktsegment',
                  (SELECT CAST(sum(length(mktsegment)) AS DOUBLE) FROM src),
                  (SELECT CAST(count(DISTINCT mktsegment) AS DOUBLE)
                     FROM src),
                  (SELECT CAST(count(*) FILTER (WHERE mktsegment IS NULL)
                     AS DOUBLE) FROM src) / n.rc,
                  NULL,
                  (SELECT min(mktsegment) FROM src),
                  (SELECT max(mktsegment) FROM src)
           FROM n
           UNION ALL
           SELECT NULL, NULL, NULL, NULL, n.rc, NULL, NULL FROM n
         ) ORDER BY column_name NULLS LAST""",
    // current state after expire+orphan-sweep = the DML replay; history
    // loss must never leak into the head
    "lake_maintenance" ->
      """SELECT c_custkey AS custkey, c_name AS name,
                CASE WHEN c_custkey < 10 THEN 250.0 ELSE c_acctbal END
                  AS account_balance,
                c_mktsegment AS mktsegment
         FROM customer WHERE c_custkey < 120 AND c_custkey % 11 <> 0
         ORDER BY custkey""",
    // delta-partial maintenance must equal the full aggregate
    "lake_mview_incremental" ->
      """SELECT o_custkey AS custkey, count(*) AS n_orders,
                round(sum(o_totalprice), 2) AS total
         FROM orders GROUP BY custkey ORDER BY custkey""",
    // post-refresh mview state = the stored aggregate over ALL orders
    "lake_mview_refresh" ->
      """SELECT o_custkey AS custkey, round(sum(o_totalprice), 2) AS total
         FROM orders GROUP BY o_custkey ORDER BY custkey""",
    // register_table is a metadata pointer — the read-back must be the
    // source slice, byte for byte
    "lake_register" ->
      """SELECT c_custkey AS custkey, c_name AS name,
                c_acctbal AS account_balance, c_mktsegment AS mktsegment
         FROM customer WHERE c_custkey < 120 ORDER BY custkey""",
    // Row ids are assigned in file order (customer.parquet is custkey-
    // ordered, keys from 0), so lineage is a pure function of custkey;
    // the custkey<5 UPDATE bumps those rows to sequence 2.
    "lake_row_lineage" ->
      """SELECT c_custkey AS custkey, CAST(c_custkey AS BIGINT) AS row_id,
                CAST(CASE WHEN c_custkey < 5 THEN 2 ELSE 1 END AS BIGINT)
                  AS last_seq
         FROM customer WHERE c_custkey < 20 ORDER BY custkey""",
    // SHOW CREATE render vs the DDL a user must be able to parse,
    // literal line by literal line (quotes doubled for SQL escaping)
    "lake_show_create" ->
      """SELECT * FROM (VALUES
           (1, 'CREATE TABLE demo.customer_ddl ('),
           (2, '   custkey bigint,'),
           (3, '   name string,'),
           (4, '   account_balance double,'),
           (5, '   mktsegment string'),
           (6, ')'),
           (7, 'WITH ('),
           (8, '   format = ''PARQUET'','),
           (9, '   format_version = 3,'),
           (10, '   partitioning = ARRAY[''mktsegment''],'),
           (11, '   merge_mode = ''merge-on-read'''),
           (12, ')')
         ) AS t(line_no, line) ORDER BY line_no""",
    "lake_show_create_schema" ->
      """SELECT * FROM (VALUES
           (1, 'CREATE SCHEMA demo_fixed'),
           (2, 'WITH ('),
           (3, '   location = ''<warehouse>/demo_fixed'''),
           (4, ')')
         ) AS t(line_no, line) ORDER BY line_no""",
    // Point lookups through the bloom-filtered scan = the same rows from
    // the source table; the footer observable (every data file blooms
    // the listed column, none the unlisted one) rides as a literal TRUE.
    "lake_bloom_pruning" ->
      """SELECT o_orderkey AS orderkey, o_custkey AS custkey,
                round(o_totalprice, 2) AS totalprice,
                TRUE AS bloom_on_all_files
         FROM orders
         WHERE o_orderkey IN (1, 7, 32, 33, 34, 35, 36, 37, 38, 39)
         ORDER BY orderkey"""
  )
}
