package graft.lake

import java.nio.file.Files
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark
import graft.functions.TrinoFunctions

/** The reference script replayed end to end, in order, against our
  * engine — every intermediate SELECT of
  * `iceberg_trino_sqldemo.sql:1-296` becomes an assertion. One stateful
  * sequence, exactly like the demo: the snapshot history built by early
  * statements is what the later time-travel/branching statements
  * depend on.
  */
class ScriptReplaySpec extends AnyFunSuite {
  import TestSpark._
  private lazy val s = spark

  test("iceberg_trino_sqldemo.sql full replay") {
    import s.implicits._
    val wh = Files.createTempDirectory("script-replay-").toString
    val cat = new LakeCatalog(s, wh)

    // sql:6-9 — CREATE SCHEMA + SHOW CREATE SCHEMA
    cat.createSchema("victorc_iceberg")
    assert(cat.showCreateSchema("victorc_iceberg")
      .contains("CREATE SCHEMA victorc_iceberg"))

    // sql:11 — CTAS nation
    val nationSrc = s.read.parquet(s"$sf/nation.parquet")
    cat.createTable("victorc_iceberg.nation", nationSrc, replace = true)
    assert(cat.table("victorc_iceberg.nation").read().count() == 25)

    // sql:13 — CTAS orders partitioned by year(orderdate)
    val ordersSrc = s.read.parquet(s"$sf/orders.parquet")
    val ordersT = cat.createTable("victorc_iceberg.orders", ordersSrc,
      partitioning = Seq("year(o_orderdate)"), replace = true)

    // sql:15 — hidden-partition-pruned date-range scan
    val datePred = col("o_orderdate") >=
      lit(java.sql.Timestamp.valueOf("1996-11-01 00:00:00")) &&
      col("o_orderdate") < lit(java.sql.Timestamp.valueOf("1997-01-01 00:00:00"))
    assert(ordersT.read(datePred).count() ==
      ordersSrc.filter(datePred).count())
    val om = ordersT.meta
    val (ofiles, _) = Meta.liveFiles(om, om.currentSnapshot.get)
    assert(Scan.pruneFiles(om, ofiles, Some(datePred)).size < ofiles.size,
      "year() partitions must prune")

    // sql:17-40 — CREATE OR REPLACE customer: 3-way federated join,
    // EUROPE filter, round(acctbal), identity partitioning, MoR v3
    val customerSrc = s.read.parquet(s"$sf/customer.parquet")
      .join(broadcast(s.read.parquet(s"$sf/nation.parquet")),
        col("c_nationkey") === col("n_nationkey"))
      .join(broadcast(s.read.parquet(s"$sf/region.parquet")),
        col("n_regionkey") === col("r_regionkey"))
      .filter(col("r_name") === "EUROPE")
      .select(col("c_custkey").as("custkey"), col("c_name").as("name"),
        col("c_mktsegment").as("mktsegment"),
        round(col("c_acctbal")).as("account_balance"),
        col("n_name").as("nation"))
    val t = cat.createTable("victorc_iceberg.customer", customerSrc,
      partitioning = Seq("mktsegment"),
      properties = Map("merge_mode" -> "merge-on-read"), replace = true)
    val baseCount = t.read().count()
    assert(baseCount == customerSrc.count() && baseCount > 0)

    // sql:42 — SHOW CREATE TABLE
    val ddl = cat.showCreateTable("victorc_iceberg.customer")
    assert(ddl.contains("partitioning = ARRAY['mktsegment']") &&
      ddl.contains("format_version = 3") &&
      ddl.contains("merge_mode = 'merge-on-read'"))

    // sql:44 — SELECT ORDER BY name
    assert(t.read().orderBy("name").count() == baseCount)

    // sql:48-49 — ANALYZE + SHOW STATS
    val stats = t.analyze()
    assert(stats.rowCount == baseCount)
    assert(t.showStats().filter(col("column_name").isNull)
      .head().getAs[Long]("row_count") == baseCount)

    // sql:53-61 — view + materialized view over nation
    cat.createView("my_view", "SELECT * FROM nation")
    assert(cat.readView("my_view").count() == 25)
    cat.createMaterializedView("my_mv", "SELECT * FROM nation",
      refreshSchedule = Some("30 04 * * 0"))
    cat.refreshMaterializedView("my_mv")
    assert(cat.readView("my_mv").count() == 25)

    // sql:65-72 — metadata columns
    val metaCols = t.readWithMetaColumns()
      .select(col("custkey"), col("$row_id"),
        col("$last_updated_sequence_number"), col("$partition"),
        col("$path"), col("$file_modified_time"))
    assert(metaCols.filter(col("$row_id").isNull ||
      col("$path").isNull || col("$partition").isNull).count() == 0)

    // sql:74-82 — all nine metadata tables answer
    Seq("properties", "snapshots", "history", "manifests", "partitions",
      "files", "refs", "entries", "metadata_log_entries").foreach { mt =>
      assert(t.metaTable(mt).count() > 0, s"$$${mt} empty")
    }

    // sql:85-96 — curr_ver_dets view (snapshots ⋈ history ⟕ refs with
    // concat_ws + the mysql-style date_format semantics)
    cat.createView("curr_ver_dets",
      """SELECT concat_ws(' > ', r.name, r.type) AS curr_ver,
                date_format(s.committed_at, 'yyyy/MM/dd-HH:mm:ss') AS committed_at,
                s.snapshot_id, s.parent_id, h.is_current_ancestor, s.operation
         FROM customer_snapshots s
         JOIN customer_history h ON s.snapshot_id = h.snapshot_id
         LEFT JOIN customer_refs r ON h.snapshot_id = r.snapshot_id
         ORDER BY s.committed_at""")
    val verDets = cat.readView("curr_ver_dets").collect()
    assert(verDets.last.getString(0) == "main > BRANCH")
    assert(TrinoFunctions.mysqlToJavaPattern("%Y/%m/%d-%T")
      == "yyyy/MM/dd-HH:mm:ss")

    // sql:103-108 — INSERT VALUES ×3
    val sBeforeInsert = t.meta.currentSnapshotId.get
    t.append(Seq(
      (2001L, "COMMANDER BUN BUN", "SQLENGINE", 1.0, "FRANCE"),
      (2002L, "COMMANDER BUN BUN", "SQLENGINE", 2.0, "FRANCE"),
      (2003L, "COMMANDER BUN BUN", "SQLENGINE", 3.0, "FRANCE"))
      .toDF("custkey", "name", "mktsegment", "account_balance", "nation"))
    assert(t.read().count() == baseCount + 3)

    // sql:114-125 — table_changes over the insert
    val ch = t.changes(sBeforeInsert, t.meta.currentSnapshotId.get)
    assert(ch.filter(col("_change_type") === "insert").count() == 3)

    // sql:129-135 — UPDATE + row lineage
    val rowIdBefore = t.readWithMetaColumns()
      .filter(col("custkey") === 2001L).select(col("$row_id"),
        col("$last_updated_sequence_number")).head()
    t.update(col("custkey") === 2001L,
      Map("account_balance" -> lit(1000.0)))
    val after = t.readWithMetaColumns().filter(col("custkey") === 2001L)
      .select(col("account_balance"), col("$row_id"),
        col("$last_updated_sequence_number")).head()
    assert(after.getDouble(0) == 1000.0)
    assert(after.getLong(1) == rowIdBefore.getLong(0))
    assert(after.getLong(2) > rowIdBefore.getLong(1))

    // sql:137-143 — DELETE IN-list; deletion vectors visible in $files
    t.delete(col("custkey").isin(2001L, 2002L, 2003L))
    assert(t.read().count() == baseCount)
    assert(t.metaTable("files").filter(col("content") === 1).count() >= 1,
      "deletion vector files must be listed")

    // sql:146-157 — MERGE (upsert shape of the commented block)
    val someKey = t.read().select(min("custkey")).head().getLong(0)
    val mergeSrc = Seq((someKey, "MERGED NAME", "SQLENGINE", 7.0, "FRANCE"),
        (300000L, "BRAND NEW", "SQLENGINE", 8.0, "FRANCE"))
      .toDF("custkey", "name", "mktsegment", "account_balance", "nation")
    t.merge(mergeSrc, Seq("custkey"),
      matchedCondition = Some(col("name") =!= col("src_name")))
    assert(t.read(col("custkey") === someKey).select("name").head()
      .getString(0) == "MERGED NAME")
    assert(t.read(col("custkey") === 300000L).count() == 1)
    t.delete(col("custkey") === 300000L) // restore script state-ish
    t.update(col("custkey") === someKey, Map("name" -> lit("restored")))

    // sql:166-171 — ADD COLUMN phone DEFAULT; old rows + omitted insert
    t.addColumn("phone", StringType, default = Some("+33606060606"))
    t.append(Seq((200000L, "COMMANDER BUN BUN", "SQLENGINE", 1.0, "FRANCE"))
      .toDF("custkey", "name", "mktsegment", "account_balance", "nation"))
    assert(t.read().filter(col("phone") =!= "+33606060606").count() == 0)

    // sql:175-181 — VARIANT column round-trip, then drop
    t.addColumn("message", VariantType)
    t.append(Seq((200100L, "COMMANDER BUN BUN", "SQLENGINE", 1.0, "FRANCE"))
      .toDF("custkey", "name", "mktsegment", "account_balance", "nation")
      .withColumn("message", parse_json(lit("""{"company": "Starburst"}"""))))
    assert(t.read(col("custkey") === 200100L)
      .select(variant_get(col("message"), "$.company", "string"))
      .head().getString(0) == "Starburst")
    t.dropColumn("message")
    assert(!t.read().columns.contains("message"))
    t.delete(col("custkey") === 200100L)

    // sql:185-189 — TIMESTAMP(9) nanosecond column as epoch-nanos long
    t.addColumn("nanos", LongType)
    val ns = java.time.Instant.parse("2025-08-21T12:34:56.123456789Z")
    val nanosLong = ns.getEpochSecond * 1000000000L + ns.getNano
    t.append(Seq((200200L, "NANO", "SQLENGINE", 1.0, "FRANCE", nanosLong))
      .toDF("custkey", "name", "mktsegment", "account_balance", "nation",
        "nanos"))
    assert(t.read(col("custkey") === 200200L)
      .select(TrinoFunctions.nanosToString(col("nanos")))
      .head().getString(0) == "2025-08-21 12:34:56.123456789")
    t.delete(col("custkey") === 200200L)

    // sql:193-209 — partition evolution ×2, per-file specs in $partitions
    val snapBeforePartEvo = t.meta.currentSnapshotId.get
    t.setPartitioning(Seq("mktsegment", "custkey"))
    t.append(Seq((200001L, "TRINO", "SQLENGINE", 1.0, "FRANCE"),
        (200002L, "STARBURST", "SQLENGINE", 2.0, "FRANCE"))
      .toDF("custkey", "name", "mktsegment", "account_balance", "nation"))
    t.setPartitioning(Seq("nation"))
    t.append(Seq((200003L, "TRINO", "SQLENGINE", 1.0, "ITALY"),
        (200004L, "STARBURST", "SQLENGINE", 2.0, "SPAIN"))
      .toDF("custkey", "name", "mktsegment", "account_balance", "nation"))
    assert(t.metaTable("partitions").select("spec_id").distinct().count() >= 3,
      "original + two evolved specs must coexist")

    // sql:213-221 — time travel + rollback
    val sqlengineNow = t.read(col("mktsegment") === "SQLENGINE").count()
    assert(t.asOf(snapBeforePartEvo)
      .filter(col("mktsegment") === "SQLENGINE").count() == sqlengineNow - 4)
    t.rollback(snapBeforePartEvo)
    assert(t.read(col("custkey") >= 200001L && col("custkey") <= 200004L)
      .count() == 0, "rollback must undo the four partition-evo inserts")

    // sql:228-251 — branching
    t.delete(col("mktsegment") === "SQLENGINE")
    t.append(Seq((200000L, "TRINO", "SQLENGINE", 10000.0, "FRANCE"))
      .toDF("custkey", "name", "mktsegment", "account_balance", "nation"))
    t.append(Seq((200001L, "STARBURST", "SQLENGINE", 10000.0, "FRANCE"))
      .toDF("custkey", "name", "mktsegment", "account_balance", "nation"))
    t.createBranch("dev")
    assert(t.metaTable("refs").count() == 2) // SHOW BRANCHES
    t.append(Seq((200005L, "SPARK", "SQLENGINE", 1.0, "ITALY"))
      .toDF("custkey", "name", "mktsegment", "account_balance", "nation"),
      branch = "dev")
    t.append(Seq((200006L, "CLICKHOUSE", "SQLENGINE", 2.0, "SPAIN"))
      .toDF("custkey", "name", "mktsegment", "account_balance", "nation"),
      branch = "dev")
    t.delete(col("custkey") === 200001L, branch = "dev")
    t.update(col("custkey") === 200000L,
      Map("account_balance" -> lit(0.0)), branch = "dev")

    def sqlengineSet(df: org.apache.spark.sql.DataFrame) =
      df.filter(col("mktsegment") === "SQLENGINE")
        .select("custkey", "name", "account_balance").collect()
        .map(r => (r.getLong(0), r.getString(1), r.getDouble(2))).toSet
    // sql:243 — dev sees its DML
    assert(sqlengineSet(t.readRef("dev")) == Set(
      (200000L, "TRINO", 0.0), (200005L, "SPARK", 1.0),
      (200006L, "CLICKHOUSE", 2.0)))
    // sql:245-247 — main untouched
    assert(sqlengineSet(t.read()) == Set(
      (200000L, "TRINO", 10000.0), (200001L, "STARBURST", 10000.0)))
    // sql:249-251 — fast forward main to dev
    t.fastForward("main", "dev")
    assert(sqlengineSet(t.read()) == sqlengineSet(t.readRef("dev")))

    // sql:258-268 — maintenance: expire, orphans, optimize, filtered opt
    val preMaint = t.read().orderBy("custkey", "name").collect().toSeq
    t.expireSnapshots(olderThanMs = 7L * 24 * 3600 * 1000)
    t.removeOrphanFiles(olderThanMs = 7L * 24 * 3600 * 1000)
    val filesBefore = t.metaTable("files").filter(col("content") === 0).count()
    t.optimize(fileSizeThresholdBytes = 100L << 20)
    assert(t.metaTable("files").filter(col("content") === 0).count()
      <= filesBefore)
    val cutoff = System.currentTimeMillis() - 2L * 24 * 3600 * 1000
    t.optimize(filePredicate = Some((_, mtime) => mtime > cutoff))
    assert(t.read().orderBy("custkey", "name").collect().toSeq == preMaint,
      "maintenance must never change query results")

    // sql:272-281 — register_table
    val reg = cat.registerTable("victorc_iceberg.new_customer", t.location)
    assert(reg.read().count() == t.read().count())

    // sql:286-295 — the federation aggregate over the final table state
    val orders = s.read.parquet(s"$sf/orders.parquet")
    val fed = t.read()
      .filter(col("mktsegment") === "AUTOMOBILE")
      .join(orders, col("custkey") === col("o_custkey"))
      .groupBy(col("nation"))
      .agg(round(sum(col("o_totalprice"))).as("total_price"))
      .orderBy(col("total_price"))
    assert(fed.count() > 0)
  }
}
