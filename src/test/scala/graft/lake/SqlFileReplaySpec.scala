package graft.lake

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark

/** The reference script `/root/reference/iceberg_trino_sqldemo.sql`
  * replayed VERBATIM — the actual file, statement by statement, through
  * [[GraftSql.execute]] — with the same observation points as the typed
  * replay (`ScriptReplaySpec`). This proves SQL-TEXT parity, not just
  * shape-by-shape coverage: every statement the demo runs is executed
  * as written.
  *
  * The only text adaptations are environmental, applied per statement:
  *  - the demo's hard-coded snapshot ids (`sql:121-122,216,218`) are
  *    placeholders from the author's run — they are substituted with
  *    the ids this run actually produced at the equivalent point;
  *  - `register_table`'s S3 location (`sql:279`) becomes the local
  *    customer table dir (same attach semantics, reachable path).
  * Everything else — including the `ASC ORDER BY` typo at `sql:44`,
  * the MySQL date_format pattern at `sql:87`, the JSON literal at
  * `sql:177` and the 9-digit timestamp at `sql:187` — goes through
  * as-is.
  */
class SqlFileReplaySpec extends AnyFunSuite {
  import TestSpark._
  private lazy val s = spark

  /** testdata columns carry TPC-H prefixes (c_custkey); the demo's
    * Trino connectors expose bare names (custkey) — strip the prefix.
    */
  private def bare(df: DataFrame): DataFrame =
    df.columns.foldLeft(df)((d, c) =>
      d.withColumnRenamed(c, c.replaceFirst("^[a-z]_", "")))

  test("iceberg_trino_sqldemo.sql replays verbatim through GraftSql") {
    val text = new String(Files.readAllBytes(
      Paths.get("/root/reference/iceberg_trino_sqldemo.sql")),
      StandardCharsets.UTF_8)
    val cat = new LakeCatalog(s,
      Files.createTempDirectory("sql-file-replay-").toString)
    val gs = new GraftSql(cat)
    // the demo's remote connectors, as parquet stand-ins
    gs.registerSource("tpch.sf1.nation", bare(s.read.parquet(s"$sf/nation.parquet")))
    gs.registerSource("tpch.sf1.orders", bare(s.read.parquet(s"$sf/orders.parquet")))
    gs.registerSource("postgresql.demo.customer", bare(s.read.parquet(s"$sf/customer.parquet")))
    gs.registerSource("oracle.demo.nation", bare(s.read.parquet(s"$sf/nation.parquet")))
    gs.registerSource("snowflake_parallel.demo.region", bare(s.read.parquet(s"$sf/region.parquet")))
    gs.registerSource("postgresql.demo.orders", bare(s.read.parquet(s"$sf/orders.parquet")))

    def customer = cat.table("victorc_iceberg.customer")
    def snapNow = customer.meta.currentSnapshotId.get
    def custCount = gs.execute("SELECT * FROM customer").count()
    def sqlengine = gs.execute(
      "SELECT * FROM customer where mktsegment='SQLENGINE'")

    val stmts = gs.splitStatements(text)
    assert(stmts.size > 60, s"expected the full script, got ${stmts.size}")

    var preInsertSnap = -1L   // before the 3-row insert (sql:103)
    var preEvoSnap = -1L      // before partition evolution (sql:193)
    var baseCount = -1L       // customer rows right after CTAS
    var insertsSeen = 0
    var partEvoSeen = 0
    var maintBaseline: Seq[org.apache.spark.sql.Row] = Nil
    var asserted = scala.collection.mutable.Set[String]()

    for (raw <- stmts) {
      val flat = raw.replaceAll("\\s+", " ").trim
      // --- capture points (before executing the statement) ---
      if (flat.startsWith("INSERT INTO customer") && insertsSeen == 0)
        preInsertSnap = snapNow
      if (flat.contains("SET PROPERTIES partitioning") && partEvoSeen == 0)
        preEvoSnap = snapNow
      if (flat.contains("EXECUTE expire_snapshots") && maintBaseline.isEmpty)
        maintBaseline = gs.execute("SELECT * FROM customer")
          .orderBy("custkey", "name", "account_balance").collect().toSeq

      // --- environmental substitutions ---
      var st = raw
      if (flat.contains("table_changes"))
        st = st.replace("8971812331224479488", preInsertSnap.toString)
          .replace("5174658899552221530", snapNow.toString)
      else if (st.contains("5174658899552221530"))
        st = st.replace("5174658899552221530", preEvoSnap.toString)
      if (flat.contains("register_table"))
        st = st.replace(
          "s3://victorc-data/iceberg/customer-ddaf4ed693ae48c686e1722aa0ce12dd",
          customer.location)

      if (flat.startsWith("INSERT INTO customer")) insertsSeen += 1
      if (flat.contains("SET PROPERTIES partitioning")) partEvoSeen += 1

      val res = gs.execute(st)

      // --- observation points (same assertions as ScriptReplaySpec) ---
      def once(k: String)(body: => Unit): Unit =
        if (!asserted.contains(k)) { asserted += k; body }
      flat match {
        case f if f.startsWith("CREATE OR REPLACE TABLE nation") =>
          assert(gs.execute("SELECT * FROM nation").count() == 25)
        case f if f.startsWith("SELECT orderdate FROM orders") =>
          // hidden-partition-pruned range scan ≡ raw source filter
          val src = bare(s.read.parquet(s"$sf/orders.parquet"))
            .filter(col("orderdate") >= lit("1992-11-01").cast("timestamp") &&
              col("orderdate") < lit("1993-01-01").cast("timestamp"))
          assert(res.count() == src.count())
        case f if f.startsWith("CREATE OR REPLACE TABLE customer") =>
          baseCount = custCount
          assert(baseCount > 0 && baseCount <= 500) // CTAS has LIMIT 500
        case f if f.startsWith("SHOW CREATE TABLE customer") =>
          val ddl = res.head().getString(0)
          assert(ddl.contains("mktsegment") && ddl.contains("merge-on-read"))
        case f if f.startsWith("SHOW STATS FOR customer") =>
          assert(res.count() > 0)
        case f if f.startsWith("SELECT * FROM my_view") =>
          assert(res.count() == 25)
        case f if f.startsWith("SELECT * FROM my_mv") =>
          assert(res.count() == 25)
        case f if f.startsWith("SELECT custkey, \"$row_id\"") =>
          assert(res.count() == custCount)
          assert(res.filter(col("$row_id").isNull ||
            col("file").isNull || col("$partition").isNull).count() == 0)
        case f if f.startsWith("SELECT * FROM \"customer$") =>
          val mt = "customer\\$(\\w+)".r.findFirstMatchIn(f).get.group(1)
          assert(res.count() > 0, s"metadata table $mt answered empty")
        case f if f.startsWith("select * from curr_ver_dets") => once("verdets") {
          val rows = res.collect()
          assert(rows.last.getString(0) == "main > BRANCH")
          // sql:87's MySQL pattern must render, not echo pattern letters
          assert(rows.last.getString(1)
            .matches("\\d{4}/\\d{2}/\\d{2}-\\d{2}:\\d{2}:\\d{2}"),
            s"date_format('%Y/%m/%d-%T') must translate: ${rows.last.getString(1)}")
        }
        case f if f.contains("table_changes") =>
          assert(res.filter(col("_change_type") === "insert").count() == 3)
        case f if f.startsWith("UPDATE customer SET account_balance = 1000") =>
          assert(gs.execute(
            "SELECT account_balance FROM customer WHERE custkey = 2001")
            .head().getDouble(0) == 1000.0)
        case f if f.startsWith("SELECT name, custkey,\"$row_id\"") =>
          assert(res.filter(col("$row_id").isNull).count() == 0)
        case f if f.startsWith("DELETE FROM customer WHERE custkey IN") =>
          assert(custCount == baseCount)
        case f if f.startsWith("SELECT file_path, file_format") =>
          assert(res.filter(col("file_format") === "PARQUET").count() > 0)
        case f if f.startsWith("ALTER TABLE customer ADD COLUMN phone") =>
          () // asserted after the next insert below
        case f if f.contains("VALUES (200000, 'COMMANDER BUN BUN'") &&
            !f.contains("message") && !f.contains("nanos") => once("phone") {
          assert(gs.execute(
            "SELECT phone FROM customer WHERE custkey = 200000")
            .collect().forall(_.getString(0) == "+33606060606"),
            "DEFAULT must fill omitted and pre-evolution rows")
        }
        case f if f.contains("JSON '{\"company\": \"Starburst\"}'") =>
          assert(gs.execute(
            """SELECT variant_get(message, '$.company', 'string') AS c
               FROM customer WHERE message IS NOT NULL""")
            .head().getString(0) == "Starburst")
        case f if f.contains("TIMESTAMP '2025-08-21 12:34:56.123456789'") =>
          // ns literal survives at full precision (ns-as-long convention)
          val ns = gs.execute(
            "SELECT nanos FROM customer WHERE nanos IS NOT NULL")
            .head().getLong(0)
          assert(ns == 1755779696123456789L)
        case f if f.startsWith("SELECT * FROM customer FOR VERSION AS OF '") =>
          () // branch reads asserted via the set comparison below
        case f if f.startsWith("SELECT * FROM customer FOR VERSION AS OF") =>
          // time travel: pre-evolution snapshot lacks the 4 evo inserts
          assert(res.count() == sqlengine.count() - 4)
        case f if f.startsWith("CALL system.rollback_to_snapshot") =>
          assert(gs.execute(
            """SELECT * FROM customer
               where mktsegment='SQLENGINE' AND custkey >= 200001""")
            .count() == 0, "rollback must undo the partition-evo inserts")
        case f if f.startsWith("SHOW BRANCHES") =>
          assert(res.count() == 2)
        case f if f.startsWith("ALTER BRANCH main") =>
          val main = sqlengine.collect()
            .map(r => (r.getAs[Long]("custkey"), r.getAs[String]("name")))
            .toSet
          val dev = gs.execute(
            """SELECT * FROM customer FOR VERSION AS OF 'dev'
               where mktsegment='SQLENGINE'""").collect()
            .map(r => (r.getAs[Long]("custkey"), r.getAs[String]("name")))
            .toSet
          assert(main == dev, "fast-forward must converge main onto dev")
          assert(main.map(_._2) == Set("TRINO", "SPARK", "CLICKHOUSE"))
        case f if f.startsWith("ALTER TABLE customer EXECUTE optimize WHERE") =>
          val now = gs.execute("SELECT * FROM customer")
            .orderBy("custkey", "name", "account_balance").collect().toSeq
          assert(now == maintBaseline,
            "maintenance (expire/orphans/optimize ×2) must never change results")
        case f if f.startsWith("SELECT * FROM new_customer") =>
          assert(res.count() == custCount)
        case f if f.startsWith("SELECT c.nation as nation") =>
          val rows = res.collect()
          assert(rows.nonEmpty, "federation aggregate returns rows")
          val prices = rows.map(_.getAs[Double]("total_price"))
          assert(prices.sameElements(prices.sorted), "ORDER BY total_price")
        case _ => ()
      }
    }

    // branch DML ran: dev delta landed on main after fast-forward
    assert(insertsSeen >= 10, s"saw $insertsSeen customer inserts")
    assert(partEvoSeen == 2)
    assert(asserted.contains("verdets") && asserted.contains("phone"))
  }
}
