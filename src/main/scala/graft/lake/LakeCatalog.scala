package graft.lake

import java.nio.file.{Files, Paths}
import java.nio.charset.StandardCharsets
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types.StructType
import org.json4s._
import org.json4s.jackson.Serialization

/** Catalog → schema → table namespace over a warehouse directory
  * (`iceberg_trino_sqldemo.sql:6-9`: CREATE SCHEMA / USE), plus views and
  * materialized views (`sql:53-61`) and external-table registration
  * (`sql:276-281`).
  *
  * Names are `schema.table`. Tables live at `<warehouse>/<schema>/<table>`
  * unless registered from an external location.
  */
object LakeCatalog {
  private[lake] case class CatalogState(
      schemas: Map[String, String],            // name -> location
      external: Map[String, String],           // table -> location
      views: Map[String, String],              // name -> sql
      mviews: Map[String, MvDef])
  private[lake] case class MvDef(sql: String, location: String,
      refreshSchedule: Option[String])
}

class LakeCatalog(val spark: SparkSession, val warehouse: String) {
  import LakeCatalog.{CatalogState, MvDef}
  private implicit val formats: Formats = Serialization.formats(NoTypeHints)

  private def statePath = Paths.get(warehouse, "_catalog.json")

  private def state: CatalogState =
    if (Files.exists(statePath))
      Serialization.read[CatalogState](
        new String(Files.readAllBytes(statePath), StandardCharsets.UTF_8))
    else CatalogState(Map.empty, Map.empty, Map.empty, Map.empty)

  private def save(s: CatalogState): Unit = {
    Files.createDirectories(statePath.getParent)
    val tmp = statePath.resolveSibling("_catalog.json.tmp")
    Files.write(tmp, Serialization.writePretty(s).getBytes(StandardCharsets.UTF_8))
    Files.move(tmp, statePath,
      java.nio.file.StandardCopyOption.ATOMIC_MOVE,
      java.nio.file.StandardCopyOption.REPLACE_EXISTING)
  }

  // ---- schemas (`sql:6-9`) -------------------------------------------

  def createSchema(name: String, location: Option[String] = None): Unit = {
    val loc = location.getOrElse(s"$warehouse/$name")
    Files.createDirectories(Paths.get(loc))
    save(state.copy(schemas = state.schemas + (name -> loc)))
  }

  def showCreateSchema(name: String): String = {
    val loc = state.schemas.getOrElse(name,
      throw new IllegalArgumentException(s"no schema $name"))
    s"CREATE SCHEMA $name\nWITH (\n   location = '$loc'\n)"
  }

  def schemaLocation(name: String): String =
    state.schemas.getOrElse(name, s"$warehouse/$name")

  def listSchemas: Seq[String] = state.schemas.keys.toSeq.sorted

  /** DROP SCHEMA [IF EXISTS] (`sql:4`, commented but declared surface).
    * Refuses a non-empty schema — same contract as Trino without
    * CASCADE: dropping data must be explicit, table by table.
    */
  def dropSchema(name: String): Boolean = {
    val existed = state.schemas.contains(name)
    if (existed) {
      val tables = listTables.filter(_.startsWith(s"$name."))
      require(tables.isEmpty,
        s"schema $name is not empty (${tables.take(3).mkString(", ")}); " +
          "drop its tables first")
      save(state.copy(schemas = state.schemas - name))
    }
    existed
  }

  // ---- tables ---------------------------------------------------------

  def tableLocation(name: String): String =
    state.external.getOrElse(name, {
      val parts = name.split("\\.", 2)
      if (parts.length == 2) s"${schemaLocation(parts(0))}/${parts(1)}"
      else s"$warehouse/default/$name"
    })

  def createTable(name: String, df: DataFrame,
      partitioning: Seq[String] = Nil,
      properties: Map[String, String] = Map.empty,
      replace: Boolean = false): LakeTable =
    LakeTable.create(spark, tableLocation(name), Right(df), partitioning,
      properties, replace)

  def createTable(name: String, schema: StructType,
      partitioning: Seq[String],
      properties: Map[String, String]): LakeTable =
    LakeTable.create(spark, tableLocation(name), Left(schema), partitioning,
      properties)

  def table(name: String): LakeTable =
    LakeTable.forLocation(spark, tableLocation(name))

  def tableExists(name: String): Boolean =
    Meta.currentVersion(tableLocation(name)).isDefined

  /** DROP TABLE IF EXISTS (`sql:272`). */
  def dropTable(name: String): Boolean = {
    val loc = tableLocation(name)
    val p = Paths.get(loc)
    val existed = Files.exists(p) && Meta.currentVersion(loc).isDefined
    if (existed) {
      import scala.jdk.CollectionConverters._
      Files.walk(p).sorted(java.util.Comparator.reverseOrder())
        .iterator().asScala.foreach(Files.deleteIfExists(_))
    }
    save(state.copy(external = state.external - name))
    existed
  }

  /** CALL register_table(schema, table, location) (`sql:276-281`):
    * attach an existing lake directory under a new name.
    */
  def registerTable(name: String, location: String): LakeTable = {
    require(Meta.currentVersion(location).isDefined,
      s"no lake table metadata at $location")
    save(state.copy(external = state.external + (name -> location)))
    table(name)
  }

  /** SHOW CREATE TABLE (`sql:42`). */
  def showCreateTable(name: String): String = {
    val t = table(name)
    val m = t.meta
    val cols = m.currentSchema.struct.fields.map { f =>
      val d = SchemaEvolution.defaultValue(f)
        .map(_ => s" DEFAULT '${f.metadata.getString(SchemaEvolution.DefaultKey)}'")
        .getOrElse("")
      s"   ${f.name} ${f.dataType.sql.toLowerCase}$d"
    }.mkString(",\n")
    val partitioning = m.defaultSpec.fields.map(pf => pf.transform match {
      case "identity" => s"'${pf.source}'"
      case Transforms_bucket(n) => s"'bucket(${pf.source}, $n)'"
      case tf => s"'$tf(${pf.source})'"
    })
    val props = Seq(
      s"   format = 'PARQUET'",
      s"   format_version = ${m.formatVersion}") ++
      (if (partitioning.nonEmpty)
        Seq(s"   partitioning = ARRAY[${partitioning.mkString(", ")}]")
      else Nil) ++
      m.properties.get("merge_mode").map(mm => s"   merge_mode = '$mm'")
    s"CREATE TABLE $name (\n$cols\n)\nWITH (\n${props.mkString(",\n")}\n)"
  }

  private object Transforms_bucket {
    private val B = """bucket\[(\d+)\]""".r
    def unapply(s: String): Option[Int] = s match {
      case B(n) => Some(n.toInt)
      case _ => None
    }
  }

  // ---- views (`sql:53-55, 85-96`) ------------------------------------

  /** CREATE OR REPLACE VIEW: stored SQL text, re-planned at every read.
    * The SQL may reference catalog tables by bare table name and
    * metadata tables as `<table>$snapshots` etc. — they're registered
    * as temp views before execution.
    */
  def createView(name: String, sql: String): Unit =
    save(state.copy(views = state.views + (name -> sql)))

  def readView(name: String): DataFrame = {
    val s = state
    val sql = s.views.get(name)
      .orElse(s.mviews.get(name).map(_.sql))
      .getOrElse(throw new IllegalArgumentException(s"no view $name"))
    // Materialized view with a valid materialization → serve the stored
    // table (`sql:60` REFRESH) — else plan the SQL.
    s.mviews.get(name) match {
      case Some(mv) if Meta.currentVersion(mv.location).isDefined =>
        LakeTable.forLocation(spark, mv.location).read()
      case _ => execSql(sql)
    }
  }

  /** CREATE MATERIALIZED VIEW WITH refresh_schedule (`sql:57-61`); the
    * cron string is stored as a property (no in-engine scheduler).
    */
  def createMaterializedView(name: String, sql: String,
      refreshSchedule: Option[String] = None): Unit = {
    val loc = s"$warehouse/_mv/$name"
    save(state.copy(mviews = state.mviews +
      (name -> MvDef(sql, loc, refreshSchedule))))
    refreshMaterializedView(name) // initial materialization
  }

  /** REFRESH MATERIALIZED VIEW (`sql:60`). */
  def refreshMaterializedView(name: String): Unit = {
    val mv = state.mviews.getOrElse(name,
      throw new IllegalArgumentException(s"no materialized view $name"))
    LakeTable.create(spark, mv.location, Right(execSql(mv.sql)),
      replace = true)
  }

  /** Public SQL entry point: plan an arbitrary SELECT over the
    * catalog's tables (and their `<table>_snapshots`-style metadata
    * tables) by bare table name — the reference script's `SELECT`
    * statements run verbatim modulo catalog prefixes. Registration is
    * lazy and token-matched: only tables the query actually names are
    * bound, each as its current-snapshot read (so time travel, branches
    * and MoR deletes are all visible exactly as `table(n).read()` shows
    * them).
    */
  def sql(query: String): DataFrame = execSql(query)

  private def execSql(sql: String): DataFrame = {
    // Register every catalog table (+ its metadata tables) the SQL
    // mentions as temp views, then let Spark SQL plan it. Mentions are
    // matched on whole identifier tokens, not substrings — a view over
    // `orders` must not also register (and read) `orders_2`.
    // maximal word-char runs, so digit-leading names ("2024_sales")
    // still tokenize whole
    val idents = "[A-Za-z0-9_]+".r.findAllIn(sql).toSet
    val metaKinds = Seq("snapshots", "history", "refs", "files",
      "partitions", "properties", "manifests", "entries",
      "metadata_log_entries")
    val bindings = listTables.flatMap { n =>
      val short = n.split("\\.").last
      val needsBase = idents.contains(short)
      val metaRefs = metaKinds.filter(mt => idents.contains(s"${short}_$mt"))
      if (needsBase || metaRefs.nonEmpty) {
        val t = table(n)
        (if (needsBase) Seq(short -> t.read()) else Nil) ++
          metaRefs.map(mt => s"${short}_$mt" -> MetaTables(t, mt))
      } else Nil
    }
    // The bindings are scoped to THIS call: clobbering a session temp
    // view the user created (createOrReplaceTempView) — or leaving our
    // views behind to shadow names for later spark.sql calls — would
    // leak the binding outside catalog.sql. Resolution is eager in
    // spark.sql, so dropping the views after planning is safe for the
    // returned (lazy) DataFrame.
    val created = scala.collection.mutable.Buffer[String]()
    try {
      bindings.foreach { case (name, df) =>
        if (spark.catalog.tableExists(name))
          throw new IllegalStateException(s"catalog.sql: the session " +
            s"already has a table or view named '$name', which this query " +
            "would bind to the catalog table — drop or rename it first")
        df.createTempView(name)
        created += name
      }
      spark.sql(sql)
    } finally created.foreach(spark.catalog.dropTempView(_))
  }

  def listViews: Seq[String] = {
    val s = state
    (s.views.keys ++ s.mviews.keys).toSeq.distinct.sorted
  }

  def listTables: Seq[String] = {
    import scala.jdk.CollectionConverters._
    val s = state
    val managed = s.schemas.toSeq.flatMap { case (schema, loc) =>
      val p = Paths.get(loc)
      if (!Files.isDirectory(p)) Nil
      else Files.list(p).iterator().asScala
        .filter(d => Meta.currentVersion(d.toString).isDefined)
        .map(d => s"$schema.${d.getFileName}").toSeq
    }
    (managed ++ s.external.keys).distinct.sorted
  }
}
