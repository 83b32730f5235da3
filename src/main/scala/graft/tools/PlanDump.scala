package graft.tools

/** Dump `.explain("formatted")` for a list of registry queries into
  * files — the before/after plan evidence the optimization rounds
  * commit under `plans/rNN/`.
  *
  * Usage: runMain graft.tools.PlanDump <outDir> <suffix> <sfDir> <q...>
  * Writes <outDir>/<query>_<suffix>.txt per query.
  */
object PlanDump {
  def main(args: Array[String]): Unit = {
    val outDir = java.nio.file.Paths.get(args(0))
    val suffix = args(1)
    val sf = args(2)
    val names = args.drop(3)
    java.nio.file.Files.createDirectories(outDir)
    val spark = graft.SparkEnv.session()
    names.foreach { name =>
      try {
        val df = graft.SparkEntry.queries(name)(spark, sf)
        val plan = df.queryExecution.explainString(
          org.apache.spark.sql.execution.FormattedMode)
        java.nio.file.Files.write(outDir.resolve(s"${name}_$suffix.txt"),
          plan.getBytes(java.nio.charset.StandardCharsets.UTF_8))
        println(s"[plandump] wrote $name")
      } catch { case e: Throwable =>
        System.err.println(s"[plandump] $name FAILED: ${e.getMessage}")
      }
    }
    spark.stop()
  }
}
