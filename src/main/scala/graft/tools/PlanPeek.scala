package graft.tools

/** Print the formatted physical plan of one registry query at a given
  * sf dir — builder-side plan inspection (the `.explain("formatted")`
  * loop the build protocol asks for, as a runnable main).
  */
object PlanPeek {
  def main(args: Array[String]): Unit = {
    val spark = graft.SparkEnv.session()
    val name = args(0)
    val sf = if (args.length > 1) args(1) else "/root/testdata/sf0.01"
    val df = graft.SparkEntry.queries(name)(spark, sf)
    df.explain("formatted")
    spark.stop()
  }
}
