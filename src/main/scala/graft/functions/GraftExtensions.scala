package graft.functions

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo,
  Literal}

/** `SparkSessionExtensions` hook exposing the native codegen kernels to
  * the SQL surface — `spark.sql("SELECT cosine_similarity(a, b) ...")`
  * and `hashed_shingles(text, k)` work in any session built with
  * `spark.sql.extensions=graft.functions.GraftExtensions` (SparkEnv
  * sets it), including statements routed through `LakeCatalog.sql` /
  * `GraftSql`. Injection happens at session build; the functions then
  * resolve and codegen exactly like built-ins — no UDF wrapping, no
  * registry mutation at call sites.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {

  private def intArg(e: Expression, fn: String): Int = e match {
    case Literal(v: Int, _) => v
    case Literal(v: Long, _) => v.toInt
    case other => throw new IllegalArgumentException(
      s"$fn: the size argument must be an integer literal, got $other")
  }

  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction((
      new FunctionIdentifier("cosine_similarity"),
      new ExpressionInfo(classOf[CosineSimilarity].getName,
        "cosine_similarity"),
      (args: Seq[Expression]) => {
        require(args.length == 2, "cosine_similarity(a, b)")
        CosineSimilarity(args(0), args(1))
      }))
    ext.injectFunction((
      new FunctionIdentifier("hashed_shingles"),
      new ExpressionInfo(classOf[HashedShingles].getName,
        "hashed_shingles"),
      (args: Seq[Expression]) => {
        require(args.length == 2, "hashed_shingles(text, k)")
        HashedShingles(args(0), intArg(args(1), "hashed_shingles"))
      }))
    ext.injectFunction((
      new FunctionIdentifier("hashed_chargrams"),
      new ExpressionInfo(classOf[HashedChargrams].getName,
        "hashed_chargrams"),
      (args: Seq[Expression]) => {
        require(args.length == 2, "hashed_chargrams(text, n)")
        HashedChargrams(args(0), intArg(args(1), "hashed_chargrams"))
      }))
  }
}
