package graft.functions

import org.apache.spark.sql.{SparkSession, SparkSessionExtensions}
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
  *
  * [[GraftExtensions.register]] covers sessions NOT built through the
  * extension point (an external driver's own session, or `getOrCreate`
  * returning a pre-existing session, which silently drops the
  * extensions config): it installs the same builders into the live
  * session's function registry, idempotently.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit =
    GraftExtensions.functions.foreach(ext.injectFunction)
}

object GraftExtensions {

  private def intArg(e: Expression, fn: String): Int = e match {
    case Literal(v: Int, _) => v
    case Literal(v: Long, _) =>
      require(v == v.toInt, s"$fn: size argument $v out of Int range")
      v.toInt
    case other => throw new IllegalArgumentException(
      s"$fn: the size argument must be an integer literal, got $other")
  }

  /** The injected (identifier, info, builder) triples — one source of
    * truth for both the build-time extension and live registration.
    */
  val functions: Seq[(FunctionIdentifier, ExpressionInfo,
      Seq[Expression] => Expression)] = Seq(
    (new FunctionIdentifier("cosine_similarity"),
      new ExpressionInfo(classOf[CosineSimilarity].getName,
        "cosine_similarity"),
      (args: Seq[Expression]) => {
        require(args.length == 2, "cosine_similarity(a, b)")
        CosineSimilarity(args(0), args(1))
      }),
    (new FunctionIdentifier("hashed_shingles"),
      new ExpressionInfo(classOf[HashedShingles].getName,
        "hashed_shingles"),
      (args: Seq[Expression]) => {
        require(args.length == 2, "hashed_shingles(text, k)")
        HashedShingles(args(0), intArg(args(1), "hashed_shingles"))
      }),
    (new FunctionIdentifier("hashed_chargrams"),
      new ExpressionInfo(classOf[HashedChargrams].getName,
        "hashed_chargrams"),
      (args: Seq[Expression]) => {
        require(args.length == 2, "hashed_chargrams(text, n)")
        HashedChargrams(args(0), intArg(args(1), "hashed_chargrams"))
      }),
    (new FunctionIdentifier("winnow_fingerprints"),
      new ExpressionInfo(classOf[WinnowFingerprints].getName,
        "winnow_fingerprints"),
      (args: Seq[Expression]) => {
        require(args.length == 3, "winnow_fingerprints(text, k, w)")
        WinnowFingerprints(args(0),
          intArg(args(1), "winnow_fingerprints"),
          intArg(args(2), "winnow_fingerprints"))
      }),
    (new FunctionIdentifier("positional_shingles"),
      new ExpressionInfo(classOf[PositionalShingles].getName,
        "positional_shingles"),
      (args: Seq[Expression]) => {
        require(args.length == 2, "positional_shingles(text, k)")
        PositionalShingles(args(0), intArg(args(1), "positional_shingles"))
      }),
    (new FunctionIdentifier("bigram_buckets"),
      new ExpressionInfo(classOf[BigramBuckets].getName,
        "bigram_buckets"),
      (args: Seq[Expression]) => {
        require(args.length == 2, "bigram_buckets(text, buckets)")
        BigramBuckets(args(0), intArg(args(1), "bigram_buckets"))
      }),
    (new FunctionIdentifier("simhash_sketch"),
      new ExpressionInfo(classOf[SimhashSketch].getName,
        "simhash_sketch"),
      (args: Seq[Expression]) => {
        require(args.length == 1, "simhash_sketch(text)")
        SimhashSketch(args(0))
      }),
    (new FunctionIdentifier("kmv_sketch"),
      new ExpressionInfo(classOf[KmvAgg].getName, "kmv_sketch"),
      (args: Seq[Expression]) => {
        require(args.length == 2, "kmv_sketch(hashed, k)")
        KmvAgg(args(0), intArg(args(1), "kmv_sketch"))
          .toAggregateExpression()
      }),
    (new FunctionIdentifier("minhash_sketch"),
      new ExpressionInfo(classOf[MinHashAgg].getName, "minhash_sketch"),
      (args: Seq[Expression]) => {
        require(args.length == 2, "minhash_sketch(hashed, numHashes)")
        MinHashAgg(args(0), intArg(args(1), "minhash_sketch"))
          .toAggregateExpression()
      }),
    (new FunctionIdentifier("cms_buckets"),
      new ExpressionInfo(classOf[CmsBuckets].getName, "cms_buckets"),
      (args: Seq[Expression]) => {
        require(args.length == 3, "cms_buckets(text, depth, width)")
        CmsBuckets(args(0), intArg(args(1), "cms_buckets"),
          intArg(args(2), "cms_buckets"))
      }),
    (new FunctionIdentifier("dhash_sketch"),
      new ExpressionInfo(classOf[DhashSketch].getName, "dhash_sketch"),
      (args: Seq[Expression]) => {
        require(args.length == 1, "dhash_sketch(content)")
        DhashSketch(args(0))
      }))

  /** Install the functions into an already-built session (idempotent —
    * re-registration overwrites with identical builders).
    */
  def register(session: SparkSession): Unit =
    functions.foreach { case (id, info, builder) =>
      session.sessionState.functionRegistry
        .registerFunction(id, info, builder)
    }
}
