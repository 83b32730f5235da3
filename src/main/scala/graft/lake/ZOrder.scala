package graft.lake

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Z-order (Morton) clustering for compaction: quantize each clustering
  * column to `bits` via its rank, interleave the bits into one z-value,
  * and sort the rewrite by it. Rows close in the multi-dimensional key
  * space land in the same files, so min/max file pruning works on ANY
  * clustered column — the property plain sort orders only give the
  * leading column.
  *
  * Cost: one rank window per clustering column over the data being
  * rewritten — acceptable at compaction time (the data is being
  * rewritten anyway), never on the read path.
  */
object ZOrder {

  /** Interleave `bits` bits of each quantized column into a Morton code
    * (pure bitwise expressions, codegen'd).
    */
  def interleave(quantized: Seq[Column], bits: Int): Column = {
    val n = quantized.size
    val terms = for {
      b <- 0 until bits
      (q, d) <- quantized.zipWithIndex
    } yield shiftleft(
      shiftright(q, b).bitwiseAND(lit(1L)), b * n + d)
    terms.reduce((a, c) => a.bitwiseOR(c))
  }

  /** Append a `_zvalue` column: per-column linear quantization against
    * the batch's min/max (one distributed aggregate), interleaved.
    *
    * A rank-based quantization (percent_rank over an unpartitioned
    * window) would funnel the whole rewrite through ONE task — Spark
    * even warns about it — which contradicts the compaction-at-scale
    * purpose. Linear binning is a single agg + a map stage; it loses
    * equi-depth bins under heavy skew, but preserves order and
    * multi-dimensional locality, which is all pruning needs.
    */
  /** Order-preserving numeric key per supported type: numerics and
    * timestamps cast to double, dates via epoch-day, strings via a
    * packed 7-byte prefix (lexicographic order preserved for the prefix
    * — enough locality for clustering). Unsupported types error clearly
    * instead of silently null-casting.
    */
  private def orderKey(df: DataFrame, c: String): Column = {
    import org.apache.spark.sql.types._
    df.schema(c).dataType match {
      case _: NumericType => col(c).cast("double")
      case TimestampType | TimestampNTZType => col(c).cast("double")
      case DateType => unix_date(col(c)).cast("double")
      case StringType =>
        (0 until 7).map(k =>
          coalesce(ascii(substring(col(c), k + 1, 1)), lit(0))
            .cast("double") * math.pow(256.0, 6 - k))
          .reduce(_ + _)
      case other => throw new IllegalArgumentException(
        s"clusterBy($c): unsupported type $other")
    }
  }

  def withZValue(df: DataFrame, cols: Seq[String], bits: Int = 16)
      : DataFrame = {
    // The interleaved code must fit the 63 value bits of a long: Java
    // shifts wrap mod 64, and writing bit 63 flips the sign, splitting
    // the Morton curve into two runs (negative z-values sort first).
    // Degrade bit depth instead — locality per dimension shrinks,
    // ordering stays correct. 63/cols also keeps a 1-column bits>=64
    // request from wrapping (1L << 64 == 1).
    val bitsEff = math.max(1, math.min(bits, 63 / math.max(1, cols.size)))
    val maxQ = ((1L << bitsEff) - 1).toDouble
    val keyed = cols.map(c => c -> orderKey(df, c)).toMap
    val aggs = cols.flatMap(c => Seq(
      min(keyed(c)).as(s"_mn_$c"), max(keyed(c)).as(s"_mx_$c")))
    val b = df.agg(aggs.head, aggs.tail: _*).head()
    val quantCols = cols.map { c =>
      val mn = Option(b.getAs[java.lang.Double](s"_mn_$c"))
        .map(_.doubleValue).getOrElse(0.0)
      val mx = Option(b.getAs[java.lang.Double](s"_mx_$c"))
        .map(_.doubleValue).getOrElse(0.0)
      val span = math.max(mx - mn, java.lang.Double.MIN_NORMAL)
      least(greatest(
        (((keyed(c) - lit(mn)) / lit(span)) * maxQ).cast("long"),
        lit(0L)), lit(maxQ.toLong)).as(s"_q_$c")
    }
    val withQ = df.select(df.columns.map(col).toSeq ++ quantCols: _*)
    withQ
      .withColumn("_zvalue",
        interleave(cols.map(c => col(s"_q_$c")), bitsEff))
      .drop(cols.map(c => s"_q_$c"): _*)
  }

  /** Sort a rewrite batch in z-order over `cols` (used by
    * [[LakeTable.optimize]] clusterBy).
    */
  def cluster(df: DataFrame, cols: Seq[String], targetFiles: Int,
      bits: Int = 16): DataFrame =
    withZValue(df, cols, bits)
      .repartitionByRange(math.max(1, targetFiles), col("_zvalue"))
      .sortWithinPartitions("_zvalue")
      .drop("_zvalue")
}
