package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Manual skew mitigation for the cases AQE can't re-plan: salting
  * spreads a heavy key's rows across `saltFactor` synthetic sub-keys so
  * no single task owns the whole key.
  *
  * AQE's skew-join splitting covers sort-merge joins at runtime; these
  * operators cover (a) broadcast-ineligible joins planned before sizes
  * are known and (b) aggregations, where AQE does not split a hot group.
  * Salts derive from row content (xxhash64), never `rand()` — task
  * retries must re-produce identical salts or correctness breaks.
  */
object Skew {

  /** Inner equi-join with the left (large, skewed) side salted and the
    * right side replicated `saltFactor` ways. Replication multiplies the
    * right side — use when right is far smaller than left but above the
    * broadcast threshold.
    */
  def saltedJoin(left: DataFrame, right: DataFrame, key: String,
      saltFactor: Int): DataFrame = {
    val saltedLeft = left.withColumn("_salt",
      pmod(xxhash64(struct(left.columns.map(col).toSeq: _*)),
        lit(saltFactor)).cast("int"))
    val replicatedRight = right.withColumn("_salt",
      explode(sequence(lit(0), lit(saltFactor - 1))))
    saltedLeft.join(replicatedRight, Seq(key, "_salt")).drop("_salt")
  }

  /** Two-phase aggregation for skewed group keys: partial-aggregate on
    * (key, salt) — spreading each hot key over `saltFactor` reducers —
    * then merge the partials per key. `partialAggs` must be mergeable
    * (sum/count/min/max); the caller supplies both phases.
    */
  def saltedAggregate(df: DataFrame, key: String, saltFactor: Int,
      partialAggs: Seq[Column], finalAggs: Seq[Column]): DataFrame = {
    val salted = df.withColumn("_salt",
      pmod(xxhash64(struct(df.columns.map(col).toSeq: _*)),
        lit(saltFactor)).cast("int"))
    salted.groupBy(col(key), col("_salt"))
      .agg(partialAggs.head, partialAggs.tail: _*)
      .groupBy(col(key))
      .agg(finalAggs.head, finalAggs.tail: _*)
  }
}
