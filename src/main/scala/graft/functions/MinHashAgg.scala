package graft.functions

import java.nio.ByteBuffer
import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._

/** MinHash sketch as a first-class aggregate (TypedImperativeAggregate):
  * aggregates hashed shingles (LongType) into an `numHashes`-slot
  * signature with a primitive mutable buffer — per-slot
  * `min((a_j·x + b_j) mod P)` — merged element-wise across partitions
  * (map-side combine gives each shuffle row a fixed-size sketch, not a
  * shingle list).
  *
  * This replaces a `numHashes`-column `min()` aggregate: one buffer and
  * one pass instead of N independent aggregate expressions. The sketch
  * params must match [[graft.pipeline.Dedup.hashParams]] so both paths
  * produce identical signatures.
  */
case class MinHashAgg(
    child: Expression,
    numHashes: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Long]] {

  import MinHashAgg._

  private lazy val params = hashParams(numHashes)

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def createAggregationBuffer(): Array[Long] =
    Array.fill(numHashes)(Long.MaxValue)

  override def update(buf: Array[Long], input: InternalRow): Array[Long] = {
    val v = child.eval(input)
    if (v != null) {
      val x = Math.floorMod(v.asInstanceOf[Long], P)
      var j = 0
      while (j < numHashes) {
        val (a, b) = params(j)
        val h = Math.floorMod(a * x + b, P)
        if (h < buf(j)) buf(j) = h
        j += 1
      }
    }
    buf
  }

  override def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
    var j = 0
    while (j < numHashes) { if (b(j) < a(j)) a(j) = b(j); j += 1 }
    a
  }

  override def eval(buf: Array[Long]): Any = new GenericArrayData(buf)

  override def serialize(buf: Array[Long]): Array[Byte] = {
    val bb = ByteBuffer.allocate(8 * buf.length)
    buf.foreach(bb.putLong)
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Array[Long] = {
    val bb = ByteBuffer.wrap(bytes)
    Array.fill(bytes.length / 8)(bb.getLong)
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): MinHashAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): MinHashAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): MinHashAgg =
    copy(child = newChildren.head)
  override def prettyName: String = "minhash_sketch"
}

object MinHashAgg {
  /** Same prime and deterministic (a, b) streams as the column-wise
    * implementation — signatures are interchangeable.
    */
  val P = 2147483629L
  def hashParams(n: Int): IndexedSeq[(Long, Long)] = {
    val rnd = new java.util.Random(42)
    IndexedSeq.fill(n)((1 + math.abs(rnd.nextLong()) % (P - 1),
      math.abs(rnd.nextLong()) % P))
  }

  /** Column API: aggregate hashed-shingle longs into a signature. */
  def minhashSketch(hashed: Column, numHashes: Int): Column = {
    import org.apache.spark.sql.graftshim
    graftshim.columnOf(
      MinHashAgg(graftshim.columnExpr(hashed), numHashes)
        .toAggregateExpression())
  }
}
