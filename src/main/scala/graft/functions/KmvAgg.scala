package graft.functions

import java.nio.ByteBuffer
import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._

/** KMV (k-minimum-values) distinct-value sketch as a first-class
  * aggregate (TypedImperativeAggregate, the [[MinHashAgg]] pattern):
  * aggregates 60-bit element hashes (LongType) into the k smallest
  * DISTINCT values, ascending.
  *
  * This is the piece that makes the sketch 100 TB-shaped: as a plain
  * `distinct + window-rank` the k-min selection shuffles the whole
  * distinct element set and sorts it per group; as an aggregate the
  * partial sketches combine MAP-SIDE, so each shuffle row is one
  * ≤ k-element buffer per (partition, group) — the mergeability that
  * is the entire point of a sketch. Merging two KMV sketches = union,
  * re-truncate to k (Beyer et al. 2007): associative, commutative,
  * duplicate-safe, so the result is independent of partitioning and
  * merge order — the aggregate is exactly as deterministic (and
  * oracle-replayable) as the sorted-distinct formulation it replaces.
  */
case class KmvAgg(
    child: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[java.util.TreeSet[java.lang.Long]] {

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def createAggregationBuffer(): java.util.TreeSet[java.lang.Long] =
    new java.util.TreeSet[java.lang.Long]()

  private def insert(buf: java.util.TreeSet[java.lang.Long],
      v: Long): Unit = {
    // fast path: a full sketch ignores anything ≥ its current max
    if (buf.size() < k) { buf.add(v); () }
    else if (v < buf.last()) {
      if (buf.add(v)) { buf.pollLast(); () }
    }
  }

  override def update(buf: java.util.TreeSet[java.lang.Long],
      input: InternalRow): java.util.TreeSet[java.lang.Long] = {
    val v = child.eval(input)
    if (v != null) insert(buf, v.asInstanceOf[Long])
    buf
  }

  override def merge(a: java.util.TreeSet[java.lang.Long],
      b: java.util.TreeSet[java.lang.Long])
      : java.util.TreeSet[java.lang.Long] = {
    val it = b.iterator()
    while (it.hasNext) insert(a, it.next())
    a
  }

  override def eval(buf: java.util.TreeSet[java.lang.Long]): Any = {
    val out = new Array[Long](buf.size())
    val it = buf.iterator()
    var i = 0
    while (it.hasNext) { out(i) = it.next(); i += 1 }
    new GenericArrayData(out)
  }

  override def serialize(buf: java.util.TreeSet[java.lang.Long])
      : Array[Byte] = {
    val bb = ByteBuffer.allocate(8 * buf.size())
    val it = buf.iterator()
    while (it.hasNext) bb.putLong(it.next())
    bb.array()
  }

  override def deserialize(bytes: Array[Byte])
      : java.util.TreeSet[java.lang.Long] = {
    val buf = new java.util.TreeSet[java.lang.Long]()
    val bb = ByteBuffer.wrap(bytes)
    var i = 0
    val n = bytes.length / 8
    while (i < n) { buf.add(bb.getLong); i += 1 }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): KmvAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): KmvAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): KmvAgg =
    copy(child = newChildren.head)
  override def prettyName: String = "kmv_sketch"
}

object KmvAgg {
  /** Column API: aggregate element hashes into the ascending k-min
    * distinct sketch (`array<long>`, ≤ k elements).
    */
  def kmvSketch(hashed: Column, k: Int): Column = {
    import org.apache.spark.sql.graftshim
    graftshim.columnOf(
      KmvAgg(graftshim.columnExpr(hashed), k).toAggregateExpression())
  }
}
