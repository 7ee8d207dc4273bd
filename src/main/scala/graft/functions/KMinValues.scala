package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** K-minimum-values sketch state as a native Catalyst aggregate — the first
  * CUSTOM AGGREGATE in the extension set (the scalar extensions are
  * CosineSim / PolyHash64 / BloomMightContain; HLL and CMS are pure-Catalyst
  * register tables). A [[TypedImperativeAggregate]] is the right tool when
  * the mergeable state is bounded but not expressible as built-in
  * `max`/`sum` registers: here the state is the ≤ k smallest DISTINCT
  * hash values per group.
  *
  * Scale contract (same as the HLL/CMS family): each task folds its
  * partition into ≤ k longs per group (update), the exchange moves
  * serialized k-long buffers (merge on the reducer) — raw keys never
  * shuffle. Output is the sorted ascending array<long> of the sketch, a
  * pure function of the input SET (insertion-order-independent), so two
  * engines agree bit-for-bit and the DuckDB oracle replays it as
  * `ORDER BY hash LIMIT k` over distinct hashes.
  *
  * Null inputs are ignored (an absent key contributes nothing to a distinct
  * sketch). k is bounded to keep serialized buffers broadcast-small.
  */
case class KMinValues(
    child: Expression, k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[java.util.TreeSet[java.lang.Long]]
  with UnaryLike[Expression] {

  require(k >= 2 && k <= 65536, s"k_min_values: k must be in [2, 65536], got $k")

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == LongType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"k_min_values requires a bigint key, got ${child.dataType.catalogString}")
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = false
  override def prettyName: String = "k_min_values"

  override def createAggregationBuffer(): java.util.TreeSet[java.lang.Long] =
    new java.util.TreeSet[java.lang.Long]()

  private def insert(b: java.util.TreeSet[java.lang.Long], v: Long): Unit = {
    if (b.size < k) { b.add(v); () }
    else if (v < b.last()) { if (b.add(v)) { b.pollLast(); () } }
    // v ≥ current k-th smallest: cannot enter the sketch, drop it
  }

  override def update(b: java.util.TreeSet[java.lang.Long],
                      input: InternalRow): java.util.TreeSet[java.lang.Long] = {
    val v = child.eval(input)
    if (v != null) insert(b, v.asInstanceOf[Long])
    b
  }

  override def merge(b: java.util.TreeSet[java.lang.Long],
                     o: java.util.TreeSet[java.lang.Long]): java.util.TreeSet[java.lang.Long] = {
    val it = o.iterator()
    while (it.hasNext) insert(b, it.next())
    b
  }

  override def eval(b: java.util.TreeSet[java.lang.Long]): Any = {
    val out = new Array[Long](b.size)
    val it = b.iterator(); var i = 0
    while (it.hasNext) { out(i) = it.next(); i += 1 } // TreeSet iterates ascending
    new GenericArrayData(out)
  }

  override def serialize(b: java.util.TreeSet[java.lang.Long]): Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(b.size * 8)
    val it = b.iterator()
    while (it.hasNext) bb.putLong(it.next())
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): java.util.TreeSet[java.lang.Long] = {
    val b = createAggregationBuffer()
    val bb = java.nio.ByteBuffer.wrap(bytes)
    while (bb.remaining() >= 8) b.add(bb.getLong())
    b
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): KMinValues =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): KMinValues =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): KMinValues =
    copy(child = newChild)
}

object KMinValues {
  /** Aggregate Column: the sorted array<long> of the ≤ k smallest distinct
    * values of `key` (a LongType column) per group. */
  def column(key: org.apache.spark.sql.Column, k: Int): org.apache.spark.sql.Column =
    org.apache.spark.sql.GraftBridge.column(
      KMinValues(org.apache.spark.sql.GraftBridge.expression(key), k)
        .toAggregateExpression())
}
