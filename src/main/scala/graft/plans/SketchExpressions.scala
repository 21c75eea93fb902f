package graft.plans

import scala.collection.mutable

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.{ArrayBasedMapData, GenericArrayData}
import org.apache.spark.sql.types.{DataType, LongType, MapType}

/** Misra–Gries heavy-hitters sketch as a native Catalyst aggregate — the
  * engine's "custom aggregation function" surface (a
  * [[TypedImperativeAggregate]] with a mergeable buffer, the same machinery
  * as Spark's own approx_count_distinct / percentile_approx).
  *
  * Contract (Misra–Gries '82; merge rule from Agarwal et al. 2013,
  * "Mergeable Summaries"): with capacity m over a stream of n items, every
  * reported count is an UNDER-estimate by at most n/(m+1), and any item
  * with true frequency > n/(m+1) is guaranteed present — so the sketch
  * never misses a true heavy hitter. With m >= the column's distinct
  * cardinality no decrement ever fires and the counts are EXACT (the
  * regime the oracle-checked query runs in; the approximation guarantee is
  * spec-tested separately with a tiny m).
  *
  * Scale: the aggregation buffer is a bounded map of at most m entries
  * regardless of input size — partial aggregation map-side, one shuffle of
  * m-entry buffers per partition, associative merge. This is the shape for
  * "top users over 100 TB of events" when an exact groupBy of the full key
  * universe would itself be a giant shuffle. */
case class MisraGriesSketch(
    child: Expression,
    capacity: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[mutable.LongMap[Long]] {

  require(capacity >= 1, "capacity must be >= 1")

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType =
    MapType(LongType, LongType, valueContainsNull = false)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case LongType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"misra_gries expects bigint, got ${t.simpleString}")
  }

  override def createAggregationBuffer(): mutable.LongMap[Long] =
    mutable.LongMap.empty[Long]

  /** Decrement-all by the overflow amount so the map shrinks back to at
    * most `capacity` keys (batched form of the classic one-at-a-time MG
    * decrement; identical guarantee). */
  private def shrink(buf: mutable.LongMap[Long]): Unit = {
    if (buf.size <= capacity) return
    // the (capacity+1)-th largest count is the decrement that removes at
    // least (size - capacity) keys
    val counts = buf.values.toArray
    java.util.Arrays.sort(counts)
    val dec = counts(counts.length - capacity - 1)
    val dead = buf.iterator.filter(_._2 <= dec).map(_._1).toArray
    dead.foreach(buf.remove)
    buf.mapValuesInPlace((_, v) => v - dec)
  }

  override def update(
      buf: mutable.LongMap[Long], input: InternalRow): mutable.LongMap[Long] = {
    val v = child.eval(input)
    if (v != null) {
      val k = v.asInstanceOf[Long]
      buf.update(k, buf.getOrElse(k, 0L) + 1L)
      shrink(buf)
    }
    buf
  }

  override def merge(
      buf: mutable.LongMap[Long], other: mutable.LongMap[Long]): mutable.LongMap[Long] = {
    other.foreach { case (k, c) => buf.update(k, buf.getOrElse(k, 0L) + c) }
    shrink(buf)
    buf
  }

  override def eval(buf: mutable.LongMap[Long]): Any = {
    // deterministic output: entries sorted by key
    val entries = buf.toArray.sortBy(_._1)
    new ArrayBasedMapData(
      new GenericArrayData(entries.map(_._1)),
      new GenericArrayData(entries.map(_._2)))
  }

  override def serialize(buf: mutable.LongMap[Long]): Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(4 + buf.size * 16)
    bb.putInt(buf.size)
    buf.foreach { case (k, c) => bb.putLong(k); bb.putLong(c) }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): mutable.LongMap[Long] = {
    val bb = java.nio.ByteBuffer.wrap(bytes)
    val n = bb.getInt
    val buf = mutable.LongMap.empty[Long]
    var i = 0
    while (i < n) { buf.update(bb.getLong, bb.getLong); i += 1 }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): MisraGriesSketch =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): MisraGriesSketch =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): MisraGriesSketch =
    copy(child = newChildren.head)
}

object SketchExpressions {
  import org.apache.spark.sql.GraftBridge

  /** Misra–Gries heavy-hitters aggregate: map<value, count-lower-bound>,
    * at most `capacity` entries; exact when capacity >= distinct values. */
  def misraGries(v: Column, capacity: Int): Column =
    GraftBridge.column(
      MisraGriesSketch(GraftBridge.expression(v), capacity).toAggregateExpression())
}
