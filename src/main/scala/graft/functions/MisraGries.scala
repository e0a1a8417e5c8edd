package graft.functions

import java.nio.ByteBuffer

import scala.collection.mutable

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StructField, StructType}

/** Misra–Gries heavy-hitters summary over a bigint item column as ONE
  * mergeable k-counter aggregate — the bounded-memory answer to "which
  * items exceed an n/(k+1) frequency share" that never shuffles the
  * vocabulary: each task keeps at most k (item, counter) pairs and
  * only partitions × k pairs cross the wire, versus an exact word
  * count whose shuffle payload is the whole key space.
  *
  * THE GUARANTEE (the part an engine can verify against itself,
  * B14-style): for any item, `est ≤ true_count` and
  * `true_count − est ≤ n/(k+1)` where n is the stream length — so
  * every item with `true_count · (k+1) > n` is guaranteed present in
  * the summary. Both bounds survive arbitrary merge trees (the
  * mergeable-summaries construction: sum counters pairwise, then
  * subtract the (k+1)-th largest combined counter from all and drop
  * the non-positive), so map-side partials, AQE re-plans, and any
  * partitioning produce a summary with the same contract — the SET of
  * surviving sub-threshold items may differ by merge order, but the
  * guaranteed items and both bounds never do, which is exactly what
  * the bounded-verification oracle checks.
  *
  * Update path: hit → +1; room → insert at 1; full → decrement all k
  * counters by 1 and drop zeros (O(k) only on un-tracked items at a
  * full table — the classic amortization). Eval emits
  * `array<struct<item, est>>` sorted by item for determinism of the
  * emitted frame itself.
  */
case class MisraGries(
    child: Expression, k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[mutable.LongMap[Long]] {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case LongType if k > 0 && k <= 100000 => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"mg_sketch expects a bigint item column and 0 < k <= 1e5, got $t / $k")
  }
  override def dataType: DataType = ArrayType(
    StructType(Seq(
      StructField("item", LongType, nullable = false),
      StructField("est", LongType, nullable = false))),
    containsNull = false)
  override def nullable: Boolean = false
  override def prettyName: String = "mg_sketch"
  override def children: Seq[Expression] = Seq(child)

  override def createAggregationBuffer(): mutable.LongMap[Long] =
    mutable.LongMap.empty[Long]

  override def update(buf: mutable.LongMap[Long], input: InternalRow): mutable.LongMap[Long] = {
    val v = child.eval(input)
    if (v == null) return buf
    val item = v.asInstanceOf[Long]
    // LongMap[Long].getOrNull boxes the primitive default (0L) so it can
    // NEVER be null — an Option match is the only absence test that keeps
    // the table bounded at k entries.
    buf.get(item) match {
      case Some(c) => buf.update(item, c + 1L)
      case None if buf.size < k => buf.update(item, 1L)
      case None =>
        // full table, un-tracked item: decrement every counter, drop zeros
        val dead = mutable.ArrayBuffer.empty[Long]
        buf.foreachEntry { (ky, c) =>
          if (c <= 1L) dead += ky else buf.update(ky, c - 1L)
        }
        dead.foreach(buf.remove)
    }
    buf
  }

  override def merge(buf: mutable.LongMap[Long],
                     other: mutable.LongMap[Long]): mutable.LongMap[Long] = {
    other.foreachEntry { (ky, c) =>
      buf.update(ky, buf.getOrElse(ky, 0L) + c)
    }
    if (buf.size > k) {
      // subtract the (k+1)-th largest counter from all; ≤ k survive
      val counts = buf.values.toArray
      java.util.Arrays.sort(counts)
      val kth = counts(counts.length - (k + 1)) // (k+1)-th largest
      val dead = mutable.ArrayBuffer.empty[Long]
      buf.foreachEntry { (ky, c) =>
        if (c <= kth) dead += ky else buf.update(ky, c - kth)
      }
      dead.foreach(buf.remove)
    }
    buf
  }

  override def eval(buf: mutable.LongMap[Long]): Any = {
    val entries = buf.toArray.sortBy(_._1)
    new GenericArrayData(entries.map { case (item, est) =>
      new GenericInternalRow(Array[Any](item, est)): Any
    })
  }

  override def serialize(buf: mutable.LongMap[Long]): Array[Byte] = {
    val bb = ByteBuffer.allocate(4 + 16 * buf.size)
    bb.putInt(buf.size)
    buf.foreachEntry { (ky, c) => bb.putLong(ky); bb.putLong(c) }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): mutable.LongMap[Long] = {
    val bb = ByteBuffer.wrap(bytes)
    val n = bb.getInt
    val buf = mutable.LongMap.empty[Long]
    var i = 0
    while (i < n) { val ky = bb.getLong; buf.update(ky, bb.getLong); i += 1 }
    buf
  }

  override def withNewMutableAggBufferOffset(o: Int): MisraGries =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): MisraGries =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): MisraGries =
    copy(child = newChildren.head)
}
