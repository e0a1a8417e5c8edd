package graft.functions

import java.nio.ByteBuffer

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** Top-k values of a bigint column as a bounded-min-heap aggregate.
  *
  * The scale-correct form of "top N per group": a window
  * `row_number() <= k` SORTS every partition (O(n log n) and full
  * materialization per group); this aggregate keeps a k-sized heap
  * per group with map-side partial aggregation — O(n log k) work,
  * O(k) state, and only k values per group cross the shuffle.
  *
  * Encode composite orderings into the long (e.g.
  * `price_cents * 1e9 + orderkey`) and decode after `explode`.
  * Output is sorted descending.
  */
case class TopK(
    child: Expression, k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[TopK.Heap] {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case LongType if k > 0 && k <= 100000 => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"top_k expects a bigint column and 0 < k <= 1e5, got $t / $k")
  }
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = false
  override def prettyName: String = "top_k"
  override def children: Seq[Expression] = Seq(child)

  override def createAggregationBuffer(): TopK.Heap = new TopK.Heap(k)

  override def update(buf: TopK.Heap, input: InternalRow): TopK.Heap = {
    val v = child.eval(input)
    if (v != null) buf.offer(v.asInstanceOf[Long])
    buf
  }

  override def merge(buf: TopK.Heap, other: TopK.Heap): TopK.Heap = {
    var i = 0
    while (i < other.size) { buf.offer(other.items(i)); i += 1 }
    buf
  }

  override def eval(buf: TopK.Heap): Any = {
    val out = java.util.Arrays.copyOf(buf.items, buf.size)
    java.util.Arrays.sort(out)
    // descending
    var i = 0; var j = out.length - 1
    while (i < j) { val t = out(i); out(i) = out(j); out(j) = t; i += 1; j -= 1 }
    new GenericArrayData(out)
  }

  override def serialize(buf: TopK.Heap): Array[Byte] = {
    val bb = ByteBuffer.allocate(4 + 8 * buf.size)
    bb.putInt(buf.size)
    var i = 0
    while (i < buf.size) { bb.putLong(buf.items(i)); i += 1 }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): TopK.Heap = {
    val bb = ByteBuffer.wrap(bytes)
    val n = bb.getInt
    val buf = new TopK.Heap(k)
    var i = 0
    while (i < n) { buf.offer(bb.getLong); i += 1 }
    buf
  }

  override def withNewMutableAggBufferOffset(o: Int): TopK =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): TopK =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): TopK =
    copy(child = newChildren.head)
}

object TopK {
  /** Binary min-heap of at most k longs: root = smallest survivor. */
  final class Heap(val k: Int) {
    val items: Array[Long] = new Array[Long](k)
    var size: Int = 0

    def offer(v: Long): Unit = {
      if (size < k) {
        items(size) = v; size += 1
        var i = size - 1
        while (i > 0 && items(i) < items((i - 1) / 2)) {
          val p = (i - 1) / 2
          val t = items(i); items(i) = items(p); items(p) = t
          i = p
        }
      } else if (v > items(0)) {
        items(0) = v
        var i = 0
        var done = false
        while (!done) {
          val l = 2 * i + 1; val r = 2 * i + 2
          var m = i
          if (l < size && items(l) < items(m)) m = l
          if (r < size && items(r) < items(m)) m = r
          if (m == i) done = true
          else { val t = items(i); items(i) = items(m); items(m) = t; i = m }
        }
      }
    }
  }
}
