package graft.functions

import java.nio.ByteBuffer

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** Uniform reservoir sample of `k` values (Algorithm R, with
  * distributed merge) as a `TypedImperativeAggregate`.
  *
  * The 100 TB sampling primitive: a uniform k-sample of a petabyte
  * table costs one pass + one k-sized buffer per partition + a
  * k-merge on the reducer — no global shuffle, no sort, no
  * `ORDER BY rand() LIMIT k` (which sorts everything). Per-group
  * usage samples each group independently (`GROUP BY lang`).
  *
  * Merge weights each side's reservoir by the row count it
  * represents, preserving uniformity. RNG is seeded from the running
  * counts — deterministic per (partition content, merge order); the
  * SAMPLE itself is order-sensitive like every distributed sampler,
  * so checks are statistical (see ReservoirSpec).
  */
case class ReservoirSample(
    child: Expression, k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[ReservoirSample.Buffer] {

  import ReservoirSample.Buffer

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case LongType if k > 0 && k <= 100000 => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"reservoir_sample expects a bigint column and 0 < k <= 1e5, got $t / $k")
  }
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = false
  override def prettyName: String = "reservoir_sample"
  override def children: Seq[Expression] = Seq(child)

  override def createAggregationBuffer(): Buffer = new Buffer(k)

  override def update(buf: Buffer, input: InternalRow): Buffer = {
    val v = child.eval(input)
    if (v != null) buf.add(v.asInstanceOf[Long])
    buf
  }

  override def merge(buf: Buffer, other: Buffer): Buffer = { buf.mergeWith(other); buf }

  override def eval(buf: Buffer): Any =
    new GenericArrayData(java.util.Arrays.copyOf(buf.items, math.min(buf.filled, k)))

  override def serialize(buf: Buffer): Array[Byte] = {
    val bb = ByteBuffer.allocate(8 + 4 + 8 * math.min(buf.filled, k))
    bb.putLong(buf.seen).putInt(math.min(buf.filled, k))
    var i = 0
    while (i < math.min(buf.filled, k)) { bb.putLong(buf.items(i)); i += 1 }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Buffer = {
    val bb = ByteBuffer.wrap(bytes)
    val buf = new Buffer(k)
    buf.seen = bb.getLong
    buf.filled = bb.getInt
    var i = 0
    while (i < buf.filled) { buf.items(i) = bb.getLong; i += 1 }
    buf
  }

  override def withNewMutableAggBufferOffset(o: Int): ReservoirSample =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): ReservoirSample =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): ReservoirSample =
    copy(child = newChildren.head)
}

object ReservoirSample {

  /** Mutable reservoir: `items` holds the current sample, `seen` the
    * rows it represents. RNG state advances per draw and reseeds from
    * the counts on deserialize — self-contained, serialization-stable. */
  final class Buffer(val k: Int) {
    var seen: Long = 0L
    var filled: Int = 0
    val items: Array[Long] = new Array[Long](k)
    private var rng: Long = 0x5deece66dL

    private def nextRand(bound: Long): Long = {
      rng ^= rng >>> 12; rng ^= rng << 25; rng ^= rng >>> 27
      java.lang.Math.floorMod(rng * 0x2545f4914f6cdd1dL, bound)
    }

    def add(v: Long): Unit = {
      seen += 1
      rng ^= v * 0x9e3779b97f4a7c15L // fold data into the stream
      if (filled < k) { items(filled) = v; filled += 1 }
      else {
        val j = nextRand(seen) // Algorithm R: keep with prob k/seen
        if (j < k) items(j.toInt) = v
      }
    }

    /** Weighted merge: an incoming sample element represents
      * other.seen/oN source rows; it displaces a slot with probability
      * other.seen/total, keeping the combined reservoir uniform. */
    def mergeWith(other: Buffer): Unit = {
      val oN = math.min(other.filled, other.k)
      val total = seen + other.seen
      var i = 0
      while (i < oN) {
        val v = other.items(i)
        if (filled < k) { items(filled) = v; filled += 1 }
        else if (nextRand(total) < other.seen) items(nextRand(k).toInt) = v
        i += 1
      }
      seen = total
    }
  }
}
