package graft.functions

import java.nio.ByteBuffer

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StructField, StructType}

/** Upper-triangle Gram (second-moment) matrix of an `array<bigint>`
  * vector column as ONE distributive aggregate — the statistic that
  * makes distributed PCA/covariance a map-side-combine problem
  * instead of a shuffle problem: `G[i][j] = Σ_rows v[i]·v[j]`
  * (i ≤ j), from which covariance is `G/n − μμᵀ` and the principal
  * components are a driver-side (dim × dim) eigensolve — bounded
  * control-plane work, like the k-means centroid fetch.
  *
  * The naive formulation double-explodes each row into dim²
  * (i, j, product) tuples before aggregating — a dim²× row
  * amplification through the shuffle (4096× at dim 64). Here each
  * task accumulates the dim(dim+1)/2 partial sums locally and ONLY
  * the triangle crosses the wire per partition: the shuffle payload
  * is partitions × dim²/2 longs, independent of row count.
  *
  * Inputs are caller-quantized longs (e.g. milli-units via
  * `floor(x·1000)`), so sums are integer-exact in any engine —
  * the oracle replays the same products. 63-bit headroom contract:
  * rows · qmax² < 2⁶³ (at milli-quantized unit-norm embeddings,
  * ~9·10¹² rows; shrink the quantization step or pre-aggregate per
  * shard beyond that). Ragged input dims throw rather than corrupt.
  *
  * Output: `array<struct<i, j, g>>` (i ≤ j), exploded by the caller.
  */
case class GramMatrix(
    child: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Long]] {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"gram_matrix expects array<bigint> (caller-quantized), got $t")
  }
  override def dataType: DataType = ArrayType(
    StructType(Seq(
      StructField("i", LongType, nullable = false),
      StructField("j", LongType, nullable = false),
      StructField("g", LongType, nullable = false))),
    containsNull = false)
  override def nullable: Boolean = false
  override def prettyName: String = "gram_matrix"
  override def children: Seq[Expression] = Seq(child)

  // buffer layout: [0] = dim, [1..] = row-major upper triangle
  override def createAggregationBuffer(): Array[Long] = Array(0L)

  override def update(buf: Array[Long], input: InternalRow): Array[Long] = {
    val v = child.eval(input)
    if (v == null) return buf
    val arr = v.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData]
    val d = arr.numElements()
    if (d == 0) return buf
    val b =
      if (buf(0) == 0L) {
        val nb = new Array[Long](1 + d * (d + 1) / 2)
        nb(0) = d.toLong
        nb
      } else {
        require(buf(0) == d.toLong,
          s"gram_matrix: ragged input dims (${buf(0)} vs $d)")
        buf
      }
    var pos = 1
    var i = 0
    while (i < d) {
      val vi = arr.getLong(i)
      var j = i
      while (j < d) {
        b(pos) += vi * arr.getLong(j)
        pos += 1
        j += 1
      }
      i += 1
    }
    b
  }

  override def merge(buf: Array[Long], other: Array[Long]): Array[Long] = {
    if (other(0) == 0L) return buf
    if (buf(0) == 0L) return other
    require(buf(0) == other(0),
      s"gram_matrix: ragged partial dims (${buf(0)} vs ${other(0)})")
    var i = 1
    while (i < buf.length) { buf(i) += other(i); i += 1 }
    buf
  }

  override def eval(buf: Array[Long]): Any = {
    val d = buf(0).toInt
    val out = new Array[Any](d * (d + 1) / 2)
    var pos = 1
    var i = 0
    while (i < d) {
      var j = i
      while (j < d) {
        out(pos - 1) = new GenericInternalRow(
          Array[Any](i.toLong, j.toLong, buf(pos)))
        pos += 1
        j += 1
      }
      i += 1
    }
    new GenericArrayData(out)
  }

  override def serialize(buf: Array[Long]): Array[Byte] = {
    val bb = ByteBuffer.allocate(4 + 8 * buf.length)
    bb.putInt(buf.length)
    var i = 0
    while (i < buf.length) { bb.putLong(buf(i)); i += 1 }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Array[Long] = {
    val bb = ByteBuffer.wrap(bytes)
    val n = bb.getInt
    val buf = new Array[Long](n)
    var i = 0
    while (i < n) { buf(i) = bb.getLong; i += 1 }
    buf
  }

  override def withNewMutableAggBufferOffset(o: Int): GramMatrix =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): GramMatrix =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): GramMatrix =
    copy(child = newChildren.head)
}
