package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** 64-bit SimHash over a token-hash array: bit i of the result is set
  * iff the sum over tokens of ±1 on bit i of the token hash is > 0 —
  * the Charikar sketch the dedup family bands on.
  *
  * r19 optimization (guide §4 — eliminate non-codegen expressions from
  * hot paths): the previous engine form folded
  * `aggregate(sequence(0,63), …, aggregate(th, …))`, i.e. 64
  * interpreted higher-order-function passes per document (HOFs are
  * CodegenFallback) — measured as 2.7 s of simhash_bit_balance's 2.8 s
  * sf0.1 median. This expression computes the identical signature in
  * ONE JIT-compiled pass per row, in-scan: no shuffle, no row
  * expansion, O(64·tokens) branch-free integer ops. Signatures are
  * bit-identical to the folded form (sums of ±1 integers are exact in
  * any order; DedupSpec pins equality, the DuckDB oracle replays the
  * same chain).
  *
  * NULL array → NULL (UnaryExpression nullSafeEval contract); callers
  * wanting the legacy "NULL text ⇒ signature 0" coalesce the input to
  * an empty array, which yields 0 (no positive bit sums) exactly like
  * the old fold's empty/NULL inner aggregate.
  */
case class SimHashSig(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"simhash_sig expects array<bigint>, got $t")
  }
  override def dataType: DataType = LongType
  override def prettyName: String = "simhash_sig"

  override def nullSafeEval(input: Any): Any =
    SimHashSig.signature(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.SimHashSig.signature($c)")

  override protected def withNewChildInternal(newChild: Expression): SimHashSig =
    copy(child = newChild)
}

object SimHashSig {
  /** One pass over the token hashes; 64 counters; sign bits out.
    * A NULL element (cannot arise from the fingerprint64(split(…))
    * chain, but the array type permits it) contributes -1 on every
    * bit, matching the old fold's `IF((shiftright(NULL,i)&1)=1,1,-1)`
    * = -1 (NULL condition takes the else branch). */
  def signature(hashes: ArrayData): Long = {
    val n = hashes.numElements()
    val counts = new Array[Int](64)
    var i = 0
    while (i < n) {
      if (hashes.isNullAt(i)) {
        var b = 0
        while (b < 64) { counts(b) -= 1; b += 1 }
      } else {
        val h = hashes.getLong(i)
        var b = 0
        while (b < 64) {
          counts(b) += (((h >>> b).toInt & 1) << 1) - 1 // +1 if bit set else -1
          b += 1
        }
      }
      i += 1
    }
    var sig = 0L
    var b = 0
    while (b < 64) {
      if (counts(b) > 0) sig |= (1L << b)
      b += 1
    }
    sig
  }
}
