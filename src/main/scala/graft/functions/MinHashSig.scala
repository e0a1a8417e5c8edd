package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** MinHash signature over a set of 64-bit element hashes: for each of
  * `numPerm` hash permutations, the minimum of `mix(h ^ seed_p)` over
  * the input set.
  *
  * The HOF formulation (`numPerm` × `array_min(transform(...))`)
  * materializes `numPerm` intermediate arrays per row; this native
  * expression makes ONE pass over the input, keeping `numPerm` running
  * minima in a stack array — O(n·numPerm) work, O(numPerm) memory, no
  * allocation beyond the output, and it stays inside whole-stage
  * codegen via a static call.
  */
case class MinHashSig(child: Expression, numPerm: Int) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) if numPerm > 0 && numPerm <= 1024 =>
      TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"minhash_sig expects array<bigint> and 0 < numPerm <= 1024, got $t / $numPerm")
  }
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "minhash_sig"

  override def nullSafeEval(input: Any): Any =
    MinHashSig.signature(input.asInstanceOf[ArrayData], numPerm)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.MinHashSig.signature($c, $numPerm)")

  override protected def withNewChildInternal(newChild: Expression): MinHashSig =
    copy(child = newChild)
}

object MinHashSig {
  /** splitmix64 finalizer — full-avalanche 64-bit mix. */
  @inline private def mix(x0: Long): Long = {
    var z = x0 + 0x9e3779b97f4a7c15L
    z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
    z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
    z ^ (z >>> 31)
  }

  /** Per-permutation seeds, themselves splitmix-derived. */
  private val seeds: Array[Long] = Array.tabulate(1024)(p => mix(0x5851f42d4c957f2dL * p))

  def signature(hashes: ArrayData, numPerm: Int): ArrayData = {
    val n = hashes.numElements()
    val mins = Array.fill(numPerm)(Long.MaxValue)
    var i = 0
    while (i < n) {
      val h = hashes.getLong(i)
      var p = 0
      while (p < numPerm) {
        val v = mix(h ^ seeds(p))
        if (v < mins(p)) mins(p) = v
        p += 1
      }
      i += 1
    }
    new GenericArrayData(mins)
  }
}
