package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** 64-bit FNV-1a document fingerprint over the UTF-8 bytes of a string.
  *
  * A deterministic, codegen'd content fingerprint for large-scale
  * dedup bookkeeping: shuffling/joining on an 8-byte fingerprint moves
  * ~8 bytes per row instead of the document body. Collision rate at
  * 64 bits is negligible for candidate generation (verified pairs are
  * re-checked on content).
  */
case class Fingerprint64(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType.isInstanceOf[StringType]) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"fingerprint64 expects a string argument, got ${child.dataType}")
  override def dataType: DataType = LongType
  override def prettyName: String = "fingerprint64"

  override def nullSafeEval(input: Any): Any =
    Fingerprint64.fnv1a(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.Fingerprint64.fnv1a($c)")

  override protected def withNewChildInternal(newChild: Expression): Fingerprint64 =
    copy(child = newChild)
}

object Fingerprint64 {
  final val Offset = 0xcbf29ce484222325L
  final val Prime = 0x100000001b3L

  def fnv1a(s: UTF8String): Long = {
    val b = s.getBytes
    var h = Offset
    var i = 0
    while (i < b.length) {
      h ^= (b(i) & 0xffL)
      h *= Prime
      i += 1
    }
    h
  }
}
