package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Codegen'd vector folds for the similarity/clustering hot paths.
  *
  * These replace the `aggregate(zip_with(...))` higher-order-function
  * formulations in `operators.Similarity` / `operators.Clustering`,
  * which evaluate a lambda per ELEMENT per row (HOFs have no
  * `doGenCode`; every element pays interpreted dispatch). The
  * contract is bit-identical arithmetic to the analyzed HOF tree per
  * element-type combination, so every DuckDB oracle and every spec
  * that pinned the HOF doubles stays valid:
  *
  *   - dot (float, float):  `acc += (double)(xf * yf)` — float
  *     multiply FIRST, widen after (zip_with multiplies in float,
  *     aggregate widens the element when adding to the double acc);
  *   - dot (float, double): `acc += ((double)xf) * yd` (the analyzer
  *     casts the float lambda variable before a double multiply);
  *   - distSq: `dx = widen(x) - widen(y); acc += dx * dx`;
  *   - fold order: sequential left fold, index 0 upward;
  *   - a null element, or a length mismatch, folds to null exactly as
  *     `zip_with` (null-padded) + `aggregate` (null-absorbing) does.
  */
abstract class VecFold extends BinaryExpression {
  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true

  protected final def elemType(e: Expression): DataType =
    e.dataType.asInstanceOf[ArrayType].elementType
  protected final def mayHaveNullElems: Boolean =
    left.dataType.asInstanceOf[ArrayType].containsNull ||
      right.dataType.asInstanceOf[ArrayType].containsNull

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(a, _), ArrayType(b, _))
          if Seq(a, b).forall(t => t == FloatType || t == DoubleType) =>
        TypeCheckResult.TypeCheckSuccess
      case _ => TypeCheckResult.TypeCheckFailure(
        s"$prettyName expects two array<float|double> arguments, " +
          s"got (${left.dataType.sql}, ${right.dataType.sql})")
    }

  /** Java source of the per-element accumulation into `acc`. */
  protected def termJava(a: String, b: String, i: String): String

  /** Scala twin of [[termJava]] for the interpreted path. */
  protected def termEval(a: ArrayData, b: ArrayData, i: Int): Double

  override def nullSafeEval(l: Any, r: Any): Any = {
    val a = l.asInstanceOf[ArrayData]
    val b = r.asInstanceOf[ArrayData]
    val n = a.numElements()
    if (n != b.numElements()) return null
    var acc = 0.0d
    var i = 0
    while (i < n) {
      if (a.isNullAt(i) || b.isNullAt(i)) return null
      acc += termEval(a, b, i)
      i += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val acc = ctx.freshName("acc")
      val nullCheck =
        if (mayHaveNullElems)
          s"if ($a.isNullAt($i) || $b.isNullAt($i)) { ${ev.isNull} = true; break; }"
        else ""
      s"""
         |final int $n = $a.numElements();
         |if ($n != $b.numElements()) {
         |  ${ev.isNull} = true;
         |} else {
         |  double $acc = 0.0;
         |  for (int $i = 0; $i < $n; $i++) {
         |    $nullCheck
         |    $acc += ${termJava(a, b, i)};
         |  }
         |  if (!${ev.isNull}) { ${ev.value} = $acc; }
         |}
       """.stripMargin
    })

  /** Widening element read, as the analyzer would cast it. */
  protected final def readJava(arr: String, i: String, t: DataType): String =
    if (t == FloatType) s"((double) $arr.getFloat($i))" else s"$arr.getDouble($i)"
  protected final def readEval(arr: ArrayData, i: Int, t: DataType): Double =
    if (t == FloatType) arr.getFloat(i).toDouble else arr.getDouble(i)
}

/** Sequential-left-fold dot product (see [[VecFold]] for the exact
  * arithmetic contract per element-type combination). */
case class VecDot(left: Expression, right: Expression) extends VecFold {
  override def prettyName: String = "vec_dot"

  override protected def termJava(a: String, b: String, i: String): String =
    (elemType(left), elemType(right)) match {
      // float multiply first, widen after — NOT the same double as
      // widening both operands
      case (FloatType, FloatType) =>
        s"((double) ($a.getFloat($i) * $b.getFloat($i)))"
      case (lt, rt) => s"${readJava(a, i, lt)} * ${readJava(b, i, rt)}"
    }

  override protected def termEval(a: ArrayData, b: ArrayData, i: Int): Double =
    (elemType(left), elemType(right)) match {
      case (FloatType, FloatType) => (a.getFloat(i) * b.getFloat(i)).toDouble
      case (lt, rt) => readEval(a, i, lt) * readEval(b, i, rt)
    }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): VecDot =
    copy(left = newLeft, right = newRight)
}

/** Sequential-left-fold squared L2 distance: both elements widen to
  * double, then `dx * dx` accumulates. */
case class VecDistSq(left: Expression, right: Expression) extends VecFold {
  override def prettyName: String = "vec_dist_sq"

  override protected def termJava(a: String, b: String, i: String): String = {
    val (lt, rt) = (elemType(left), elemType(right))
    val dx = s"(${readJava(a, i, lt)} - ${readJava(b, i, rt)})"
    s"($dx * $dx)"
  }

  override protected def termEval(a: ArrayData, b: ArrayData, i: Int): Double = {
    val dx = readEval(a, i, elemType(left)) - readEval(b, i, elemType(right))
    dx * dx
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): VecDistSq =
    copy(left = newLeft, right = newRight)
}
