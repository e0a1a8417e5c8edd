package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, StringType, TimestampType}
import org.apache.spark.unsafe.types.UTF8String

/** Parses the compact CDC digit timestamp `yyyyMMddHHmmss[f...]` (14
  * digits + optional fractional-second digits) into a Spark timestamp
  * (microseconds since epoch, UTC).
  *
  * Re-expresses the scalar UDF of the reference
  * (`src/main/java/com/simonellistonball/flink/demos/DateParser.java:12`,
  * registered as `parseTs` in `StreamingJob.java:82`) as a native
  * Catalyst expression with whole-stage codegen: the generated code
  * calls the static [[ParseSqdataTs.parseUtf8]] — no boxing, no UDF
  * serialization, stays inside WholeStageCodegen spans.
  */
case class ParseSqdataTs(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType.isInstanceOf[StringType]) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"parse_sqdata_ts expects a string argument, got ${child.dataType}")
  override def dataType: DataType = TimestampType
  override def prettyName: String = "parse_sqdata_ts"

  override def nullSafeEval(input: Any): Any =
    ParseSqdataTs.parseUtf8(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.ParseSqdataTs.parseUtf8($c)")

  override protected def withNewChildInternal(newChild: Expression): ParseSqdataTs =
    copy(child = newChild)
}

object ParseSqdataTs {
  /** Days since 1970-01-01 for a proleptic-Gregorian date (civil →
    * epoch day, the classic era/yoe decomposition) — no java.time
    * allocation in the per-row hot path. */
  private def epochDay(y0: Int, m: Int, d: Int): Long = {
    val y = if (m <= 2) y0 - 1 else y0
    val era = (if (y >= 0) y else y - 399) / 400
    val yoe = y - era * 400
    val doy = (153 * (if (m > 2) m - 3 else m + 9) + 2) / 5 + d - 1
    val doe = yoe * 365 + yoe / 4 - yoe / 100 + doy
    era * 146097L + doe - 719468L
  }

  /** Parse `yyyyMMddHHmmss[f...]` → micros since epoch (UTC). Fraction
    * digits beyond 6 are truncated; fewer are zero-padded (matches the
    * reference's `S`-pattern semantics, which treats the tail as the
    * fractional part). Returns a boxed Long for codegen-free eval too. */
  def parseUtf8(s: UTF8String): Long = {
    val b = s.getBytes
    require(b.length >= 14, s"parse_sqdata_ts: need >=14 digits, got '$s'")
    @inline def d(i: Int): Int = b(i) - '0'
    val y = d(0) * 1000 + d(1) * 100 + d(2) * 10 + d(3)
    val mo = d(4) * 10 + d(5)
    val dd = d(6) * 10 + d(7)
    val h = d(8) * 10 + d(9)
    val mi = d(10) * 10 + d(11)
    val se = d(12) * 10 + d(13)
    var frac = 0L
    var i = 14
    val fracEnd = math.min(b.length, 20)
    while (i < fracEnd) { frac = frac * 10 + d(i); i += 1 }
    var scale = 20 - math.max(b.length, 14) // pad to micros (6 digits)
    while (scale > 0) { frac *= 10; scale -= 1 }
    val secs = epochDay(y, mo, dd) * 86400L + h * 3600L + mi * 60L + se
    secs * 1000000L + frac
  }
}
