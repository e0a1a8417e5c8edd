package graft.queries

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Shared oracle-hash-stable arithmetic for the query files.
  *
  * The driver's comparator reads Spark parquet through pandas and the
  * DuckDB oracle through fetchdf, dtype-exact: a DECIMAL(38,x) output
  * column arrives as Python Decimal objects on one side and float64 on
  * the other and can NEVER hash-match (round-1 lesson). So: accumulate
  * in exact decimal (partition-order-independent), cast only the FINAL
  * value to DOUBLE (correctly rounded, deterministic) — both engines
  * then emit bit-identical float64. Any change to this convention must
  * be mirrored in every oracle's SQL.
  */
object QueryMath {

  def dec2(c: Column): Column = c.cast(DecimalType(18, 2))

  /** Exact decimal sum at scale 2 (money), surfaced as DOUBLE. */
  def sumDbl2(c: Column): Column = sum(dec2(c)).cast("double")

  /** Exact decimal sum at scale 6 (measures), surfaced as DOUBLE. */
  def sumDbl6(c: Column): Column =
    sum(c.cast(DecimalType(18, 6))).cast("double")

  /** Deterministic average: exact-decimal sum ÷ count (a plain
    * avg(double) is partition-order-dependent). */
  def avgDec2(c: Column): Column = sum(dec2(c)).cast("double") / count(lit(1))
}
