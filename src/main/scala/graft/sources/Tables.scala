package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.expr

/** Typed loaders for the test star schema. Scans stay declarative so
  * Catalyst pushes filters/projections into the parquet reader —
  * `PlanSpec` asserts `PushedFilters`/`ReadSchema` on the hot queries.
  */
object Tables {
  def load(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  def region(s: SparkSession, d: String): DataFrame = load(s, d, "region")
  def nation(s: SparkSession, d: String): DataFrame = load(s, d, "nation")
  def customer(s: SparkSession, d: String): DataFrame = load(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame = load(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame = load(s, d, "part")
  def orders(s: SparkSession, d: String): DataFrame = load(s, d, "orders")
  def lineitem(s: SparkSession, d: String): DataFrame = load(s, d, "lineitem")
  /** `ts` arrives as TIMESTAMP(MICROS) in current testdata and Spark
    * reads it natively (NTZ or LTZ depending on isAdjustedToUTC).
    * Older generations wrote TIMESTAMP(NANOS), which Spark's reader
    * rejects at schema inference unless
    * `spark.sql.legacy.parquet.nanosAsLong=true` surfaces it as Long;
    * that conf is set ONLY on the rejection path below — loading µs
    * data never mutates session state. The Long branch truncates
    * ns→µs exactly like DuckDB does, so the oracle agrees
    * bit-for-bit with every physical shape (SourcesSpec writes all
    * three and asserts identical load output). */
  def events(s: SparkSession, d: String): DataFrame = {
    val raw =
      try load(s, d, "events")
      catch {
        case e: Exception if mentionsNanos(e, 0) =>
          s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
          load(s, d, "events")
      }
    raw.schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType =>
        raw.withColumn("ts", expr("timestamp_micros(ts div 1000)"))
      case org.apache.spark.sql.types.TimestampNTZType =>
        // normalize to TIMESTAMP (session TZ is pinned UTC, so this is
        // lossless) — downstream ops cast ts↔long epoch seconds, which
        // Spark forbids on NTZ
        raw.withColumn("ts", expr("to_timestamp_ltz(ts)"))
      case _ => raw
    }
  }

  /** True when the schema-inference failure is the TIMESTAMP(NANOS)
    * rejection ("Illegal Parquet type: INT64 (TIMESTAMP(NANOS,…))"),
    * anywhere in the cause chain. */
  private def mentionsNanos(e: Throwable, depth: Int): Boolean =
    e != null && depth < 8 && (
      Option(e.getMessage).exists(_.contains("NANOS")) ||
        (e.getCause ne e) && mentionsNanos(e.getCause, depth + 1))
  def documents(s: SparkSession, d: String): DataFrame = load(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = load(s, d, "embeddings")

  /** Restore scan parallelism over the driver's SINGLE-row-group
    * testdata files: one parquet row group = one Spark split = one
    * task, which serializes every downstream per-row transform (JSON
    * codec, gram hashing, regex) on one core until the first exchange.
    * A production lake writes many row groups and files, so splits
    * give this parallelism for free — and then this is a NO-OP: the
    * exchange is added only when the input plan has fewer than half
    * the cluster's cores in partitions, so the same call sites that
    * buy back local parallelism never round-robin-shuffle a corpus
    * that already arrives split. Use ONLY ahead of CPU-heavy decode
    * paths — cheap scans should keep their exchange-free plan. */
  def fanOut(df: DataFrame): DataFrame = {
    // a streaming frame has no static partition count (df.rdd would
    // throw); micro-batch parallelism comes from the source config
    if (df.isStreaming) return df
    val parallelism = df.sparkSession.sparkContext.defaultParallelism
    // physical-plan partition count of the input as it would execute
    // (no job is run; rdd construction only plans)
    if (df.rdd.getNumPartitions >= math.max(1, parallelism / 2)) df
    else df.repartition(parallelism)
  }
}
