package graft

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.functions.call_function

import org.apache.spark.sql.catalyst.expressions.{BloomFilterMightContain, Literal}

import graft.functions.{Fingerprint64, GramMatrix, MinHashSig, MisraGries, ParseSqdataTs, ReservoirSample, SimHashSig, TopK, VecDistSq, VecDot}

/** Registration + Column-API surface for graft's native Catalyst
  * expressions. Registration is idempotent; every `SparkEntry.queries`
  * entry calls [[register]] first so the functions resolve regardless
  * of how the session was built (the driver's `Verify`/`Bench` build
  * their own sessions without [[GraftExtensions]]).
  */
object GraftFunctions {

  def register(spark: SparkSession): Unit = {
    val reg = spark.sessionState.functionRegistry
    reg.createOrReplaceTempFunction(
      "parse_sqdata_ts", exprs => ParseSqdataTs(exprs.head), "built-in")
    reg.createOrReplaceTempFunction(
      "fingerprint64", exprs => Fingerprint64(exprs.head), "built-in")
    reg.createOrReplaceTempFunction(
      "minhash_sig", exprs => MinHashSig(exprs.head,
        exprs(1).asInstanceOf[Literal].value.asInstanceOf[Int]), "built-in")
    reg.createOrReplaceTempFunction(
      "simhash_sig", exprs => SimHashSig(exprs.head), "built-in")
    reg.createOrReplaceTempFunction(
      "reservoir_sample", exprs => ReservoirSample(exprs.head,
        exprs(1).asInstanceOf[Literal].value.asInstanceOf[Int]), "built-in")
    reg.createOrReplaceTempFunction(
      "top_k", exprs => TopK(exprs.head,
        exprs(1).asInstanceOf[Literal].value.asInstanceOf[Int]), "built-in")
    reg.createOrReplaceTempFunction(
      "gram_matrix", exprs => GramMatrix(exprs.head), "built-in")
    reg.createOrReplaceTempFunction(
      "mg_sketch", exprs => MisraGries(exprs.head,
        exprs(1).asInstanceOf[Literal].value.asInstanceOf[Int]), "built-in")
    reg.createOrReplaceTempFunction(
      "vec_dot", exprs => VecDot(exprs.head, exprs(1)), "built-in")
    reg.createOrReplaceTempFunction(
      "vec_dist_sq", exprs => VecDistSq(exprs.head, exprs(1)), "built-in")
    // Spark's internal bloom-membership predicate (the one runtime
    // row-level filtering plans), surfaced so a driver-built
    // util.sketch.BloomFilter literal can prefilter a scan
    reg.createOrReplaceTempFunction(
      "bloom_might_contain",
      exprs => BloomFilterMightContain(exprs.head, exprs(1)), "built-in")
  }

  /** `yyyyMMddHHmmss[f...]` digit string → timestamp (ref DateParser). */
  def parse_sqdata_ts(c: Column): Column = call_function("parse_sqdata_ts", c)

  /** 64-bit FNV-1a content fingerprint. */
  def fingerprint64(c: Column): Column = call_function("fingerprint64", c)

  /** MinHash signature (`numPerm` minima) over an array<bigint> of
    * element hashes — one pass, no intermediate arrays. */
  def minhash_sig(c: Column, numPerm: Int): Column =
    call_function("minhash_sig", c, org.apache.spark.sql.functions.lit(numPerm))

  /** 64-bit SimHash over an array<bigint> of token hashes — one
    * JIT-compiled pass per row, in-scan (see functions.SimHashSig;
    * replaces the 64-pass interpreted HOF fold). */
  def simhash_sig(c: Column): Column = call_function("simhash_sig", c)

  /** Uniform k-reservoir sample aggregate over a bigint column — one
    * pass, k-sized state, distributed merge (no sort, no shuffle of
    * the data being sampled). */
  def reservoir_sample(c: Column, k: Int): Column =
    call_function("reservoir_sample", c, org.apache.spark.sql.functions.lit(k))

  /** Top-k bigints per group via a bounded min-heap aggregate — the
    * O(n log k) / k-state replacement for sort-based window ranking. */
  def top_k(c: Column, k: Int): Column =
    call_function("top_k", c, org.apache.spark.sql.functions.lit(k))

  /** Upper-triangle Gram matrix aggregate over caller-quantized
    * `array<bigint>` vectors — the map-side-combining statistic
    * behind distributed PCA/covariance (see functions.GramMatrix:
    * only dim²/2 longs per partition cross the shuffle). */
  def gram_matrix(c: Column): Column = call_function("gram_matrix", c)

  /** Misra–Gries k-counter heavy-hitters summary over a bigint item
    * column — `array<struct<item, est>>` with the mergeable
    * guarantee est ≤ true ≤ est + n/(k+1) (see functions.MisraGries:
    * only partitions × k pairs cross the shuffle, never the
    * vocabulary). */
  def mg_sketch(c: Column, k: Int): Column =
    call_function("mg_sketch", c, org.apache.spark.sql.functions.lit(k))

  /** Codegen'd sequential-fold dot product over two float/double
    * arrays — bit-identical to `aggregate(zip_with(a, b, _*_), 0d,
    * _+_)` but a tight generated loop (see functions.VecFold). */
  def vec_dot(a: Column, b: Column): Column = call_function("vec_dot", a, b)

  /** Codegen'd sequential-fold squared L2 distance (both elements
    * widened to double). */
  def vec_dist_sq(a: Column, b: Column): Column =
    call_function("vec_dist_sq", a, b)

  /** Membership test of a bigint column against a serialized
    * `org.apache.spark.util.sketch.BloomFilter` (Spark's internal
    * `BloomFilterMightContain` predicate). False positives at the
    * filter's fpp; never false negatives. */
  def bloom_might_contain(bloomBytes: Array[Byte], c: Column): Column =
    call_function("bloom_might_contain",
      org.apache.spark.sql.functions.lit(bloomBytes), c)
}
