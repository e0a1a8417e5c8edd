package graft.sources

import org.apache.spark.sql.{Column, DataFrame, SaveMode, SparkSession}

/** Read/write helpers beyond the parquet star schema: CSV and JSON
  * (schema'd round-trips), partitioned parquet, and bucketed tables
  * for co-located (exchange-free) joins.
  *
  * Scale notes: partitioned writes give partition PRUNING on read
  * (predicates on the partition column skip whole directories);
  * bucketed writes give co-located JOINS — two tables bucketed by the
  * same key into the same bucket count sort-merge-join with zero
  * exchange, the batch analogue of a co-partitioned stream join. At
  * 100 TB, bucketing the fact table by its main join key at write
  * time amortizes every subsequent join's shuffle.
  */
object Sinks {

  def writeCsv(df: DataFrame, path: String): Unit =
    df.write.mode(SaveMode.Overwrite).option("header", "true").csv(path)

  /** Schema'd CSV read — never infer on a 100 TB lake (inference
    * scans everything once before the real read). */
  def readCsv(spark: SparkSession, path: String,
              schema: org.apache.spark.sql.types.StructType): DataFrame =
    spark.read.option("header", "true").schema(schema).csv(path)

  def writeJson(df: DataFrame, path: String): Unit =
    df.write.mode(SaveMode.Overwrite).json(path)

  def readJson(spark: SparkSession, path: String,
               schema: org.apache.spark.sql.types.StructType): DataFrame =
    spark.read.schema(schema).json(path)

  /** ORC round-trip — the other columnar lake format Spark ships
    * natively; same pushdown/pruning machinery as parquet (predicate
    * pushdown + column pruning reach the ORC reader). */
  def writeOrc(df: DataFrame, path: String): Unit =
    df.write.mode(SaveMode.Overwrite).orc(path)

  def readOrc(spark: SparkSession, path: String): DataFrame =
    spark.read.orc(path)

  /** Raw text: one row per line — the ingest shape of undelimited
    * crawl dumps (each line a document/record to parse downstream). */
  def writeText(df: DataFrame, path: String): Unit =
    df.write.mode(SaveMode.Overwrite).text(path)

  def readText(spark: SparkSession, path: String): DataFrame =
    spark.read.text(path)

  /** Partitioned parquet: directory per partition-column value. */
  def writePartitioned(df: DataFrame, path: String, partitionCol: String): Unit =
    df.write.mode(SaveMode.Overwrite).partitionBy(partitionCol).parquet(path)

  /** Bucketed managed table (requires saveAsTable — bucket metadata
    * lives in the catalog). */
  def writeBucketed(df: DataFrame, table: String, bucketCol: String,
                    numBuckets: Int): Unit =
    df.write.mode(SaveMode.Overwrite)
      .bucketBy(numBuckets, bucketCol).sortBy(bucketCol)
      .format("parquet").saveAsTable(table)

  /** Training-shard writer: materializes the deterministic
    * pre-training shuffle (the `train_shuffle` ordering — a
    * multiplicative-hash key, shard = key mod `shards`, in-shard order
    * by (key, id)) as shard-partitioned parquet whose IN-FILE row
    * order IS the training order. A data loader then streams
    * `shard=N/part-*.parquet` front to back and sees the epoch
    * permutation with zero further sorting; re-running the write
    * reproduces byte-identical order (no RNG), which is what
    * epoch-resumable loaders and debugging-a-loss-spike both need.
    * Scale: shard count is the file-size knob (100 TB → millions of
    * ~1 GB shards); the only sort is per shard. */
  def writeTrainShards(df: DataFrame, path: String, idCol: String,
                       shards: Int): Unit = {
    import org.apache.spark.sql.functions.{col, lit, pmod}
    require(shards >= 1, s"shards ($shards) must be >= 1")
    // pmod, not %: ids above ~3.4e9 overflow the multiply (wrapping is
    // fine for a hash — it stays deterministic) and % would then yield
    // NEGATIVE __h/shard values — shard=-k directories and ~2x the
    // requested shard count, precisely in the billions-of-docs regime
    // this writer targets. pmod keeps both non-negative; for in-range
    // positive ids it equals the repo-wide % convention bit-for-bit.
    val h = pmod(col(idCol) * lit(2654435761L), lit(1000000007L))
    df.withColumn("__h", h)
      .withColumn("shard", pmod(col("__h"), lit(shards.toLong)))
      .repartition(shards, col("shard"))
      .sortWithinPartitions(col("shard"), col("__h"), col(idCol))
      .drop("__h")
      .write.mode(SaveMode.Overwrite).partitionBy("shard").parquet(path)
  }

  /** Z-ORDER clustered parquet: rows sorted by the Morton interleave
    * of both keys' 16-bit range-quantized values, so every file (and
    * row group) covers a compact RECTANGLE of the 2-D key space and
    * carries tight min/max stats on BOTH columns — point/range probes
    * on EITHER key prune most files, where [[writeClustered]]'s 1-D
    * sort prunes only its own key (the second column spans every
    * file). The multi-dimensional lake layout for tables probed by
    * more than one predicate (user × time, domain × quality, ...).
    *
    * The interleave is four mask-and-shift steps per key — all
    * codegen'd integer ops, scan-speed. Quantization bounds come from
    * one min/max aggregate (4 scalars to the driver — bounded
    * control-plane, the centroid-collect convention). Degenerate
    * (constant) keys quantize to 0 and degrade gracefully to the
    * other key's 1-D order. */
  def writeZOrdered(df: DataFrame, path: String, colA: String, colB: String,
                    numRanges: Int = 0): Unit = {
    import org.apache.spark.sql.functions._
    val row = df.agg(min(col(colA)), max(col(colA)),
      min(col(colB)), max(col(colB))).head()
    def d(i: Int): Double = row.get(i) match {
      case n: Number => n.doubleValue()
      case t: java.sql.Timestamp => t.getTime.toDouble
      case other => sys.error(s"writeZOrdered: non-numeric key $other")
    }
    def quant(c: Column, lo: Double, hi: Double): Column =
      if (hi <= lo) lit(0L)
      else least(lit(65535L),
        floor((c.cast("double") - lit(lo)) * 65535.0 / (hi - lo)).cast("long"))
    def spread(x: Column): Column = {
      var v = x
      v = v.bitwiseOR(shiftleft(v, 8)).bitwiseAND(lit(0x00FF00FFL))
      v = v.bitwiseOR(shiftleft(v, 4)).bitwiseAND(lit(0x0F0F0F0FL))
      v = v.bitwiseOR(shiftleft(v, 2)).bitwiseAND(lit(0x33333333L))
      v = v.bitwiseOR(shiftleft(v, 1)).bitwiseAND(lit(0x55555555L))
      v
    }
    val z = spread(quant(col(colA), d(0), d(1)))
      .bitwiseOR(shiftleft(spread(quant(col(colB), d(2), d(3))), 1))
    val parts =
      if (numRanges > 0) numRanges
      else df.sparkSession.sessionState.conf.numShufflePartitions
    df.withColumn("__z", z)
      .repartitionByRange(parts, org.apache.spark.sql.functions.col("__z"))
      .sortWithinPartitions("__z")
      .drop("__z")
      .write.mode(SaveMode.Overwrite).parquet(path)
  }

  /** Range-clustered parquet: global range partition + in-partition
    * sort on `keyCol`, so every file and row group carries tight
    * min/max stats on the key — point/range probes then prune to
    * O(result) row groups instead of decoding the table. This is the
    * write-time layout that makes probe-heavy and iterative workloads
    * (e.g. near-dup clustering over a bounded id slice) scale: pay the
    * sort once at ingest, prune on every subsequent read. */
  def writeClustered(df: DataFrame, path: String, keyCol: String,
                     numRanges: Int = 0): Unit = {
    import org.apache.spark.sql.functions.col
    val parts =
      if (numRanges > 0) numRanges
      else df.sparkSession.sessionState.conf.numShufflePartitions
    df.repartitionByRange(parts, col(keyCol))
      .sortWithinPartitions(keyCol)
      .write.mode(SaveMode.Overwrite).parquet(path)
  }
}
