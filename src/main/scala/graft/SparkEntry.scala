package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

import graft.queries.{AnalyticsQueries, CdcQueries, ClassicQueries, CorpusQueries, PipelineQueries, RelationalQueries, ScaleQueries, TrainingQueries}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  * Query keys follow SURVEY.md §2's inventory.
  */
object SparkEntry {

  /** Flagship: the reference pipeline end-to-end in batch form —
    * CDC changelog → latest-image enrichment → event-time enrichment
    * join → windowed revenue rollup (ref StreamingJob.java:66-135). */
  def entry(spark: SparkSession): DataFrame = {
    GraftFunctions.register(spark)
    val dir = "/root/testdata/sf0.001"
    // the reference chain (StreamingJob.java:112-135): orders enriched
    // through the latest-image dimension chain, then the 10-minute
    // tumbling revenue rollup of output.sql — one pipeline, dims
    // broadcast after dedup, single aggregation shuffle
    val custLatest = operators.Cdc
      .latestImage(sources.CdcEnvelope.customerChangelog(spark, dir), "c_custkey")
      .drop("op_ts", "seq", "manip")
      .withColumnRenamed("c_custkey", "o_custkey")
    import operators.EnrichmentJoin.enrich
    val withCust = enrich(sources.Tables.orders(spark, dir), custLatest, "o_custkey")
      .withColumnRenamed("c_nationkey", "n_nationkey")
    val withNation = enrich(withCust, sources.Tables.nation(spark, dir), "n_nationkey")
      .withColumnRenamed("n_regionkey", "r_regionkey")
    val enriched = enrich(withNation, sources.Tables.region(spark, dir), "r_regionkey")
    enriched
      .groupBy(window(col("o_orderdate"), "10 minutes"),
        col("r_name").as("region"), col("n_name").as("nation"))
      .agg(sum(col("o_totalprice").cast(DecimalType(18, 2)))
        .cast(DecimalType(38, 2)).as("total_due"))
      .select(col("window.start").as("order_period"), col("region"),
        col("nation"), col("total_due"))
  }

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    CdcQueries.queries ++ RelationalQueries.queries ++
      AnalyticsQueries.queries ++ PipelineQueries.queries ++
      TrainingQueries.queries ++ CorpusQueries.queries ++ ScaleQueries.queries ++
      ClassicQueries.queries

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted keys → rows-only check. */
  def oracleSql: Map[String, String] =
    CdcQueries.oracles ++ RelationalQueries.oracles ++
      AnalyticsQueries.oracles ++ PipelineQueries.oracles ++
      TrainingQueries.oracles ++ CorpusQueries.oracles ++ ScaleQueries.oracles ++
      ClassicQueries.oracles
}
