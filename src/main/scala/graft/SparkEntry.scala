package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

import graft.queries.{AnalyticsQueries, CdcQueries, PipelineQueries, RelationalQueries}

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
    val enriched = queries("enrich_join")(spark, dir)
    val orders = sources.Tables.orders(spark, dir)
    enriched
      .join(orders.select(col("o_orderkey").as("order_key"), col("o_orderdate")), Seq("order_key"))
      .groupBy(window(col("o_orderdate"), "10 minutes"), col("region"), col("nation"))
      .agg(sum(col("total_price")).cast(DecimalType(38, 2)).as("total_due"))
      .select(col("window.start").as("order_period"), col("region"),
        col("nation"), col("total_due"))
  }

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    CdcQueries.queries ++ RelationalQueries.queries ++
      AnalyticsQueries.queries ++ PipelineQueries.queries

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted keys → rows-only check. */
  def oracleSql: Map[String, String] =
    CdcQueries.oracles ++ RelationalQueries.oracles ++
      AnalyticsQueries.oracles ++ PipelineQueries.oracles
}
