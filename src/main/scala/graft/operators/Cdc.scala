package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** CDC materialization operators — the batch/Spark expression of the
  * reference's keyed `ValueState` upsert semantics
  * (`EnrichmentJoin.java:64`: latest row per key wins; a delete
  * tombstone removes the key).
  *
  * Scale: latest-image is one shuffle on the key (window partition);
  * at 100 TB the changelog is typically date-partitioned, so the
  * window runs per partition after partition pruning. No collect, no
  * driver state.
  */
object Cdc {

  /** Newest non-tombstoned row per key, ordered by (opTs, seq). */
  def latestImage(changelog: DataFrame, key: String,
                  opTs: String = "op_ts", seq: String = "seq",
                  manip: String = "manip"): DataFrame = {
    val w = Window.partitionBy(col(key)).orderBy(col(opTs).desc, col(seq).desc)
    changelog
      .withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1 && col(manip) =!= "D")
      .drop("__rn")
  }

  /** Change-volume profile per manip type (I/U/D). */
  def changelogStats(changelog: DataFrame, key: String,
                     manip: String = "manip"): DataFrame =
    changelog.groupBy(col(manip).as("manip_type")).agg(
      count(lit(1)).as("n_changes"),
      countDistinct(col(key)).as("n_keys"))
}
