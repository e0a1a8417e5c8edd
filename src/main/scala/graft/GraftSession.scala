package graft

import org.apache.spark.sql.SparkSession

/** Opinionated session factory for the graft engine.
  *
  * Scale posture (same knobs a 1000-executor deployment would tune,
  * expressed for local[N]):
  *   - AQE on: runtime shuffle-partition coalescing, skew-join
  *     splitting, dynamic broadcast conversion.
  *   - shuffle.partitions sized to cores, not the 200 default.
  *   - UTC session TZ so results are oracle-comparable.
  */
object GraftSession {
  def builder(master: String, shufflePartitions: Int): SparkSession.Builder =
    SparkSession.builder()
      .master(master)
      .appName("graft")
      .withExtensions(new GraftExtensions)
      .config("spark.sql.shuffle.partitions", shufflePartitions.toString)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
      .config("spark.sql.adaptive.skewJoin.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      // NOTE: no spark.sql.legacy.parquet.nanosAsLong here — legacy
      // TIMESTAMP(NANOS) events data is detected and handled inside
      // Tables.events, scoped to the rejection path only.
      .config("spark.ui.enabled", "false")

  def local(cores: Int = Runtime.getRuntime.availableProcessors()): SparkSession = {
    val s = builder(s"local[$cores]", cores).getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    GraftFunctions.register(s)
    s
  }
}
