package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Complex-event-processing style sequential pattern matching over
  * event frames — the batch expression of the pattern API a streaming
  * CEP engine (Flink CEP being the reference-adjacent example) builds
  * its NEXT/FOLLOWED-BY chains from.
  */
object Cep {

  /** Skip-till-next-match episode detection: for every event whose
    * type equals `steps.head` (the trigger), greedily bind each
    * subsequent step to the EARLIEST same-key event of that type
    * at-or-after the previously bound step, and flag the episode
    * `completed` when the last step closes within `windowSecs` of the
    * trigger. Ties at the same instant bind the smallest `idCol`
    * (the forward as-of contract), so episodes are engine-exact and a
    * SQL oracle can replay every binding as min-over-candidates.
    *
    * This is the per-event sequential lookup a funnel's stage
    * populations can't answer ("which click did THIS impression
    * convert through, and when") — greedy next-match is the
    * deterministic core of CEP's skip-till-next strategy; events
    * between bound steps are skipped, never re-bound.
    *
    * Output: the trigger columns plus, per later step i (1-based),
    * `s{i}_ts` / `s{i}_id` (null where the chain dangles), and
    * `completed`. Once a step dangles, all later steps dangle.
    *
    * Scale: each step is ONE forward as-of join — a key-shuffled
    * union + running-last window over (events of that type + the
    * bound frame), NEVER a per-pair self-join; cost is linear in
    * events per step with a fixed small step count, the same posture
    * as chained enrichment. Dangling rows leave the chain before the
    * next step's shuffle. */
  def nextMatchEpisodes(events: DataFrame, keyCol: String, tsCol: String,
                        idCol: String, typeCol: String, steps: Seq[String],
                        windowSecs: Long): DataFrame = {
    require(steps.size >= 2, s"need at least trigger + 1 step, got $steps")
    // Repeated step types are rejected, not silently mis-bound: each step
    // binds at-or-after the previous binding's TIMESTAMP without excluding
    // the previously bound event id, so a pattern like view,click,click
    // could bind one tied-timestamp click to two consecutive steps — not
    // valid skip-till-next semantics. Distinct types make the at-or-after
    // bind exact (a different type can never rebind the previous event).
    require(steps.distinct.size == steps.size,
      s"steps must be distinct event types (skip-till-next binds at-or-after " +
        s"the previous step's ts and would re-bind a tied event), got $steps")
    val trigger = events.filter(col(typeCol) === steps.head)
      .select(col(idCol).as("trigger_id"), col(keyCol).as("k"),
        col(tsCol).cast("timestamp").as("trigger_ts"))
    var bound = trigger
    var prevTs = "trigger_ts"
    var dangling = Vector.empty[DataFrame]
    steps.zipWithIndex.drop(1).foreach { case (st, i) =>
      val side = events.filter(col(typeCol) === st)
        .select(col(keyCol).as(s"s${i}_k"),
          col(tsCol).cast("timestamp").as(s"s${i}_ts"),
          col(idCol).as(s"s${i}_id"))
      val joined = AsOfJoin.leftAsOfForward(bound, side,
        "k", s"s${i}_k", prevTs, s"s${i}_ts",
        Seq(s"s${i}_ts", s"s${i}_id"), Seq(s"s${i}_id"))
      // rows that dangle here keep nulls for every later step and
      // skip the remaining shuffles
      dangling = dangling :+ joined.filter(col(s"s${i}_ts").isNull)
      bound = joined.filter(col(s"s${i}_ts").isNotNull)
      prevTs = s"s${i}_ts"
    }
    val lastTs = s"s${steps.size - 1}_ts"
    val all = (bound +: dangling)
      .reduce(_.unionByName(_, allowMissingColumns = true))
    val stepCols = (1 until steps.size)
      .flatMap(i => Seq(col(s"s${i}_ts"), col(s"s${i}_id")))
    all.select((col("trigger_id") +: col("k").as(keyCol) +:
        col("trigger_ts") +: stepCols) :+
        (col(lastTs).isNotNull &&
          (col(lastTs).cast("long") - col("trigger_ts").cast("long")
            <= windowSecs)).as("completed"): _*)
  }
}
