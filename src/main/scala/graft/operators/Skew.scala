package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Skew mitigation for shuffle joins on hot keys.
  *
  * AQE's skew-join split (on by default in GraftSession) handles most
  * skew at runtime by splitting oversized partitions. [[saltedJoin]]
  * is the explicit pre-AQE form for engines/paths AQE can't touch
  * (e.g. a skewed aggregation feeding a window, or a build side too
  * large to split): the skewed side spreads each key over `nSalts`
  * sub-keys, the other side replicates each row `nSalts` times, and
  * the join runs on (key, salt) — a hot key's rows land on `nSalts`
  * reducers instead of one.
  *
  * Cost: the replicated side's shuffle volume × nSalts — use for a
  * small-ish replicated side and genuinely hot keys, else AQE alone
  * is cheaper.
  */
object Skew {

  /** Inner equi-join `skewed ⋈ other` on `key`, salted `nSalts` ways.
    * Result rows are identical to a plain inner join. */
  def saltedJoin(skewed: DataFrame, other: DataFrame, key: String,
                 nSalts: Int): DataFrame = {
    // Deterministic spread: salt from a hash of the whole row (keyed
    // on all columns), not rand() — reruns and retries see the same
    // placement, which keeps shuffle-file reuse valid.
    val salted = skewed.withColumn("__salt",
      pmod(xxhash64(struct(skewed.columns.toSeq.map(col): _*)), lit(nSalts)).cast("int"))
    val replicated = other.withColumn("__salt",
      explode(array((0 until nSalts).map(lit): _*)))
    salted.join(replicated, Seq(key, "__salt")).drop("__salt")
  }
}
