package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Dev scratchpad (not part of the library surface). Currently: scale
  * probe — builds a 10x copy of sf0.1 (~sf1) in /tmp and times the
  * heavy queries to show near-linear scaling. */
object Scratch {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.local()
    val src = "/root/testdata/sf0.1"
    val dst = "/tmp/graft_sf1"
    if (!new java.io.File(s"$dst/lineitem.parquet").exists()) {
      def times10(df: DataFrame, shifts: Map[String, Long]): DataFrame =
        (0 until 10).map { c =>
          shifts.foldLeft(df) { case (d, (col0, base)) =>
            d.withColumn(col0, col(col0) + lit(c * base)) }
        }.reduce(_ unionByName _)
      val o = spark.read.parquet(s"$src/orders.parquet")
      val maxO = 10000000L
      times10(o, Map("o_orderkey" -> maxO, "o_custkey" -> 1000000L))
        .write.mode("overwrite").parquet(s"$dst/orders.parquet")
      val l = spark.read.parquet(s"$src/lineitem.parquet")
      times10(l, Map("l_orderkey" -> maxO))
        .write.mode("overwrite").parquet(s"$dst/lineitem.parquet")
      spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
      val ev = spark.read.parquet(s"$src/events.parquet")
      times10(ev, Map("event_id" -> 10000000L, "user_id" -> 100000L))
        .write.mode("overwrite").parquet(s"$dst/events.parquet")
      val docs = spark.read.parquet(s"$src/documents.parquet")
      times10(docs, Map("doc_id" -> 1000000L))
        .write.mode("overwrite").parquet(s"$dst/documents.parquet")
      val emb = spark.read.parquet(s"$src/embeddings.parquet")
      times10(emb, Map("vec_id" -> 1000000L))
        .write.mode("overwrite").parquet(s"$dst/embeddings.parquet")
      for (t <- Seq("customer", "supplier", "part", "nation", "region"))
        spark.read.parquet(s"$src/$t.parquet")
          .write.mode("overwrite").parquet(s"$dst/$t.parquet")
      println("SCALE data written")
    }
    val heavy = Seq("q1_pricing", "q3_shipping", "q5_supplier_volume", "tumble_agg",
      "session_agg", "asof_join", "range_join", "dedup_exact", "dedup_minhash_lsh",
      "embed_cosine_topk", "lang_id", "token_count", "cdc_latest_image", "window_rank")
    for (sf <- Seq(src, dst)) {
      // warm-up
      heavy.foreach(n => SparkEntry.queries(n)(spark, sf).write.format("noop").mode("overwrite").save())
      val times = heavy.map { n =>
        val t0 = System.nanoTime()
        SparkEntry.queries(n)(spark, sf).write.format("noop").mode("overwrite").save()
        n -> (System.nanoTime() - t0) / 1e9
      }
      println(s"SCALE $sf " + times.map { case (n, t) => f"$n=$t%.2f" }.mkString(" "))
    }
    spark.stop()
  }
}
