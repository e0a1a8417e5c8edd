package graft

import org.apache.spark.sql.functions._
import graft.operators.Similarity

/** Dev probe (r13): where does pqTopK's time go at 10x scale, and how
  * do candidate encode formulations compare? Not part of the library
  * surface — a measurement harness like AnnProbe. */
object PqProbe {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.builder("local[32]", 32).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    GraftFunctions.register(spark)
    val dir = args.headOption.getOrElse("/tmp/bench10x")
    val emb = spark.read.parquet(s"$dir/embeddings.parquet")
    println(s"rows: ${emb.count()}")
    def time(tag: String)(fn: => Unit): Unit = {
      val runs = Seq.fill(3) {
        val t0 = System.nanoTime(); fn; (System.nanoTime() - t0) / 1e9
      }.sorted
      println(f"$tag%-28s min=${runs.head}%.3f median=${runs(1)}%.3f")
    }
    val books = Similarity.pqCodebooks(emb, "vec_id", "embedding", 4, 16, 64)
    time("codebooks (4 jobs)") {
      Similarity.pqCodebooks(emb, "vec_id", "embedding", 4, 16, 64)
    }
    time("encode structs (current)") {
      Similarity.withPqCodes(emb, "embedding", books)
        .select("vec_id", "pq_code_0", "pq_code_1", "pq_code_2", "pq_code_3")
        .write.format("noop").mode("overwrite").save()
    }
    // candidate: per subspace, scores as ONE transform over a 2-D
    // typedlit + array_position argmax (ties -> first = min cid)
    time("encode transform+argpos") {
      val d = (0 until 4).foldLeft(emb) { case (df, s) =>
        val cents2d = typedlit(books(s).map(_._2))
        val norms = typedlit(books(s).map(c =>
          math.sqrt(c._2.foldLeft(0.0)((a, x) => a + (x * x).toDouble))))
        df.withColumn(s"__sub_$s", slice(col("embedding"), s * 16 + 1, 16))
          .withColumn(s"__sc_$s", transform(sequence(lit(1), lit(16)),
            i => GraftFunctions.vec_dot(col(s"__sub_$s"),
              element_at(cents2d, i)) / element_at(norms, i)))
          .withColumn(s"pq_code_$s",
            array_position(col(s"__sc_$s"), array_max(col(s"__sc_$s"))))
      }
      d.select("vec_id", "pq_code_0", "pq_code_1", "pq_code_2", "pq_code_3")
        .write.format("noop").mode("overwrite").save()
    }
    val coded = Similarity.withPqCodes(emb, "embedding", books)
      .select("vec_id", "pq_code_0", "pq_code_1", "pq_code_2", "pq_code_3")
      .localCheckpoint()
    val queries = emb.filter(col("vec_id") < 8)
    time("probe over coded store") {
      Similarity.pqTopKCoded(coded, queries, "vec_id", "embedding", 10, books)
        .write.format("noop").mode("overwrite").save()
    }
    time("standing pqTopK end-to-end") {
      Similarity.pqTopK(emb, queries, "vec_id", "embedding", 10, books)
        .write.format("noop").mode("overwrite").save()
    }
    time("ivfTopK (current)") {
      Similarity.ivfTopK(emb, queries, "vec_id", "embedding", 10,
        nCentroids = 16, nProbe = 2)
        .write.format("noop").mode("overwrite").save()
    }
    val cents = Similarity.ivfCentroids(emb, "vec_id", "embedding", 16).toSeq
    time("ivfTopK assign barrier") {
      val assigned = Similarity.withIvfLists(emb, "embedding", cents)
        .localCheckpoint(false)
      Similarity.ivfTopKBucketed(assigned, queries, "vec_id", "embedding", 10,
        cents, nProbe = 2)
        .write.format("noop").mode("overwrite").save()
    }
    spark.stop()
  }
}
