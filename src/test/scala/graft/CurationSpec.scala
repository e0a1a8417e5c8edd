package graft

import org.apache.spark.sql.functions._

import graft.operators.{Dedup, TextAnalysis}
import graft.sources.Tables

/** Integration: the operators composed as an actual curation pipeline
  * — quality filter → exact dedup → near-dup clustering → benchmark
  * decontamination → train/val/test split — the end-to-end flow a
  * training-data user runs. Each stage is the library call a 100 TB
  * deployment would make; the assertions are the invariants that flow
  * must preserve. */
class CurationSpec extends SparkTestBase {

  test("curation pipeline: filter → dedup → decontaminate → split invariants") {
    val docs = Tables.documents(spark, sfDir).select(col("doc_id"), col("text"))
    val total = docs.count()

    // 1. quality filter (keep decision + reasons)
    val quality = TextAnalysis.qualityFilter(docs, "text", "doc_id").cache()
    val kept = quality.filter(col("keep")).select("doc_id")
    val nKept = kept.count()
    assert(nKept > 0 && nKept <= total)
    // every rejection carries a reason; every keep carries none
    assert(quality.filter(!col("keep") && col("reason").isNull).count() == 0)
    assert(quality.filter(col("keep") && col("reason").isNotNull).count() == 0)

    val corpus = docs.join(kept, "doc_id").cache()

    // 2. exact dedup (content-hash survivors)
    val exactSurvivors = Dedup.exact(corpus, "text", "doc_id")
    val nExact = exactSurvivors.count()
    assert(nExact > 0 && nExact <= nKept)

    // 3. near-dup clustering: keep each cluster's canonical only
    val pairs = Dedup.minhashLsh(corpus, "text", "doc_id", minBp = 8000)
    val clusters = Dedup.clusterPairs(pairs, "doc_a", "doc_b")
    val nonCanonical = clusters.filter(col("doc_id") =!= col("canonical_id"))
      .select("doc_id")
    val afterNearDup = exactSurvivors
      .join(nonCanonical.withColumnRenamed("doc_id", "nd"),
        col("doc_id") === col("nd"), "left_anti")
    val nNearDup = afterNearDup.count()
    assert(nNearDup <= nExact)

    // 3b. span-level trim of the remaining cross-doc duplication:
    // doc-level near-dup removal keeps one doc per cluster, but
    // boilerplate SPANS shared across different kept docs remain —
    // trim them, and only them
    val keptDocs = corpus.join(afterNearDup.select("doc_id"), "doc_id")
    val spans = Dedup.dupSpanIntervals(keptDocs, "text", "doc_id", n = 6)
    val trimmed = Dedup.trimSpans(keptDocs, spans, "text", "doc_id").cache()
    assert(trimmed.count() == nNearDup) // trim never drops documents
    // dropped tokens are exactly the span totals, docs without spans
    // are untouched
    val spanTotals = spans.groupBy("doc_id")
      .agg(sum(col("span_tokens")).as("tot")).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    trimmed.select("doc_id", "n_dropped_tokens").collect().foreach { r =>
      assert(r.getLong(1) == spanTotals.getOrElse(r.getLong(0), 0L))
    }

    // 4. decontamination against a held-out probe slice — run on the
    // TRIMMED corpus: span trimming is a pipeline STAGE (what ships
    // downstream is the trimmed text), not a side measurement. A
    // probe doc that survived to here keeps every 8-gram outside its
    // duplicated spans, so the probe overlap still flags it.
    val survivors = trimmed.select(col("doc_id"), col("text"))
    val probe = docs.filter(col("doc_id") % 97 === 0)
    val contaminated = Dedup.contaminatedDocs(survivors, probe, "text", "doc_id", n = 8)
    val clean = survivors.join(
      contaminated.select(col("doc_id").as("bad")),
      col("doc_id") === col("bad"), "left_anti")
    val nClean = clean.count()
    assert(nClean <= nNearDup)
    // the probe docs themselves (still in the corpus) must be flagged
    val probeSurvivors = survivors.join(probe.select("doc_id"), "doc_id").count()
    if (probeSurvivors > 0)
      assert(contaminated.count() >= probeSurvivors)

    // 5. deterministic split partitions the final corpus
    val bucket = (col("doc_id") * lit(2654435761L)) % lit(1000000007L) % lit(100)
    val split = clean.select(col("doc_id"),
      when(bucket < 80, lit("train")).when(bucket < 90, lit("val"))
        .otherwise(lit("test")).as("split")).cache()
    val bySplit = split.groupBy("split").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(bySplit.values.sum == nClean)
    assert(bySplit.keySet.subsetOf(Set("train", "val", "test")))
    // rerun → identical assignment (no RNG anywhere in the flow)
    val again = clean.select(col("doc_id"),
      when(bucket < 80, lit("train")).when(bucket < 90, lit("val"))
        .otherwise(lit("test")).as("split"))
    assert(split.exceptAll(again).count() == 0)

    quality.unpersist(); corpus.unpersist(); split.unpersist()
    trimmed.unpersist()
  }

  test("crawl front-end: HTML extract → cross-doc line dedup strips shared chrome") {
    // every page shares nav + footer chrome around a unique body —
    // the shape raw crawl HTML actually has. Extraction must keep the
    // line structure, line dedup must remove exactly the chrome.
    val docs = Tables.documents(spark, sfDir).select(col("doc_id"), col("text"))
    val total = docs.count()
    val raw = docs.select(col("doc_id"), concat(
      lit("<html><body><div class=\"nav\">Home | About | Contact</div><p>"),
      col("text"),
      lit("</p><div class=\"footer\">Copyright &amp; Example Co</div></body></html>"))
      .as("html"))
    val extracted = raw.select(col("doc_id"),
      TextAnalysis.stripHtml(col("html")).as("text"))
    assert(extracted.filter(col("text").contains("Home | About | Contact"))
      .count() == total)
    val withLines = extracted
      .select(col("doc_id"), split(col("text"), "\n").as("lines"))
    val cleaned = Dedup.stripCommonLines(withLines, "lines", "doc_id", maxDocs = 50)
    assert(cleaned.count() == total)
    assert(cleaned.filter(col("text_clean").contains("Home | About")).count() == 0)
    assert(cleaned.filter(col("text_clean").contains("Copyright & Example"))
      .count() == 0)
    // ...and the body text came through the whole front-end EXACTLY
    val restored = cleaned.join(docs, "doc_id")
      .filter(col("text_clean") === col("text")).count()
    assert(restored == total)
  }
}
