package graft

import graft.operators.Multimodal
import graft.sources.Tables

/** Multimodal plumbing: typed schema, decode stub, frame sampling. */
class MultimodalSpec extends SparkTestBase {

  test("synthesize → decodeMeta preserves ids and derives byte counts") {
    val media = Multimodal.synthesize(Tables.documents(spark, sfDir))
    val metas = Multimodal.decodeMeta(media).collect()
    assert(metas.length == 500)
    val docs = Tables.documents(spark, sfDir)
      .select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    for (m <- metas.take(20)) {
      assert(m.n_bytes == docs(m.doc_id).getBytes("UTF-8").length)
      assert(m.pixels == m.width.toLong * m.height)
      assert(Set("png", "jpg", "wav").contains(m.format))
    }
  }

  test("resize: metadata exact, payload scaled by pixel ratio, deterministic") {
    val media = Multimodal.synthesize(Tables.documents(spark, sfDir))
    val resized = Multimodal.resize(media, targetW = 32, targetH = 24).collect()
    val orig = media.collect().map(r => r.doc_id -> r).toMap
    assert(resized.length == orig.size)
    for (r <- resized.take(30)) {
      assert(r.width == 32 && r.height == 24)
      val o = orig(r.doc_id)
      val ratio = (32L * 24).toDouble / (o.width.toLong * o.height)
      val expectLen = math.max(1,
        math.min(o.payload.length.toLong, math.round(o.payload.length * ratio)).toInt)
      assert(r.payload.length == expectLen, s"doc ${r.doc_id}")
      // strided resample: every output byte comes from the source
      assert(r.payload.toSet.subsetOf(o.payload.toSet + 0.toByte))
    }
    // deterministic: rerun bit-identical
    val again = Multimodal.resize(media, 32, 24).collect()
      .map(r => r.doc_id -> r.payload.toSeq).toMap
    assert(resized.forall(r => again(r.doc_id) == r.payload.toSeq))
  }

  test("extractFeatures: 16-bin byte histogram matches Scala recompute") {
    val media = Multimodal.synthesize(Tables.documents(spark, sfDir))
    val feats = Multimodal.extractFeatures(media).collect()
    val docs = Tables.documents(spark, sfDir).select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1).getBytes("UTF-8")).toMap
    assert(feats.length == docs.size)
    for (f <- feats.take(30)) {
      val bytes = docs(f.doc_id)
      assert(f.n_bytes == bytes.length)
      assert(f.hist.length == 16 && f.hist.sum == bytes.length)
      val expect = new Array[Long](16)
      bytes.foreach(b => expect((b & 0xFF) >> 4) += 1L)
      assert(f.hist.toSeq == expect.toSeq, s"doc ${f.doc_id}")
    }
  }

  test("sampleFrames amplifies rows with strided fixed-size slices") {
    val media = Multimodal.synthesize(Tables.documents(spark, sfDir))
    val frames = Multimodal.sampleFrames(media, frameSize = 32, stride = 2).collect()
    val byDoc = frames.groupBy(_.doc_id)
    val lens = Tables.documents(spark, sfDir).select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1).getBytes("UTF-8").length).toMap
    for ((doc, fs) <- byDoc.toSeq.sortBy(_._1).take(20)) {
      val expected = (0 until (lens(doc) / 32) by 2).toSeq
      assert(fs.map(_.frame_idx).sorted.toSeq == expected, s"doc $doc")
      assert(fs.forall(_.frame_bytes.length == 32))
    }
    assert(frames.length > 500) // genuinely amplifying
  }
}
