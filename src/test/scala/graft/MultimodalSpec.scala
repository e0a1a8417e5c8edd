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
