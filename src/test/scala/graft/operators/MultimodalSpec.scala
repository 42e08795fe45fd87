package graft.operators

import graft.{SparkSpec, Tables}
import org.apache.spark.sql.functions._

class MultimodalSpec extends SparkSpec {
  import spark.implicits._

  test("decodeStub is deterministic and normalized") {
    val bytes = "hello-world".getBytes("UTF-8")
    val f1 = Multimodal.decodeStub(bytes)
    val f2 = Multimodal.decodeStub(bytes)
    assert(f1.toSeq == f2.toSeq)
    assert(f1.length == 8)
    assert(math.abs(f1.sum - 1.0f) < 1e-5)
    assert(Multimodal.decodeStub(Array.empty[Byte]).toSeq == Seq.fill(8)(0f))
  }

  test("extractFeatures keeps one feature row per input row") {
    val docs = Tables.load(spark, SparkSpec.tiny, "documents").limit(50)
    val out = Multimodal.extractFeatures(spark,
      Multimodal.attachFakeMedia(docs, "doc_id"), "doc_id")
    assert(out.count() == 50)
    val row = out.filter(col("doc_id") === 0).select("features")
      .as[Seq[Float]].head()
    assert(row.length == 8 && math.abs(row.sum - 1.0f) < 1e-4)
  }

  test("media metadata matches the modality") {
    val docs = Tables.load(spark, SparkSpec.tiny, "documents").limit(30)
    val m = Multimodal.attachFakeMedia(docs, "doc_id")
    val audio = m.filter(col("media_kind") === "audio")
      .select(col("media_meta.sample_rate"), col("media_meta.width"))
      .as[(Option[Int], Option[Int])].collect()
    assert(audio.nonEmpty && audio.forall { case (sr, w) =>
      sr.contains(16000) && w.isEmpty })
  }

  test("sampleFrames emits ceil(n_frames/stride) work units for videos only") {
    val docs = Tables.load(spark, SparkSpec.tiny, "documents").limit(30)
    val m = Multimodal.attachFakeMedia(docs, "doc_id")
    val frames = Multimodal.sampleFrames(m, "doc_id", 5)
    val counts = frames.groupBy("doc_id").count()
      .as[(Long, Long)].collect().toMap
    val videos = m.filter(col("media_kind") === "video")
      .select(col("doc_id"), col("media_meta.n_frames"))
      .as[(Long, Int)].collect()
    assert(videos.nonEmpty)
    videos.foreach { case (id, n) =>
      assert(counts(id) == (n - 1) / 5 + 1, s"doc $id n_frames=$n") }
    assert(counts.keySet == videos.map(_._1).toSet)
  }
}
