package graft.llm

import graft.SparkSpec

/** Multimodal plumbing (builder-prompt mandate): schema, batching and the
  * deterministic stand-in decoder. */
class MultimodalSpec extends SparkSpec {
  import spark.implicits._

  private def docs = Seq((0L, "abc", 3L), (1L, "", 0L))
    .toDF("doc_id", "text", "n_chars")

  test("asMedia produces the binary+metadata schema") {
    val m = Multimodal.asMedia(docs)
    m.schema.fieldNames shouldBe Array("doc_id", "media", "meta")
    m.schema("media").dataType.typeName shouldBe "binary"
    val meta = m.where($"doc_id" === 0L).select("meta.kind", "meta.width").head()
    meta.getString(0) shouldBe "image/fake"
    meta.getInt(1) shouldBe 3
  }

  test("decodeFeatures computes per-payload features ('abc' = 97,98,99)") {
    val out = Multimodal.decodeFeatures(Multimodal.asMedia(docs))
      .orderBy("doc_id").collect()
    val r0 = out(0)
    r0.getLong(1) shouldBe 3L            // n_bytes
    r0.getDouble(2) shouldBe 98.0        // mean byte
    r0.getDouble(3) shouldBe 99.0        // max
    r0.getDouble(4) shouldBe 97.0        // min
  }

  test("decodeFeatures handles empty payloads without failing the task") {
    val r1 = Multimodal.decodeFeatures(Multimodal.asMedia(docs))
      .orderBy("doc_id").collect()(1)
    r1.getLong(1) shouldBe 0L
  }

  test("fakeDecodeFeatures handles null payload") {
    Multimodal.fakeDecodeFeatures(null) shouldBe Array(0.0, 0.0, 0.0, 0.0)
  }

  test("resize emits exactly w*h bytes and rewrites the metadata dims") {
    val big = Seq((0L, "x" * 100, 100L)).toDF("doc_id", "text", "n_chars")
    val out = Multimodal.resize(Multimodal.asMedia(big), w = 4, h = 3).head()
    out.getAs[Array[Byte]](1).length shouldBe 12
    val meta = out.getStruct(2)
    (meta.getInt(1), meta.getInt(2)) shouldBe ((4, 3))
    // empty payload stays empty, no task failure
    Multimodal.resize(Multimodal.asMedia(docs), 4, 3)
      .where($"doc_id" === 1L).head().getAs[Array[Byte]](1).length shouldBe 0
  }

  test("sampleFrames emits every stride-th frame with a short tail frame") {
    val big = Seq((7L, "a" * 25, 25L)).toDF("doc_id", "text", "n_chars")
    // 25 bytes / frame 10 → frames 0,1,2 (sizes 10,10,5); stride 2 → 0,2
    val out = Multimodal.sampleFrames(Multimodal.asMedia(big),
        frameBytes = 10, stride = 2)
      .orderBy("frame_idx").collect()
    out.map(_.getLong(1)) shouldBe Array(0L, 2L)
    out.map(_.getAs[Array[Byte]](2).length) shouldBe Array(10, 5)
    // empty payload → zero frames
    Multimodal.sampleFrames(Multimodal.asMedia(docs), 10, 2)
      .where($"doc_id" === 1L).count() shouldBe 0L
  }
}
