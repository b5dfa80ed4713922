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
}
