package graft.llm

import graft.SparkSpec

/** Token-budget shard packing: hand-computed layout, per-stratum
  * independence, boundary-straddle rule, partition invariance. */
class PackingSpec extends SparkSpec {
  import spark.implicits._

  test("packShards lays documents into budgeted shards by start offset") {
    // source a: tokens 3,4,5 → starts 0,3,7 → budget 5 → shards 0,0,1
    // source b: tokens 6,2   → starts 0,6   → shards 0,1 (own numbering)
    val docs = Seq(
      (0L, "a", "t t t"),
      (1L, "a", "t t t t"),
      (2L, "a", "t t t t t"),
      (3L, "b", "t t t t t t"),
      (4L, "b", "t t"))
      .toDF("doc_id", "source", "text")
    val out = Packing.packShards(docs, tokensPerShard = 5)
      .select("doc_id", "n_tokens", "shard_id", "offset_in_shard")
      .orderBy("doc_id").as[(Long, Long, Long, Long)].collect()
    out shouldBe Array(
      (0L, 3L, 0L, 0L),
      (1L, 4L, 0L, 3L),   // starts at 3, straddles into shard 1 — stays in 0
      (2L, 5L, 1L, 2L),
      (3L, 6L, 0L, 0L),   // b numbers its own shards from 0
      (4L, 2L, 1L, 1L))
  }

  test("packShards is invariant under input partitioning") {
    val docs = (0L until 200L)
      .map(i => (i, s"s${i % 4}", ("t " * (1 + (i % 7).toInt)).trim))
      .toDF("doc_id", "source", "text")
    val base = Packing.packShards(docs, 10)
      .select("doc_id", "shard_id", "offset_in_shard")
      .as[(Long, Long, Long)].collect().toSet
    Packing.packShards(docs.repartition(11), 10)
      .select("doc_id", "shard_id", "offset_in_shard")
      .as[(Long, Long, Long)].collect().toSet shouldBe base
  }

  test("packShards rejects reserved output-column collisions") {
    val docs = Seq((0L, "a", "t", 9L)).toDF("doc_id", "source", "text", "shard_id")
    an[IllegalArgumentException] should be thrownBy
      Packing.packShards(docs, 5)
  }
}
