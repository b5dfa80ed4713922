package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** SimHash64: the narrow kernel must be bit-identical to the
  * explode + 64-vote-lane aggregate formulation it replaced (same
  * xxhash64 seed, same majority rule, ties → 0). */
class SimHash64Spec extends SparkSpec {
  import spark.implicits._

  private def docs = Seq(
    (0L, "the quick brown fox jumps over the lazy dog"),
    (1L, "the quick brown fox jumps over the lazy cat"),
    (2L, "one two three four five six seven eight nine ten"),
    (3L, "single"),
    (4L, "dup dup dup dup"))
    .toDF("doc_id", "text")

  test("matches the explode + vote-lane aggregate formulation bit for bit") {
    val kernel = docs.select(col("doc_id"),
        SimHash64(split(col("text"), " ")).as("simhash"))
      .as[(Long, Long)].collect().toMap
    val toks = docs.select(col("doc_id"), explode(split(col("text"), " ")).as("tok"))
      .withColumn("th", xxhash64(col("tok")))
    val votes = (0 until 64).map(j =>
      sum(when(shiftright(col("th"), j).bitwiseAND(1) === 1, 1).otherwise(-1)).as(s"v$j"))
    val agg = toks.groupBy(col("doc_id")).agg(votes.head, votes.tail: _*)
      .select(col("doc_id"),
        (0 until 64).map(j => when(col(s"v$j") > 0, lit(1L << j)).otherwise(lit(0L)))
          .reduce(_.bitwiseOR(_)).as("simhash"))
      .as[(Long, Long)].collect().toMap
    kernel shouldBe agg
  }

  test("empty token array yields simhash 0; null text yields null") {
    val out = Seq((0L, Seq.empty[String]), (1L, null.asInstanceOf[Seq[String]]))
      .toDF("doc_id", "toks")
      .select(col("doc_id"), SimHash64(col("toks")).as("h"))
      .orderBy("doc_id").collect()
    out(0).getLong(1) shouldBe 0L
    out(1).isNullAt(1) shouldBe true
  }
}
