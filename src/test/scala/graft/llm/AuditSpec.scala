package graft.llm

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Corpus snapshot diff: all four statuses, content-not-id comparison,
  * partition invariance. */
class AuditSpec extends SparkSpec {
  import spark.implicits._

  test("corpusDiff labels added/removed/changed/unchanged by content hash") {
    val prev = Seq((1L, "a"), (2L, "b"), (3L, "c")).toDF("doc_id", "text")
    val next = Seq((2L, "b"), (3L, "c2"), (4L, "d")).toDF("doc_id", "text")
    val out = Audit.corpusDiff(prev, next)
      .orderBy("doc_id").as[(Long, String)].collect()
    out shouldBe Array(
      (1L, "removed"), (2L, "unchanged"), (3L, "changed"), (4L, "added"))
  }

  test("corpusDiff compares bytes, not formatting of the id") {
    // same id, same text → unchanged even when the frames differ in
    // column order / extra columns upstream of the projection
    val prev = Seq((7L, "same", "x")).toDF("doc_id", "text", "extra")
    val next = Seq((7L, "same")).toDF("doc_id", "text")
    Audit.corpusDiff(prev, next).select("status").as[String].head() shouldBe "unchanged"
  }

  test("corpusDiff does not conflate a NULL text with an absent id") {
    // sha2(NULL) is NULL: presence must come from id markers, and the
    // hash compare must be null-safe — a null-text row in both snapshots
    // is 'unchanged', one that gains text is 'changed', never 'added'
    val prev = Seq((1L, null: String), (2L, null: String), (3L, "t"))
      .toDF("doc_id", "text")
    val next = Seq((1L, null: String), (2L, "now present"), (3L, null: String))
      .toDF("doc_id", "text")
    Audit.corpusDiff(prev, next).orderBy("doc_id")
      .as[(Long, String)].collect() shouldBe Array(
      (1L, "unchanged"), (2L, "changed"), (3L, "changed"))
  }

  test("corpusDiff is invariant under input partitioning") {
    val prev = spark.range(100).select(col("id").as("doc_id"),
      concat(lit("t"), col("id")).as("text"))
    // overlap ids 50-59 keep their text (unchanged); 60-99 wrap the
    // modulus (changed); 100-149 are added; prev's 0-49 are removed
    val next = spark.range(50, 150).select(col("id").as("doc_id"),
      concat(lit("t"), pmod(col("id"), lit(60))).as("text"))
    val a = Audit.corpusDiff(prev, next).orderBy("doc_id")
      .as[(Long, String)].collect()
    val b = Audit.corpusDiff(prev.repartition(7), next.repartition(3))
      .orderBy("doc_id").as[(Long, String)].collect()
    b shouldBe a
    // every status class must be represented for the fixture to mean anything
    a.map(_._2).toSet shouldBe Set("added", "removed", "changed", "unchanged")
  }
}
