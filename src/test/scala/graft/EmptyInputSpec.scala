package graft

import graft.core.Pipeline
import graft.llm.{Dedup, Similarity, TextStats}
import graft.relational.TopK
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Empty-input robustness: at 100 TB empty partitions and empty filter
  * results are routine — no operator may throw on them. */
class EmptyInputSpec extends SparkSpec {
  import spark.implicits._

  private def emptyDocs = spark.createDataFrame(
    spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
    StructType(Seq(StructField("doc_id", LongType), StructField("text", StringType))))

  private def emptyEmb = spark.createDataFrame(
    spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
    StructType(Seq(StructField("vec_id", LongType),
      StructField("embedding", ArrayType(FloatType)))))

  test("dedup family on empty input returns empty, not error") {
    Dedup.exact(emptyDocs).count() shouldBe 0
    Dedup.minHashNearDups(emptyDocs, k = 2, bands = 4, rowsPerBand = 2,
      threshold = 0.5).count() shouldBe 0
    Dedup.simHashNearDups(emptyDocs, maxHamming = 3).count() shouldBe 0
    Dedup.embeddingNearDups(emptyEmb, threshold = 0.5).count() shouldBe 0
  }

  test("similarity on empty corpus returns empty") {
    Similarity.bruteTopK(emptyEmb, emptyEmb, k = 3).count() shouldBe 0
  }

  test("text stats on empty input returns empty") {
    TextStats.langId(emptyDocs).count() shouldBe 0
    TextStats.quality(emptyDocs).count() shouldBe 0
  }

  test("topKPerGroup on empty input returns empty") {
    TopK.topKPerGroup(emptyDocs, Seq(col("doc_id")), Seq(col("text")), 3)
      .count() shouldBe 0
  }

  test("trainCodebook fails fast (not mid-job) on an empty corpus") {
    an[IllegalArgumentException] should be thrownBy
      Similarity.trainCodebook(emptyEmb, k = 4, iters = 1)
  }

  test("round-9 selection/layout tier on empty input returns empty, not error") {
    val emptySrc = emptyDocs.withColumn("source", lit(null).cast(StringType))
    TextStats.dsir(emptyDocs, isTarget = lit(true), keepFraction = 0.4)
      .count() shouldBe 0
    graft.llm.Sampling.unimax(emptySrc, budgetBp = 9000L, maxEpochs = 2)
      .count() shouldBe 0
    graft.llm.Packing.lengthBatches(emptySrc, batchSize = 8).count() shouldBe 0
    graft.llm.Audit.dupMass(emptySrc).count() shouldBe 0
    graft.llm.Curation.splitLeakage(emptyDocs,
      Seq("train" -> 0.9, "val" -> 0.1), Seq("val")).count() shouldBe 0
    graft.llm.Audit.shardManifest(emptySrc
      .withColumnRenamed("source", "x")
      .withColumn("shard_id", lit(null).cast(LongType))
      .withColumn("pos_in_shard", lit(null).cast(LongType))).count() shouldBe 0
    Similarity.clusterBalance(emptyEmb,
      Seq(Seq(Seq(0.0, 0.0), Seq(1.0, 1.0))), 5).count() shouldBe 0
  }

  test("Pipeline ops on empty dataset") {
    val p = Pipeline.fromSeq(spark, Seq.empty[Int])
    p.map(_ + 1).evalSize shouldBe 0
    p.distinct.evalVector shouldBe Vector.empty
    p.evalFold(7)(_ + _) shouldBe 7
  }
}
