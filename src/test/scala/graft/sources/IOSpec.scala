package graft.sources

import graft.SparkSpec
import org.apache.spark.sql.functions.{concat, lit, pmod}

import java.nio.file.Files

/** Source/sink round-trips (SURVEY §2.1). */
class IOSpec extends SparkSpec {
  import spark.implicits._

  private def tmp(): String =
    Files.createTempDirectory("graft_io").toString

  test("parquet round-trip with partitionBy prunes by directory") {
    val dir = tmp() + "/p"
    val df = Seq((1L, "a"), (2L, "b"), (3L, "a")).toDF("id", "k")
    Sinks.parquet(df, dir, partitionBy = Seq("k"))
    val back = Sources.parquet(spark, dir)
    back.count() shouldBe 3
    // partition directories exist → partition pruning applies on k
    new java.io.File(dir).list().count(_.startsWith("k=")) shouldBe 2
    back.where($"k" === "a").count() shouldBe 2
  }

  test("csv round-trip with header") {
    val dir = tmp() + "/c"
    Sinks.csv(Seq((1, "x"), (2, "y")).toDF("n", "s"), dir)
    val back = Sources.csv(spark, dir)
    back.columns shouldBe Array("n", "s")
    back.count() shouldBe 2
  }

  test("json round-trip") {
    val dir = tmp() + "/j"
    Sinks.json(Seq((1, "x")).toDF("n", "s"), dir)
    Sources.json(spark, dir).count() shouldBe 1
  }

  test("text source reads one element per line") {
    val dir = tmp()
    Files.writeString(java.nio.file.Paths.get(dir, "f.txt"), "l1\nl2\nl3")
    Sources.text(spark, dir + "/f.txt").count() shouldBe 3
  }

  test("trainingShards writes one ordered file per shard directory") {
    val dir = tmp() + "/shards"
    val laid = graft.llm.Packing.shuffleShards(
      spark.range(100).toDF("doc_id"), rowsPerShard = 25L)
    Sinks.trainingShards(laid, dir)
    val root = new java.io.File(dir)
    val shardDirs = root.list().filter(_.startsWith("shard_id=")).sorted
    shardDirs shouldBe Array("shard_id=0", "shard_id=1", "shard_id=2", "shard_id=3")
    // one data file per shard — a loader reads shard K sequentially
    shardDirs.foreach { d =>
      new java.io.File(root, d).list().count(_.endsWith(".parquet")) shouldBe 1
    }
    // in-file order IS training order: reading a single shard's file
    // (no Spark sort) yields pos_in_shard 0..24 ascending
    val one = spark.read.parquet(s"$dir/shard_id=0")
    one.select("pos_in_shard").as[Long].collect().toSeq shouldBe (0L until 25L)
    // round trip: the full layout survives with shard_id as a partition key
    Sources.parquet(spark, dir).count() shouldBe 100
    an[IllegalArgumentException] should be thrownBy
      Sinks.trainingShards(spark.range(3).toDF("doc_id"), dir)
  }

  test("interleave output reaches trainingShards via shardByPos") {
    val dir = tmp() + "/il_shards"
    val docs = spark.range(60).select($"id".as("doc_id"),
      concat(lit("s"), pmod($"id", lit(2))).as("source"))
    val laid = graft.llm.Packing.shardByPos(
      graft.llm.Packing.interleave(docs, Map("s0" -> 2, "s1" -> 1)),
      rowsPerShard = 20L)
    Sinks.trainingShards(laid, dir, numPartitions = Some(3))
    val root = new java.io.File(dir)
    root.list().count(_.startsWith("shard_id=")) shouldBe 3
    // shard 0's file preserves the 2:1 interleave order on disk
    spark.read.parquet(s"$dir/shard_id=0").orderBy("pos_in_shard")
      .select("source").as[String].collect().take(6).toSeq shouldBe
      Seq("s0", "s0", "s1", "s0", "s0", "s1")
  }

  test("noop sink executes the plan without output") {
    Sinks.noop(Seq(1, 2, 3).toDF("v"))   // must not throw
  }

  test("co-bucketed tables join without an exchange") {
    // the in-memory catalog forgets tables between JVMs but the warehouse
    // directory persists — clear both
    Seq("bt_facts", "bt_dims").foreach { t =>
      spark.sql(s"DROP TABLE IF EXISTS $t")
      val dir = new java.io.File(s"/tmp/graft_test_warehouse/$t")
      if (dir.exists()) {
        def rm(f: java.io.File): Unit = {
          Option(f.listFiles()).foreach(_.foreach(rm)); f.delete()
        }
        rm(dir)
      }
    }
    val facts = (1 to 1000).map(i => (i.toLong % 50, i)).toDF("k", "v1")
    val dims = (1 to 1000).map(i => (i.toLong % 50, -i)).toDF("k", "v2")
    Sinks.bucketTable(facts, "bt_facts", Seq("k"), numBuckets = 4, sortCols = Seq("k"))
    Sinks.bucketTable(dims, "bt_dims", Seq("k"), numBuckets = 4, sortCols = Seq("k"))
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val joined = spark.table("bt_facts")
        .join(spark.table("bt_dims"), "k")
      joined.queryExecution.executedPlan.toString should not include "Exchange"
      joined.count() shouldBe 1000L * 1000 / 50
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }
}
