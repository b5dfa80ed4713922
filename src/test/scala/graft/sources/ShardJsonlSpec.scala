package graft.sources

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** The graft-jsonl DataSource V2 connector: write → read round trip,
  * planning-time shard pruning (pruned shards never become input
  * partitions), column pruning (only projected fields parsed), schema
  * inference, and residual-filter correctness. */
class ShardJsonlSpec extends SparkSpec {
  import spark.implicits._

  private def layout = {
    val docs = (0 until 40)
      .map(i => (i.toLong, s"src${i % 3}", s"body text $i", i * 1.5, i % 2 == 0))
      .toDF("doc_id", "source", "text", "score", "flag")
    graft.llm.Packing.shuffleShards(docs, rowsPerShard = 8L)
  }

  private val schemaDDL =
    "doc_id LONG, source STRING, text STRING, score DOUBLE, flag BOOLEAN, shard_id LONG"

  private def writeLayout(): String = {
    val dir = java.nio.file.Files.createTempDirectory("graft_jsonl").toString
    Sinks.jsonlShards(layout.withColumn("pos_in_shard", col("pos_in_shard")), dir)
    dir
  }

  test("round trip: the connector reads back exactly what jsonlShards wrote") {
    val dir = writeLayout()
    val back = spark.read.format("graft-jsonl").schema(schemaDDL).load(dir)
    val got = back.select("doc_id", "source", "text", "score", "flag", "shard_id")
      .as[(Long, String, String, Double, Boolean, Long)].collect().toSet
    val want = layout.select("doc_id", "source", "text", "score", "flag", "shard_id")
      .as[(Long, String, String, Double, Boolean, Long)].collect().toSet
    want should not be empty
    got shouldBe want
  }

  test("shard filters prune at planning time; pruned shards never become partitions") {
    val dir = writeLayout()
    val back = spark.read.format("graft-jsonl").schema(schemaDDL).load(dir)
    val filtered = back.where(col("shard_id") === 2L || col("shard_id") === 2L)
      .where(col("shard_id") >= 1L)
    val plan = filtered.queryExecution.executedPlan.toString()
    withClue(plan) {
      plan should include("shards=[2]")
      // consumed filters are pushed, not re-evaluated: no residual
      // shard_id Filter node above the scan (the BatchScan line itself
      // mentions shard_id in its pushed-filter description)
      plan.linesIterator.count(l =>
        l.contains("Filter") && l.contains("shard_id") &&
          !l.contains("BatchScan")) shouldBe 0
    }
    filtered.select("shard_id").distinct().as[Long].collect() shouldBe Array(2L)
  }

  test("IN and range filters prune to the exact shard set") {
    val dir = writeLayout()
    val back = spark.read.format("graft-jsonl").schema(schemaDDL).load(dir)
    val in = back.where(col("shard_id").isin(0L, 3L))
    in.queryExecution.executedPlan.toString() should include("shards=[0,3]")
    val range = back.where(col("shard_id") > 1L && col("shard_id") <= 3L)
    range.queryExecution.executedPlan.toString() should include("shards=[2,3]")
    range.select("shard_id").distinct().as[Long].collect().sorted shouldBe
      Array(2L, 3L)
  }

  test("column pruning reaches the scan; non-shard filters stay residual and correct") {
    val dir = writeLayout()
    val back = spark.read.format("graft-jsonl").schema(schemaDDL).load(dir)
    val q = back.where(col("source") === "src1").select("doc_id", "score")
    val plan = q.queryExecution.executedPlan.toString()
    withClue(plan) {
      // the scan parses only the projected + filtered fields
      // (pruned schema keeps table-schema order)
      plan should include("columns=[doc_id,source,score]")
      // the source filter is NOT a shard filter: Spark must evaluate it
      plan.linesIterator.exists(l =>
        l.contains("Filter") && l.contains("source")) shouldBe true
    }
    q.as[(Long, Double)].collect().toSet shouldBe
      (0 until 40).filter(_ % 3 == 1).map(i => (i.toLong, i * 1.5)).toSet
  }

  test("schema inference types long/double/boolean/string and appends shard_id") {
    val dir = writeLayout()
    val inferred = spark.read.format("graft-jsonl").load(dir).schema
    inferred("doc_id").dataType shouldBe LongType
    inferred("score").dataType shouldBe DoubleType
    inferred("flag").dataType shouldBe BooleanType
    inferred("source").dataType shouldBe StringType
    inferred("shard_id").dataType shouldBe LongType
  }

  test("V2 write: unsorted input lands as one ordered file per shard; read round-trips") {
    val dir = java.nio.file.Files.createTempDirectory("graft_jsonl_w").toString
    // deliberately scrambled row order — the Write's required
    // distribution/ordering must insert the exchange + sort itself
    val scrambled = layout.orderBy(hash(col("doc_id")))
    scrambled.write.format("graft-jsonl").mode("append").save(dir)
    new java.io.File(s"$dir/_SUCCESS").exists() shouldBe true
    val back = spark.read.format("graft-jsonl").schema(schemaDDL).load(dir)
    back.select("doc_id", "source", "text", "score", "flag", "shard_id")
      .as[(Long, String, String, Double, Boolean, Long)].collect().toSet shouldBe
      layout.select("doc_id", "source", "text", "score", "flag", "shard_id")
        .as[(Long, String, String, Double, Boolean, Long)].collect().toSet
    // one file per shard (clustered distribution puts a shard wholly in
    // one task), rows inside in pos_in_shard order
    val shard0 = new java.io.File(s"$dir/shard_id=0").listFiles()
      .filter(f => f.isFile && !f.getName.startsWith("_") && !f.getName.startsWith("."))
    shard0.length shouldBe 1
    val posInFile = scala.io.Source.fromFile(shard0.head).getLines()
      .map(l => """"pos_in_shard":(\d+)""".r.findFirstMatchIn(l).get.group(1).toLong)
      .toSeq
    posInFile shouldBe posInFile.sorted
    posInFile.length shouldBe 8
  }

  test("V2 write commit protocol: no temps remain, appends never collide, null shard_id errors") {
    val dir = java.nio.file.Files.createTempDirectory("graft_jsonl_p").toString
    layout.write.format("graft-jsonl").mode("append").save(dir)
    // committed = renamed: no hidden temp files anywhere
    def allFiles = new java.io.File(dir).listFiles()
      .filter(_.isDirectory).flatMap(_.listFiles()).map(_.getName)
    allFiles.count(_.endsWith(".tmp")) shouldBe 0
    // a second APPEND job (fresh writeId) must add files, not clobber
    layout.write.format("graft-jsonl").mode("append").save(dir)
    val back = spark.read.format("graft-jsonl").schema(schemaDDL).load(dir)
    back.count() shouldBe layout.count() * 2
    // (exclude dotfiles: the local FS writes .crc sidecars)
    new java.io.File(s"$dir/shard_id=0").listFiles()
      .count(f => f.isFile && !f.getName.startsWith("_") &&
        !f.getName.startsWith(".")) shouldBe 2
    // null shard_id is an error, not a silent shard 0
    val nullShard = layout.withColumn("shard_id",
      when(col("doc_id") === 0L, lit(null).cast("long")).otherwise(col("shard_id")))
    an[Exception] should be thrownBy
      nullShard.write.format("graft-jsonl").mode("append")
        .save(java.nio.file.Files.createTempDirectory("graft_jsonl_n2").toString)
  }

  test("a non-numeric shard directory is skipped, not a crash") {
    val dir = writeLayout()
    val junk = new java.io.File(s"$dir/shard_id=__HIVE_DEFAULT_PARTITION__")
    junk.mkdirs()
    java.nio.file.Files.write(
      java.nio.file.Paths.get(junk.getPath, "part-0.txt"), "{}\n".getBytes)
    val back = spark.read.format("graft-jsonl").schema(schemaDDL).load(dir)
    back.count() shouldBe layout.count()
    // and a null-valued shard filter stays residual (no planner NPE)
    back.where(col("shard_id") === lit(null).cast("long")).count() shouldBe 0L
  }

  test("V2 write overwrite truncates the previous layout") {
    val dir = java.nio.file.Files.createTempDirectory("graft_jsonl_t").toString
    layout.write.format("graft-jsonl").mode("append").save(dir)
    val half = layout.where(col("shard_id") < 2)
    half.write.format("graft-jsonl").mode("overwrite").save(dir)
    val back = spark.read.format("graft-jsonl").schema(schemaDDL).load(dir)
    back.count() shouldBe half.count()
    back.select("shard_id").distinct().as[Long].collect().sorted shouldBe
      Array(0L, 1L)
    // an ALREADY-EMPTY prior shard dir (no files to record) must also be
    // retired by the next overwrite — pre-r12 it dodged the cleanup pass
    // and survived as a stale zero-row shard
    val emptyDir = new java.io.File(dir, "shard_id=9")
    emptyDir.mkdirs()
    half.write.format("graft-jsonl").mode("overwrite").save(dir)
    emptyDir.exists() shouldBe false
    new java.io.File(dir).listFiles()
      .count(f => f.isDirectory && f.getName.startsWith("shard_id=")) shouldBe 2
  }

  test("overwrite is failure-atomic: a failed job leaves the prior layout intact") {
    val dir = java.nio.file.Files.createTempDirectory("graft_jsonl_fa").toString
    layout.write.format("graft-jsonl").mode("append").save(dir)
    val before = spark.read.format("graft-jsonl").schema(schemaDDL).load(dir)
      .select("doc_id").as[Long].collect().sorted
    // poison one row so the overwrite JOB fails mid-write: the prior
    // layout's files must survive (deletion is deferred to commit, which
    // a failed job never reaches — pre-r11 the truncate deleted them
    // before the first task wrote a byte)
    val poisoned = layout.withColumn("text",
      when(col("doc_id") === 5L, raise_error(lit("boom"))).otherwise(col("text")))
    an[Exception] should be thrownBy
      poisoned.write.format("graft-jsonl").mode("overwrite").save(dir)
    val after = spark.read.format("graft-jsonl").schema(schemaDDL).load(dir)
      .select("doc_id").as[Long].collect().sorted
    after shouldBe before
  }

  test("commit sweeps zombie temps of its own write; foreign temps survive") {
    val dir = java.nio.file.Files.createTempDirectory("graft_jsonl_z").toString
    val shardDir = new java.io.File(s"$dir/shard_id=0"); shardDir.mkdirs()
    val schema = StructType(Seq(StructField("doc_id", LongType),
      StructField("shard_id", LongType)))
    val bw = new ShardJsonlBatchWrite(dir, schema, truncate = false)
    def plant(name: String): java.io.File = {
      val f = new java.io.File(shardDir, name)
      java.nio.file.Files.write(f.toPath, "{\"doc_id\":1}\n".getBytes)
      f
    }
    // a committed attempt's temp, a zombie of the SAME write (task that
    // died without abort), and a concurrent OTHER write's temp
    val committed = plant(s".part-0-0-${bw.writeId}.jsonl.tmp")
    val zombie = plant(s".part-0-1-${bw.writeId}.jsonl.tmp")
    val foreign = plant(".part-0-0-ffffffff.jsonl.tmp")
    val fin = s"$dir/shard_id=0/part-0-0-${bw.writeId}.jsonl"
    bw.commit(Array(ShardJsonlCommit(Seq((committed.getPath, fin)))))
    new java.io.File(fin).exists() shouldBe true
    zombie.exists() shouldBe false  // swept: same writeId, never messaged
    foreign.exists() shouldBe true  // concurrent writer's — untouched
  }

  test("streaming read tails a growing layout; shard pruning applies to streams") {
    val dir = java.nio.file.Files.createTempDirectory("graft_jsonl_s").toString
    val first = layout.where(col("shard_id") < 3)
    Sinks.jsonlShards(first, dir)
    val stream = spark.readStream.format("graft-jsonl").schema(schemaDDL)
      .load(dir).where(col("shard_id") =!= 1L)
    val sink = "jsonl_stream_" + System.nanoTime()
    val q = stream.writeStream.format("memory").queryName(sink)
      .outputMode("append").start()
    try {
      q.processAllAvailable()
      val afterFirst = spark.table(sink).count()
      afterFirst shouldBe first.where(col("shard_id") =!= 1L).count()
      // append the remaining shards — the next trigger reads ONLY them
      Sinks.jsonlShards(layout.where(col("shard_id") >= 3), dir,
        mode = "append")
      q.processAllAvailable()
      spark.table(sink).select("doc_id").as[Long].collect().toSet shouldBe
        layout.where(col("shard_id") =!= 1L).select("doc_id")
          .as[Long].collect().toSet
      // no duplicates: immutable files are read exactly once
      spark.table(sink).count() shouldBe
        spark.table(sink).select("doc_id").distinct().count()
    } finally q.stop()
  }

  test("missing JSON fields read as NULL; shard_id schema is enforced") {
    val dir = java.nio.file.Files.createTempDirectory("graft_jsonl_n").toString
    val d = new java.io.File(s"$dir/shard_id=0"); d.mkdirs()
    java.nio.file.Files.write(
      java.nio.file.Paths.get(s"$dir/shard_id=0/part-0.txt"),
      "{\"doc_id\":1}\n{\"doc_id\":2,\"text\":\"t\"}\n".getBytes)
    val back = spark.read.format("graft-jsonl")
      .schema("doc_id LONG, text STRING, shard_id LONG").load(dir)
    back.where(col("text").isNull).select("doc_id").as[Long].collect() shouldBe
      Array(1L)
    an[IllegalArgumentException] should be thrownBy
      spark.read.format("graft-jsonl")
        .schema("doc_id LONG, shard_id INT").load(dir).collect()
  }
}
