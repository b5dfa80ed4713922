package graft

/** Partition-invariance: a declared query must produce IDENTICAL rows no
  * matter how many shuffle partitions execute it — the determinism
  * contract (SURVEY §2.9-bis) that a single-config oracle run cannot
  * check. The queries picked here are the order-sensitive ones: collected
  * lists, string aggs, "first" semantics, positional indexes, running
  * windows, and the hash-seeded near-dup pipelines.
  */
class DeterminismSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"
  private val sensitive = Seq(
    "agg_collect_list", "agg_string_agg", "agg_first_deterministic",
    "op_zip_with_index", "op_slice", "win_running_sum",
    "llm_dedup_near", "llm_sample_cap", "op_join_asof",
    "llm_ivf_train") // fixed-point centroid sums: training must not drift

  private def run(name: String, partitions: Int): Seq[String] = {
    val prev = spark.conf.get("spark.sql.shuffle.partitions")
    try {
      spark.conf.set("spark.sql.shuffle.partitions", partitions.toString)
      SparkEntry.queries(name)(spark, sf).collect().map(_.toString).toSeq
    } finally spark.conf.set("spark.sql.shuffle.partitions", prev)
  }

  sensitive.foreach { name =>
    test(s"$name is identical at 1 and 13 shuffle partitions") {
      run(name, 1) shouldBe run(name, 13)
    }
  }

  test("capped bucketPairs keeps the same survivors under any partitioning") {
    // a super-bucket that HITS the maxBucket cap: the bounded heap must
    // keep the globally-smallest ids regardless of how partial buffers
    // were partitioned and merged
    import spark.implicits._
    val supers = (0 until 300).map(i => (i.toLong, "same text all the way down"))
      .toDF("doc_id", "text")
    def pairs(parts: Int) = {
      val prev = spark.conf.get("spark.sql.shuffle.partitions")
      try {
        spark.conf.set("spark.sql.shuffle.partitions", parts.toString)
        graft.llm.Dedup.minHashNearDups(supers.repartition(parts), k = 2,
            bands = 2, rowsPerBand = 2, threshold = 0.9, maxBucket = 16)
          .orderBy("a", "b").collect().map(_.toString).toSeq
      } finally spark.conf.set("spark.sql.shuffle.partitions", prev)
    }
    pairs(1) shouldBe pairs(13)
  }
}
