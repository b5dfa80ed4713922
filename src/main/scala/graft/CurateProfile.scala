package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev tool: stage-by-stage timing of the curateFull composite — where do
  * its seconds go? (round-3 investigation; keep for future regressions) */
object CurateProfile {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    graft.functions.GraftExtensions.registerRules(spark)
    val docs = graft.model.Tables.documents(spark, sfDir)
      .where(col("doc_id") < 2000L)
    docs.count() // warm

    def time(name: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val n = f
      println(f"""{"stage":"$name","sec":${(System.nanoTime() - t0) / 1e9}%.3f,"rows":$n}""")
    }

    if (args.contains("checkpoint")) {
      // single-shot cost with a plan-truncating localCheckpoint at the
      // gated boundary (what materializeGated could do instead of persist)
      time("full_checkpoint_single_shot") {
        val keepers = graft.llm.Dedup.exact(docs).select(col("keep_id").as("doc_id"))
        val deduped = docs.join(keepers, "doc_id")
        val scored = deduped.join(
          graft.llm.TextStats.quality(deduped).select(col("doc_id"), col("quality"), col("n_tokens")), "doc_id")
        val gated = scored.where(col("lang") === "en" && col("quality") >= 0.3)
          .localCheckpoint()
        val near = graft.llm.Dedup.minHashNearDups(gated, k = 2, bands = 8,
          rowsPerBand = 2, threshold = 0.5)
        val losers = near.select(col("b").as("doc_id")).distinct()
        val pruned = gated.join(losers, Seq("doc_id"), "left_anti")
        graft.llm.Sampling.capPerGroup(pruned,
          keys = Seq(col("lang"), col("source")), n = 50,
          order = Seq(col("doc_id"), col("n_tokens"), col("quality"))).count()
      }
      spark.stop(); return
    }
    if (args.contains("matgated")) {
      time("full_matgated_single_shot") {
        graft.llm.Curation.curateFull(docs, lang = "en", minQuality = 0.3,
          nearDupThreshold = 0.5, maxPerGroup = 50, materializeGated = true).count()
      }
      spark.stop(); return
    }
    val keepers = graft.llm.Dedup.exact(docs).select(col("keep_id").as("doc_id"))
    val deduped = docs.join(keepers, "doc_id")
    val scored = deduped.join(
      graft.llm.TextStats.quality(deduped).select(col("doc_id"), col("quality"), col("n_tokens")), "doc_id")
    val gated = scored.where(col("lang") === "en" && col("quality") >= 0.3)
    time("gated")(gated.count())
    val near = graft.llm.Dedup.minHashNearDups(gated, k = 2, bands = 8,
      rowsPerBand = 2, threshold = 0.5)
    time("nearDups")(near.count())
    val losers = near.select(col("b").as("doc_id")).distinct()
    val pruned = gated.join(losers, Seq("doc_id"), "left_anti")
    time("pruned")(pruned.count())
    val capped = graft.llm.Sampling.capPerGroup(pruned,
      keys = Seq(col("lang"), col("source")), n = 50,
      order = Seq(col("doc_id"), col("n_tokens"), col("quality")))
    time("capped")(capped.count())
    time("full_single_shot")(
      graft.llm.Curation.curateFull(docs, lang = "en", minQuality = 0.3,
        nearDupThreshold = 0.5, maxPerGroup = 50).count())
    spark.stop()
  }
}
