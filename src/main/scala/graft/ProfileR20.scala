package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** r20 optimization-round dev tool: per-PHASE wall-clock breakdown of
  * the expensive lifecycle faces (bench times them as one opaque
  * count(); optimizing needs to know which phase pays). In-package so
  * it can call the private[graft] batch appliers the faces use.
  *
  * Usage: runMain graft.ProfileR20 [iters] [face] — prints
  * `### phase: N s` lines per iteration; take the min iteration
  * (CLAUDE.md noise rule). Args are positional but forgiving (r21, the
  * r20 ADVICE note): a non-numeric first arg is treated as the face
  * name (`ProfileR20 dedup_stream` works), a numeric one as iters.
  */
object ProfileR20 {
  def t[A](label: String)(f: => A): A = {
    val t0 = System.nanoTime()
    val r = f
    println(f"### $label: ${(System.nanoTime() - t0) / 1e9}%.3f s")
    r
  }

  def main(args: Array[String]): Unit = {
    val iters = args.headOption.flatMap(_.toIntOption).getOrElse(2)
    val sf = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    graft.functions.GraftExtensions.registerRules(spark)
    graft.model.Tables.names.foreach { n =>
      try {
        val d = if (n == "events") graft.model.Tables.events(spark, sf)
                else graft.model.Tables.df(spark, sf, n)
        d.count()
      } catch { case _: Throwable => () }
    }
    Warmup.kernels(spark)

    // per-job attribution: callSite + duration for every job, so a
    // lifecycle face's wall-clock decomposes into its sequential actions
    if (sys.env.get("SPARK_GRAFT_PROF_JOBS").contains("1")) {
      val starts = new java.util.concurrent.ConcurrentHashMap[Int, (Long, String)]()
      spark.sparkContext.addSparkListener(
        new org.apache.spark.scheduler.SparkListener {
          override def onJobStart(
              js: org.apache.spark.scheduler.SparkListenerJobStart): Unit = {
            // the first graft.* frame in any stage's long call site —
            // stage NAMES often surface only the SQLExecution pool frame
            val site = js.stageInfos
              .flatMap(_.details.split("\n"))
              .find(l => l.contains("graft.") && !l.contains("ProfileR20"))
              .map(_.trim)
              .orElse(js.stageInfos.lastOption.map(_.name))
              .getOrElse("?")
            starts.put(js.jobId, (System.nanoTime(), site))
          }
          override def onJobEnd(
              je: org.apache.spark.scheduler.SparkListenerJobEnd): Unit = {
            val s = starts.remove(je.jobId)
            if (s != null) println(
              f"@@@ job ${je.jobId}%4d ${(System.nanoTime() - s._1) / 1e9}%7.3f s  ${s._2}")
          }
        })
    }
    val which = args.lift(1)
      .orElse(args.headOption.filter(_.toIntOption.isEmpty))
      .getOrElse("dedup_stream")
    (1 to iters).foreach { i =>
      println(s"--- iteration $i: $which ---")
      which match {
        case "dedup_stream" => dedupStream(spark, sf)
        case "ann_probe"    => annProbe(spark, sf, filtered = false)
        case "ann_filtered" => annProbe(spark, sf, filtered = true)
        case "cdc_read"     => cdcRead(spark, sf)
        case "host_canon"   => hostCanon(spark, sf)
        case "distinct_n"   => distinctN(spark, sf)
        case "engine_mid"   => engineMid(spark, sf)
        case "substring"    => substringProf(spark, sf)
        case other => sys.error(s"unknown profile: $other")
      }
    }
    spark.stop()
  }

  private def dedupStream(spark: SparkSession, sf: String): Unit = {
    import graft.streaming.StreamOps
    val docCap = 2000L
    val docs = graft.model.Tables.documents(spark, sf)
      .where(col("doc_id") < docCap).select("doc_id", "text")
    val corpus = docs.where(pmod(col("doc_id"), lit(5)) =!= 0)
    val b1 = docs.where(pmod(col("doc_id"), lit(5)) === 0)
      .select((col("doc_id") + 100000L).as("doc_id"), col("text"))
      .unionAll(docs.where(pmod(col("doc_id"), lit(15)) === 0)
        .select((col("doc_id") + 300000L).as("doc_id"),
          concat(col("text"), lit(" zq")).as("text")))
    val b2 = docs.where(pmod(col("doc_id"), lit(10)) === 1)
      .select((col("doc_id") + 200000L).as("doc_id"), col("text"))
      .unionAll(docs.where(pmod(col("doc_id"), lit(20)) === 3)
        .select((col("doc_id") + 400000L).as("doc_id"),
          concat(lit("qa"), col("doc_id").cast("string"),
            lit(" qb"), col("doc_id").cast("string"),
            lit(" qc"), col("doc_id").cast("string")).as("text")))
    val dir = java.nio.file.Files
      .createTempDirectory("dedup_stream_prof").toString
    t("TOTAL") {
      t("bootstrap")(StreamOps.bootstrapDedup(corpus, s"$dir/idx",
        s"$dir/corp", k = 2, bands = 8, rowsPerBand = 2, nBuckets = 16,
        poly = true, nIdxBuckets = 8))
      t("batch1")(StreamOps.applyDedupBatch(b1, 0L, s"$dir/idx",
        s"$dir/corp", k = 2, bands = 8, rowsPerBand = 2, threshold = 0.3,
        nBuckets = 16, idCol = "doc_id", textCol = "text", poly = true,
        nIdxBuckets = 8))
      t("batch2")(StreamOps.applyDedupBatch(b2, 1L, s"$dir/idx",
        s"$dir/corp", k = 2, bands = 8, rowsPerBand = 2, threshold = 0.3,
        nBuckets = 16, idCol = "doc_id", textCol = "text", poly = true,
        nIdxBuckets = 8))
      t("readback")(StreamOps.readDedupCorpus(spark, s"$dir/corp")
        .orderBy("doc_id").count())
    }
  }

  private def annProbe(spark: SparkSession, sf: String,
                       filtered: Boolean): Unit = {
    import graft.streaming.StreamOps
    // the DECLARED codebooks (private[graft] in LlmQueries) — a copy
    // here would silently drift if the planted formulas ever change
    // (r21, the r20 ADVICE note)
    val pqCodebooksPub = graft.queries.LlmQueries.pqCodebooks
    val clusterCodebookPub = graft.queries.LlmQueries.clusterCodebook
    val emb = graft.model.Tables.embeddings(spark, sf).localCheckpoint(false)
    val dir = java.nio.file.Files
      .createTempDirectory("ann_probe_prof").toString + "/ann"
    t("TOTAL") {
      t("bootstrap")(StreamOps.bootstrapAnn(emb, dir, clusterCodebookPub,
        pqCodebooksPub))
      t("batch0")(StreamOps.applyAnnBatch(
        emb.where(pmod(col("vec_id"), lit(7)) === 0)
          .select((col("vec_id") + 100000L).as("vec_id"),
            reverse(col("embedding")).as("embedding")),
        0L, dir))
      t("batch1")(StreamOps.applyAnnBatch(
        emb.where(pmod(col("vec_id"), lit(11)) === 1)
          .select((col("vec_id") + 200000L).as("vec_id"),
            transform(col("embedding"), x => negate(x)).as("embedding")),
        1L, dir))
      val allow =
        if (!filtered) None
        else Some(emb.select(col("vec_id"))
          .unionByName(emb.where(pmod(col("vec_id"), lit(7)) === 0)
            .select((col("vec_id") + 100000L).as("vec_id")))
          .unionByName(emb.where(pmod(col("vec_id"), lit(11)) === 1)
            .select((col("vec_id") + 200000L).as("vec_id")))
          .where(pmod(col("vec_id"), lit(3)) =!= 1))
      t("probe")(StreamOps.probeAnn(
          emb.where(col("vec_id") < 20).withColumnRenamed("vec_id", "qid"),
          dir, k = 5, nprobe = 3, allowIds = allow)
        .orderBy("qid", "rnk").count())
    }
  }

  /** Where does llm_distinct_n's time go — gram building (interpreted
    * HOFs), the partial agg, or the exchange? Components timed with the
    * noop sink (guide §1.4; count() prunes the gram projection). */
  private def distinctN(spark: SparkSession, sf: String): Unit = {
    val docs = graft.model.Tables.documents(spark, sf)
    def noop(df: org.apache.spark.sql.DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()
    val t0 = split(col("text"), " ")
    // current shape: one projection builds all three orders' structs
    // via transform(slice/array_join) — interpreted lambda bodies
    val gramArrays = Seq(1, 2, 3).map { n =>
      val starts = when(size(t0) >= n, sequence(lit(1), size(t0) - (n - 1)))
        .otherwise(array().cast("array<int>"))
      transform(starts, i =>
        struct(lit(n).as("n"), array_join(slice(t0, i, lit(n)), " ").as("gram")))
    }
    val cur = docs.select(col("source"), explode(concat(gramArrays: _*)).as("g"))
      .select(col("source"), col("g.n").as("n"), col("g.gram").as("gram"))
    // kernel shape: compiled shingle walk per order, struct wrap still
    // a (cheap-bodied) lambda
    val kernelArrays = Seq(1, 2, 3).map { n =>
      val sh = graft.functions.WordShingles(col("text"), n)
      val guarded = when(size(t0) >= n, sh)
        .otherwise(array().cast("array<string>"))
      transform(guarded, g => struct(lit(n).as("n"), g.as("gram")))
    }
    val ker = docs.select(col("source"), explode(concat(kernelArrays: _*)).as("g"))
      .select(col("source"), col("g.n").as("n"), col("g.gram").as("gram"))
    t("gramStream current (noop)")(noop(cur))
    t("gramStream kernel  (noop)")(noop(ker))
    t("equal?")(println("  diff rows: " +
      cur.groupBy("source", "n", "gram").count()
        .join(ker.groupBy("source", "n", "gram").count()
          .withColumnRenamed("count", "c2"),
          Seq("source", "n", "gram"), "full_outer")
        .where(col("count").isNull || col("c2").isNull ||
          col("count") =!= col("c2")).count()))
    def fullAgg(g: org.apache.spark.sql.DataFrame) = g
      .groupBy(col("source"), col("n"), col("gram"))
      .agg(count(lit(1)).as("occ"))
      .groupBy(col("source"), col("n"))
      .agg(sum(col("occ")).cast("long").as("total_grams"),
        count(lit(1)).as("distinct_grams"))
    t("full distinct agg current (noop)")(noop(fullAgg(cur)))
    t("full distinct agg kernel  (noop)")(noop(fullAgg(ker)))
    t("declared query (count)")(
      SparkEntry.queries("llm_distinct_n")(spark, sf).count())
  }

  /** Mid-tier engine-lane queries + their component operators, noop-
    * sunk (guide §1.4), to find which component pays. */
  private def engineMid(spark: SparkSession, sf: String): Unit = {
    def noop(df: org.apache.spark.sql.DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()
    val docs = graft.model.Tables.documents(spark, sf)
    val capped = docs.where(col("doc_id") < 2000L)
    t("quality (full corpus, noop)")(noop(graft.llm.TextStats.quality(docs)))
    t("gopherRules (full corpus, noop)")(
      noop(graft.llm.TextStats.gopherRules(docs)))
    t("repetitionRules (full corpus, noop)")(
      noop(graft.llm.TextStats.repetitionRules(docs)))
    t("minHashNearDups capped (noop)")(
      noop(graft.llm.Dedup.minHashNearDups(capped, k = 3, bands = 4,
        rowsPerBand = 2, threshold = 0.5)))
    Seq("llm_curate_full", "llm_select_full", "llm_dedup_near",
      "llm_quality_dedup", "llm_tfidf", "llm_split_safe", "llm_host_canon",
      "agg_quantile_merge", "llm_bitext_margin", "llm_components_incremental")
      .foreach { n => t(n)(SparkEntry.queries(n)(spark, sf).count()) }
  }

  /** substringDedup stage decomposition (r21 verdict item 8): which of
    * window-hash construction / loser election / token reassembly pays,
    * over the real corpus. Stages come from Dedup.substringStages — the
    * DECLARED pipeline, never a drifting copy (the codebook rule). */
  private def substringProf(spark: SparkSession, sf: String): Unit = {
    def noop(df: org.apache.spark.sql.DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()
    val docs = graft.model.Tables.documents(spark, sf).select("doc_id", "text")
    val k = 20
    val (_, hashed, losers) = graft.llm.Dedup.substringStages(docs, k)
    t("1 window-hash projection (noop)")(noop(hashed))
    t("2 + loser election (noop)")(noop(losers))
    t("3 full substringDedup (noop)")(
      noop(graft.llm.Dedup.substringDedup(docs, k = k)))
    t("4 declared llm_dedup_substring (count)")(
      SparkEntry.queries("llm_dedup_substring")(spark, sf).count())
  }

  private def cdcRead(spark: SparkSession, sf: String): Unit =
    Seq("stream_cdc_read_asof", "stream_cdc_evolve", "stream_cdc_read_keys",
      "stream_cdc_read_latest").foreach { n =>
      t(n)(SparkEntry.queries(n)(spark, sf).count())
    }

  private def hostCanon(spark: SparkSession, sf: String): Unit =
    t("llm_host_canon_stream")(
      SparkEntry.queries("llm_host_canon_stream")(spark, sf).count())
}
