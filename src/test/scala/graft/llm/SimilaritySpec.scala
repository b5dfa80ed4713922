package graft.llm

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Similarity search (SURVEY §2.9 L3): brute-force exactness on hand-built
  * vectors with known cosine ordering, and IVF recall against brute. */
class SimilaritySpec extends SparkSpec {
  import spark.implicits._

  private def emb = Seq(
    (0L, Array(1.0f, 0.0f, 0.0f)),
    (1L, Array(0.9f, 0.1f, 0.0f)),
    (2L, Array(0.5f, 0.5f, 0.0f)),
    (3L, Array(0.0f, 1.0f, 0.0f)))
    .toDF("vec_id", "embedding")

  test("cosine column matches hand computation") {
    val c = Seq((Array(1.0f, 0.0f), Array(1.0f, 1.0f))).toDF("a", "b")
      .select(Similarity.cosine(col("a"), col("b"))).as[Double].head()
    c shouldBe 1.0 / math.sqrt(2) +- 1e-6
  }

  test("bruteTopK returns neighbors in exact cosine order, excluding self") {
    val out = Similarity.bruteTopK(emb.where(col("vec_id") === 0), emb, k = 3)
      .orderBy("rnk").select("vec_id").as[Long].collect()
    out shouldBe Array(1L, 2L, 3L)   // descending cosine vs (1,0,0)
  }

  test("codebooks above MaxCentroids are rejected before the driver collect") {
    val big = spark.range(Similarity.MaxCentroids + 1)
      .select(col("id").as("vec_id"), array(lit(1.0f), lit(0.0f)).as("embedding"))
    val e = intercept[IllegalArgumentException] { Similarity.assign(emb, big) }
    e.getMessage should include("codebook")
  }

  test("assign puts each vector in its nearest centroid bucket") {
    val cents = emb.where(col("vec_id").isin(0L, 3L))
    val out = Similarity.assign(emb, cents)
      .select(col("vec_id"), col("cid")).as[(Long, Long)].collect().toMap
    out(0L) shouldBe 0L
    out(1L) shouldBe 0L
    out(3L) shouldBe 3L
    // vec 2 is equidistant → deterministic tiebreak on centroid id
    out(2L) shouldBe 0L
  }

  test("ivfTopK with all buckets probed equals bruteTopK") {
    val cents = emb.where(col("vec_id").isin(0L, 3L))
    val brute = Similarity.bruteTopK(emb.where(col("vec_id") === 0), emb, k = 3)
      .orderBy("rnk").select("vec_id").as[Long].collect()
    val ivf = Similarity.ivfTopK(emb.where(col("vec_id") === 0), emb, cents,
        k = 3, nprobe = 2)
      .orderBy("rnk").select("vec_id").as[Long].collect()
    ivf shouldBe brute
  }

  test("lshTopK recalls most of bruteTopK's neighbors (loose maxDist = all)") {
    val brute = Similarity.bruteTopK(emb.where(col("vec_id") === 0), emb, k = 3)
      .select("vec_id").as[Long].collect().toSet
    // maxDist 2.0 covers the whole unit sphere → recall must be total
    val lsh = Similarity.lshTopK(emb.where(col("vec_id") === 0), emb, k = 3,
        maxDist = 2.0)
      .select("vec_id").as[Long].collect().toSet
    lsh shouldBe brute
  }

  test("lshTopK is deterministic under a fixed seed") {
    val a = Similarity.lshTopK(emb.where(col("vec_id") === 0), emb, k = 3)
      .select("vec_id", "rnk").as[(Long, Long)].collect().toSeq
    val b = Similarity.lshTopK(emb.where(col("vec_id") === 0), emb, k = 3)
      .select("vec_id", "rnk").as[(Long, Long)].collect().toSeq
    a shouldBe b
  }

  test("ivfTopK degrades to probing every bucket when nprobe exceeds the codebook") {
    val cents = emb.where(col("vec_id").isin(0L, 3L))
    val out = Similarity.ivfTopK(emb.where(col("vec_id") === 0), emb, cents,
        k = 3, nprobe = 50)
      .orderBy("rnk").select("vec_id").as[Long].collect()
    out shouldBe Array(1L, 2L, 3L)   // == bruteTopK, NOT empty
  }

  test("assign and ivfTopK accept array<double> embeddings") {
    val dEmb = Seq(
      (0L, Array(1.0, 0.0)), (1L, Array(0.9, 0.1)), (2L, Array(0.0, 1.0)))
      .toDF("vec_id", "embedding")
    val cents = dEmb.where(col("vec_id").isin(0L, 2L))
    Similarity.assign(dEmb, cents).count() shouldBe 3
    Similarity.ivfTopK(dEmb.where(col("vec_id") === 0), dEmb, cents,
      k = 2, nprobe = 2).count() shouldBe 2
  }

  test("ivfTopK with nprobe=1 trades recall for scan reduction") {
    val cents = emb.where(col("vec_id").isin(0L, 3L))
    val ivf = Similarity.ivfTopK(emb.where(col("vec_id") === 0), emb, cents,
        k = 3, nprobe = 1)
      .select("vec_id").as[Long].collect().toSet
    // only bucket of centroid 0 is scanned → 3 is unreachable
    ivf should not contain 3L
    ivf should contain(1L)
  }

  // 10 well-separated base directions × 10 tightly-noised copies — k-means
  // with k = 10 must recover the planted partition
  private def clusteredEmbTrain = {
    val rnd = new scala.util.Random(13)
    val bases = Array.fill(10)(Array.fill(16)(rnd.nextGaussian().toFloat))
    (for { c <- 0 until 10; i <- 0 until 10 } yield
      (c * 10L + i, bases(c).map(x => x + rnd.nextGaussian().toFloat * 0.03f).toSeq))
      .toDF("vec_id", "embedding")
  }

  test("trainCodebook tightens assignment cohesion over the seed codebook") {
    val embT = clusteredEmbTrain
    // iters = 0 returns the raw deterministic seed draw — the baseline
    def cohesion(codebook: org.apache.spark.sql.DataFrame): Double = {
      val cents = codebook.select(col("cid"), col("embedding").as("cv"))
      Similarity.assign(embT,
          codebook.select(col("cid").as("vec_id"), col("embedding")))
        .join(cents, "cid")
        .select(avg(Similarity.cosine(col("embedding"), col("cv"))))
        .head().getDouble(0)
    }
    val seeds = Similarity.trainCodebook(embT, k = 10, iters = 0)
    val trained = Similarity.trainCodebook(embT, k = 10, iters = 4)
    trained.count() shouldBe 10
    val (c0, c4) = (cohesion(seeds), cohesion(trained))
    c4 should be >= c0
    // farthest-first init seeds every well-separated planted cluster, so
    // training converges to ~perfect cohesion (members sit at cos ≳ 0.99
    // from their base direction)
    c4 should be >= 0.97
    // and the planted partition is exactly recovered: one cell per cluster
    val cells = Similarity.assign(embT,
        trained.select(col("cid").as("vec_id"), col("embedding")))
      .select(col("vec_id"), col("cid")).as[(Long, Long)].collect().toMap
    (0 until 10).foreach { c =>
      (0 until 10).map(i => cells(c * 10L + i)).toSet.size shouldBe 1
    }
    cells.values.toSet.size shouldBe 10
  }

  test("trainCodebook is bit-identical under different partitioning") {
    val embT = clusteredEmbTrain
    def train(parts: Int) =
      Similarity.trainCodebook(embT.repartition(parts), k = 5, iters = 3)
        .orderBy("cid").collect().map(_.toString).toSeq
    train(2) shouldBe train(9)
  }

  test("drawKey swaps only the candidate draw: deterministic, partition-invariant") {
    // the cross-engine hook behind llm_ivf_train_poly — an affine
    // lattice draw must give a valid, bit-stable codebook whose identity
    // does not depend on partitioning (the draw is a total order)
    val embT = clusteredEmbTrain
    val poly = (col("vec_id") * 6007 + 1009) % 9973
    def train(parts: Int) =
      Similarity.trainCodebook(embT.repartition(parts), k = 5, iters = 3,
          drawKey = Some(poly))
        .orderBy("cid").collect().map(_.toString).toSeq
    val a = train(2)
    a should have length 5
    a shouldBe train(9)
    // and it is a genuinely different draw than the xxhash64 default
    a should not be Similarity.trainCodebook(embT, k = 5, iters = 3)
      .orderBy("cid").collect().map(_.toString).toSeq
  }

  test("sampled training: sample >= corpus is bit-identical to full training") {
    // the sample is the lowest-hash prefix on the SAME draw lattice as
    // the init, so a sample covering the whole corpus must change
    // nothing — the identity that pins the sampled path to the full one
    val embT = clusteredEmbTrain
    def canon(df: org.apache.spark.sql.DataFrame) =
      df.orderBy("cid").collect().map(_.toString).toSeq
    canon(Similarity.trainCodebook(embT, k = 5, iters = 3,
      sampleSize = Some(100000))) shouldBe
      canon(Similarity.trainCodebook(embT, k = 5, iters = 3))
  }

  test("sampled training on a strict subset: valid, deterministic, cohesive") {
    val embT = clusteredEmbTrain // 100 vectors, 10 planted clusters
    def train() = Similarity.trainCodebook(embT, k = 10, iters = 4,
      sampleSize = Some(60))
    val a = train().orderBy("cid").collect().map(_.toString).toSeq
    a should have length 10
    a shouldBe train().orderBy("cid").collect().map(_.toString).toSeq
    // assignment over the FULL corpus still recovers a sane clustering:
    // every planted cluster's members land together
    val cells = Similarity.assign(embT,
        train().select(col("cid").as("vec_id"), col("embedding")))
      .select(col("vec_id"), col("cid")).as[(Long, Long)].collect().toMap
    (0 until 10).foreach { c =>
      (0 until 10).map(i => cells(c * 10L + i)).toSet.size shouldBe 1
    }
    // and semDedup composes with it (train on the sample, prune all)
    val survivors = graft.llm.Dedup.semDedup(embT, threshold = 0.995,
      numClusters = 10, trainSample = Some(60)).count()
    survivors should be <= 100L
    survivors should be > 0L
  }

  // 2 subspaces × 2 centroids × 2 dims: sub 0 separates on x, sub 1 on y
  private val pqCb: Seq[Seq[Seq[Double]]] = Seq(
    Seq(Seq(0.0, 0.0), Seq(10.0, 10.0)),
    Seq(Seq(5.0, 5.0), Seq(-5.0, -5.0)))

  test("pqEncode assigns each subspace slice to its nearest centroid") {
    val vecs = Seq(
      (0L, Array(1.0f, 1.0f, 4.0f, 6.0f)),    // sub0→code0, sub1→code0
      (1L, Array(9.0f, 8.0f, -4.0f, -6.0f)),  // sub0→code1, sub1→code1
      (2L, Array(11.0f, 9.0f, 4.0f, 4.0f)))   // sub0→code1, sub1→code0
      .toDF("vec_id", "embedding")
    val out = Similarity.pqEncode(vecs, pqCb)
      .orderBy("vec_id", "subspace")
      .as[(Long, Long, Long)].collect()
    out shouldBe Array((0L, 0L, 0L), (0L, 1L, 0L), (1L, 0L, 1L),
      (1L, 1L, 1L), (2L, 0L, 1L), (2L, 1L, 0L))
  }

  test("pqEncode ties go to the lowest code; defects yield no rows") {
    // (5,5) is equidistant from (0,0) and (10,10) → code 0
    val tie = Seq((0L, Array(5.0f, 5.0f, 5.0f, 5.0f))).toDF("vec_id", "embedding")
    Similarity.pqEncode(tie, pqCb).where(col("subspace") === 0)
      .select("code").as[Long].head() shouldBe 0L
    // wrong dims and NaN elements are the embeddingReport defect classes
    val bad = Seq(
      (1L, Array(1.0f, 2.0f, 3.0f)),               // dims ≠ 4
      (2L, Array(Float.NaN, 0f, 0f, 0f)),           // NaN
      (3L, Array(1.0f, 1.0f, 1.0f, 1.0f)))          // healthy
      .toDF("vec_id", "embedding")
    Similarity.pqEncode(bad, pqCb).select("vec_id").distinct()
      .as[Long].collect() shouldBe Array(3L)
  }

  test("pqTopK: on-grid vectors rank exactly; dist16 is the integer 16x squared L2") {
    // 2 subspaces x 2 centroids x 2 dims; centroids at quarter-step values
    val cb = Seq(
      Seq(Seq(0.0, 0.0), Seq(1.0, 1.0)),
      Seq(Seq(0.0, 0.0), Seq(2.0, 2.0)))
    // corpus ON the centroid grid: codes are exact, ADC distance = true distance
    val corpus = Seq(
      (0L, Array(0.0f, 0.0f, 0.0f, 0.0f)), // cells (0,0)
      (1L, Array(1.0f, 1.0f, 0.0f, 0.0f)), // cells (1,0)
      (2L, Array(1.0f, 1.0f, 2.0f, 2.0f))  // cells (1,1)
    ).toDF("vec_id", "embedding")
    val queries = Seq((100L, Array(1.0f, 1.0f, 0.0f, 0.0f)))
      .toDF("qid", "embedding")
    val codes = Similarity.pqEncode(corpus, cb)
    val out = Similarity.pqTopK(queries, codes, cb, k = 3)
      .orderBy("rnk").as[(Long, Long, Long, Long)].collect()
    // true squared L2 from (1,1,0,0): v1 -> 0, v0 -> 2, v2 -> 8; x16
    out shouldBe Array(
      (100L, 1L, 0L, 1L), (100L, 0L, 32L, 2L), (100L, 2L, 128L, 3L))
  }

  test("pqTopK quantizes off-grid queries with floor(q*4 + 0.5) and is partition-invariant") {
    val cb = Seq(Seq(Seq(0.0, 0.0), Seq(1.0, 1.0)))
    val corpus = Seq(
      (0L, Array(0.0f, 0.0f)), (1L, Array(1.0f, 1.0f))).toDF("vec_id", "embedding")
    // 0.95 -> floor(3.8+0.5)=4 quarter-steps = 1.0 exactly: dist to
    // centroid 1 becomes 0, to centroid 0 becomes 16*(1+1)=32
    val queries = Seq((7L, Array(0.95f, 0.95f))).toDF("qid", "embedding")
    val codes = Similarity.pqEncode(corpus, cb)
    val out = Similarity.pqTopK(queries, codes, cb, k = 2)
      .orderBy("rnk").as[(Long, Long, Long, Long)].collect()
    out shouldBe Array((7L, 1L, 0L, 1L), (7L, 0L, 32L, 2L))
    val again = Similarity.pqTopK(queries, codes.repartition(5), cb, k = 2)
      .orderBy("rnk").collect()
    out.map(t => (t._1, t._2, t._3, t._4)) shouldBe again.map(r =>
      (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
  }

  test("ivfPqTopK probes only routed cells; probing all cells equals pqTopK") {
    // coarse: 2 cells at (0,0,..) and (4,4,..); PQ: 2 subspaces x 2 x 2
    val coarse = Seq(Seq(0.0, 0.0, 0.0, 0.0), Seq(4.0, 4.0, 4.0, 4.0))
    val cb = Seq(
      Seq(Seq(0.0, 0.0), Seq(4.0, 4.0)),
      Seq(Seq(0.0, 0.0), Seq(4.0, 4.0)))
    val corpus = Seq(
      (0L, Array(0.0f, 0.0f, 0.0f, 0.0f)),
      (1L, Array(0.0f, 0.5f, 0.0f, 0.0f)),
      (2L, Array(4.0f, 4.0f, 4.0f, 4.0f)),
      (3L, Array(4.0f, 3.5f, 4.0f, 4.0f))).toDF("vec_id", "embedding")
    val queries = Seq((9L, Array(0.25f, 0.0f, 0.0f, 0.0f))).toDF("qid", "embedding")
    // nprobe 1: the query routes to cell 0 — vectors 2,3 must NOT appear
    val near = Similarity.ivfPqTopK(queries, corpus, coarse, cb, k = 4, nprobe = 1)
      .select("vec_id").as[Long].collect().toSet
    near shouldBe Set(0L, 1L)
    // nprobe = |cells|: identical to flat pqTopK over the same codes
    val all = Similarity.ivfPqTopK(queries, corpus, coarse, cb, k = 4, nprobe = 2)
      .orderBy("rnk").collect().map(_.toSeq)
    val flat = Similarity.pqTopK(queries,
        Similarity.pqEncode(corpus, cb), cb, k = 4)
      .orderBy("rnk").collect().map(_.toSeq)
    all shouldBe flat
  }

  test("pqIndex save → loadPqIndex → searchPqIndex is identity with inline ivfPqTopK") {
    val coarse = Seq(Seq(0.0, 0.0, 0.0, 0.0), Seq(4.0, 4.0, 4.0, 4.0))
    val cb = Seq(
      Seq(Seq(0.0, 0.0), Seq(4.0, 4.0)),
      Seq(Seq(0.25, 0.0), Seq(4.0, 3.75)))
    val corpus = Seq(
      (0L, Array(0.0f, 0.0f, 0.0f, 0.0f)),
      (1L, Array(0.0f, 0.5f, 0.0f, 0.0f)),
      (2L, Array(4.0f, 4.0f, 4.0f, 4.0f)),
      (3L, Array(4.0f, 3.5f, 4.0f, 4.0f))).toDF("vec_id", "embedding")
    val queries = Seq(
      (9L, Array(0.25f, 0.0f, 0.0f, 0.0f)),
      (8L, Array(4.0f, 4.0f, 3.75f, 4.0f))).toDF("qid", "embedding")
    val dir = "/tmp/graft_test_pq_index"
    graft.sources.Sinks.pqIndex(corpus, dir, coarse, cb)
    val idx = Similarity.loadPqIndex(spark, dir)
    // codebooks round-trip EXACTLY (quarter-step doubles are exact)
    idx.coarse shouldBe coarse
    idx.codebooks shouldBe cb
    // codes directory is partitioned by cell — the layout that lets a
    // probed-cell set prune files before any scoring
    new java.io.File(s"$dir/codes").listFiles().map(_.getName)
      .filter(_.startsWith("cell=")).toSet shouldBe Set("cell=0", "cell=1")
    for (np <- Seq(1, 2)) {
      val loaded = Similarity.searchPqIndex(queries, idx, k = 4, nprobe = np)
        .orderBy("qid", "rnk").collect().map(_.toSeq)
      val inline = Similarity.ivfPqTopK(queries, corpus, coarse, cb, k = 4, nprobe = np)
        .orderBy("qid", "rnk").collect().map(_.toSeq)
      loaded shouldBe inline
    }
  }

  test("rerankExact: exact re-rank fixes ADC rank inversions; dist_b is the exact fold x1024 (r20)") {
    // one coarse cell (everything routed); two 1-dim PQ subspaces with
    // centroids {0, 1}. v1 = (0.45, 1.0) codes to (0, 1) — ADC sees it
    // 16 away from q = (1,1) — while v2 = (0.55, 0.55) codes to (1, 1)
    // — ADC 0 — yet v1 is EXACTLY closer (0.3025 < 0.405): the
    // quantization inverts the true order, the re-rank must fix it.
    val coarse = Seq(Seq(0.0, 0.0))
    val cb = Seq(Seq(Seq(0.0), Seq(1.0)), Seq(Seq(0.0), Seq(1.0)))
    val corpus = Seq(
      (1L, Array(0.45f, 1.0f)),
      (2L, Array(0.55f, 0.55f)),
      (3L, Array(0.0f, 0.0f))).toDF("vec_id", "embedding")
    val queries = Seq((9L, Array(1.0f, 1.0f))).toDF("qid", "embedding")
    val adc = Similarity.ivfPqTopK(queries, corpus, coarse, cb, k = 3, nprobe = 1)
    adc.orderBy("rnk").select("vec_id").as[Long].collect() shouldBe
      Array(2L, 1L, 3L) // the inversion, visible at the ADC stage
    val rr = Similarity.rerankExact(queries, adc, corpus, k = 3)
      .orderBy("rnk").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getAs[Number](3).longValue))
    rr.map(_._2) shouldBe Array(1L, 2L, 3L) // fixed by the exact metric
    // dist_b replays as floor(1024 x the sequential double fold) over
    // the float-widened vectors — the engine-exact integer contract
    def d(v: Array[Float]): Long = {
      val q = Array(1.0f, 1.0f)
      var acc = 0.0
      for (j <- v.indices)
        acc += (q(j).toDouble - v(j).toDouble) * (q(j).toDouble - v(j).toDouble)
      math.floor(acc * 1024).toLong
    }
    rr.map(_._3) shouldBe Array(
      d(Array(0.45f, 1.0f)), d(Array(0.55f, 0.55f)), d(Array(0.0f, 0.0f)))
    // rnk is dense 1..k per query
    rr.map(_._4) shouldBe Array(1L, 2L, 3L)
  }

  test("clusterBalance assigns PQ cells and caps each cell in shuffleHash order") {
    // 1 subspace, 2 centroids at (0,0) and (4,4): vectors near each are
    // assigned to it; cap 2 binds for the origin cluster (3 members)
    val cb = Seq(Seq(Seq(0.0, 0.0), Seq(4.0, 4.0)))
    val vecs = Seq(
      (1L, Array(0.1f, 0.0f)), (2L, Array(0.0f, 0.2f)), (3L, Array(0.3f, 0.3f)),
      (10L, Array(4.1f, 3.9f))).toDF("vec_id", "embedding")
    val out = Similarity.clusterBalance(vecs, cb, capPerCluster = 2)
      .orderBy("vec_id").as[(Long, Long)].collect()
    val byCluster = out.groupBy(_._2)
    byCluster(0L).length shouldBe 2 // cap binds: 3 near-origin vectors -> 2
    byCluster(1L).map(_._1) shouldBe Array(10L)
    // the kept pair is the shuffleHash-order prefix of {1, 2, 3}
    val hash = (id: Long) => ((id % 999999937L) * 654435887L) % 999999937L
    val expected = Seq(1L, 2L, 3L).sortBy(id => (hash(id), id)).take(2).toSet
    byCluster(0L).map(_._1).toSet shouldBe expected
  }

  test("clusterBalance: multi-subspace cell id is Σ code·K^s; defects drop") {
    // 2 subspaces × 2 centroids of 1 dim each: centroids {0, 4} per
    // subspace; vector (4, 0) → codes (1, 0) → cell 1·2+0 = 2
    val cb = Seq(Seq(Seq(0.0), Seq(4.0)), Seq(Seq(0.0), Seq(4.0)))
    val vecs = Seq(
      (1L, Array(4.0f, 0.0f)), (2L, Array(0.0f, 4.0f)), (3L, Array(4.0f, 4.0f)),
      (4L, Array(1.0f, 1.0f, 1.0f)), // wrong dims -> dropped
      (5L, Array(Float.NaN, 0.0f))   // NaN -> dropped
    ).toDF("vec_id", "embedding")
    val out = Similarity.clusterBalance(vecs, cb, capPerCluster = 10)
      .as[(Long, Long)].collect().toMap
    out shouldBe Map(1L -> 2L, 2L -> 1L, 3L -> 3L)
  }

  test("clusterBalance is invariant under input partitioning") {
    val cb = Seq(clusterishCodebook)
    val vecs = (0 until 200).map(i =>
      (i.toLong, Array.tabulate(4)(j => ((i * 7 + j * 3) % 11 - 5).toFloat)))
      .toDF("vec_id", "embedding")
    val a = Similarity.clusterBalance(vecs, cb, 20).orderBy("vec_id").collect()
    val b = Similarity.clusterBalance(vecs.repartition(13), cb, 20)
      .orderBy("vec_id").collect()
    a shouldBe b
  }

  private def clusterishCodebook: Seq[Seq[Double]] =
    (0 until 4).map(k => (0 until 4).map(j => (((k * 17 + j * 7) % 19) - 9) / 4.0))

  test("quantizedLshTopK: a near-identical query surfaces its source at rank 1") {
    val base = (0 until 64).map(i => (i % 7 - 3) * 0.1)
    def shift(d: Double) = base.zipWithIndex.map { case (x, i) =>
      if (i % 5 == 0) x + d else x
    }
    val corpus = Seq(
      (0L, base), (1L, shift(0.02)), (2L, shift(0.3)),
      (3L, (0 until 64).map(i => if (i % 2 == 0) 0.3 else -0.3)))
      .toDF("vec_id", "v")
      .select(col("vec_id"), col("v").cast("array<double>").as("v"))
    val queries = Seq((100L, shift(0.01))).toDF("qid", "v")
      .select(col("qid"), col("v").cast("array<double>").as("v"))
    val out = Similarity.quantizedLshTopK(queries, corpus, k = 2, vecCol = "v")
      .orderBy(col("cos2_bp").desc, col("vec_id"))
      .as[(Long, Long, Long)].collect()
    out.length should be <= 2
    // the query is a tiny perturbation of vectors 0/1 — its best match
    // must be one of them, near cos² = 1, and the orthogonal vector 3
    // must not outrank true neighbors
    Set(0L, 1L) should contain(out.head._2)
    out.head._3 should be > 9500L
    out.map(_._2) should not contain 3L
  }

  test("pqEncode works on double vectors and is partition-invariant") {
    val vecs = spark.range(50).select(col("id").as("vec_id"),
      array((0 until 4).map(j => (col("id") * (j + 1) % 21).cast("double") - 10): _*)
        .as("embedding"))
    val once = Similarity.pqEncode(vecs, pqCb).collect().toSet
    val again = Similarity.pqEncode(vecs.repartition(7), pqCb).collect().toSet
    again shouldBe once
    once.size shouldBe 100 // 50 vectors × 2 subspaces
    an[IllegalArgumentException] should be thrownBy
      graft.functions.PqEncode(lit("x"), Seq.empty)
  }

  // --- marginMine (margin-based bitext mining) ---

  /** Deterministic pseudo-random-ish unit-cube vectors, plus one planted
    * near-parallel pair (src 0 ↔ tgt 100) the miner must recover. */
  private def bitextFixture = {
    def v(seed: Long) =
      (0 until 8).map(i => ((seed * 31 + i * 17) % 19).toDouble / 19.0)
    val src = (0L to 5L).map(s => (s, v(s * 7 + 1))).toDF("a", "embedding")
      .select(col("a"), col("embedding").cast("array<double>").as("embedding"))
    val tgt = ((100L, v(1L)) +: (101L to 105L).map(t => (t, v(t * 13 + 3))))
      .toDF("b", "embedding")
      .select(col("b"), col("embedding").cast("array<double>").as("embedding"))
    (src, tgt)
  }

  test("marginMine recovers the planted parallel pair with margin > 1000") {
    val (src, tgt) = bitextFixture
    val out = Similarity.marginMine(src, tgt, k = 2)
      .as[(Long, Long, Long)].collect()
      .map { case (a, b, m) => (a, (b, m)) }.toMap
    out(0L)._1 shouldBe 100L // src 0 and tgt 100 share the identical vector
    out(0L)._2 should be > 1000L
  }

  test("marginMine output is a one-to-one matching (mutual best both ways)") {
    val (src, tgt) = bitextFixture
    val out = Similarity.marginMine(src, tgt, k = 2)
      .as[(Long, Long, Long)].collect()
    out.map(_._1).distinct.length shouldBe out.length
    out.map(_._2).distinct.length shouldBe out.length
    all(out.map(_._3)) should be <= 2L * 2 * 1000
  }

  test("marginMine minMarginFp filters and candidates restrict the pair space") {
    val (src, tgt) = bitextFixture
    val everything = Similarity.marginMine(src, tgt, k = 2)
      .as[(Long, Long, Long)].collect()
    val strict = Similarity.marginMine(src, tgt, k = 2,
        minMarginFp = everything.map(_._3).max)
      .as[(Long, Long, Long)].collect()
    strict.toSet shouldBe everything.filter(_._3 == everything.map(_._3).max).toSet
    // candidate frame without src 0's true match: the planted pair can't mine
    val cand = src.select("a").crossJoin(tgt.select("b"))
      .where(!(col("a") === 0L && col("b") === 100L))
    val restricted = Similarity.marginMine(src, tgt, k = 2,
        candidates = Some(cand))
      .as[(Long, Long, Long)].collect()
    restricted.map(r => (r._1, r._2)) should not contain ((0L, 100L))
  }

  test("lshCandidates: identical vectors always co-bucket, pairs distinct, subset of cross space") {
    val (src, tgt) = bitextFixture
    // a tgt clone of src 0 shares every table's signature — the pair
    // MUST surface regardless of plane draw
    val clone = src.where(col("a") === 0L)
      .select((col("a") + 900L).as("b"), col("embedding"))
    val cand = Similarity.lshCandidates(src, tgt.unionAll(clone),
      numTables = 4, bits = 4, dims = 8)
      .as[(Long, Long)].collect()
    cand should contain ((0L, 900L))
    // distinct by contract (a multi-table pair must score once downstream)
    cand.toSeq.distinct should have size cand.length.toLong
    val srcIds = src.select("a").as[Long].collect().toSet
    all(cand.map(_._1)) should (be >= 0L)
    cand.map(_._1).toSet.subsetOf(srcIds) shouldBe true
  }

  test("hardNegatives: positive excluded, planted near-dup tops the list with a small margin") {
    def v(seed: Long) =
      (0 until 8).map(i => ((seed * 31 + i * 17) % 19).toDouble / 19.0)
    val base = v(1L)
    val near = base.updated(0, base(0) + 0.02) // the planted hard negative
    val corpus = Seq((1L, base), (2L, near), (3L, v(9L)))
      .toDF("vec_id", "embedding")
      .select(col("vec_id"), col("embedding").cast("array<double>").as("embedding"))
    val queries = Seq((1000L, base)).toDF("qid", "embedding")
      .select(col("qid"), col("embedding").cast("array<double>").as("embedding"))
    val positives = Seq((1000L, 1L)).toDF("qid", "vec_id")
    val out = Similarity.hardNegatives(queries, corpus, positives, k = 3,
        numTables = 4, bits = 2, dims = 8)
      .as[(Long, Long, Long, Long, Long, Long)].collect()
    // the labeled positive never appears as a negative
    out.map(r => (r._1, r._2)) should not contain ((1000L, 1L))
    // the near-dup is the hardest (rank-1) negative; identical query ↔
    // positive scores 10000 and the margin is small but positive
    val top = out.find(_._3 == 1L).get
    top._2 shouldBe 2L
    top._5 shouldBe 10000L          // pos_bp: identical vectors
    top._6 should (be >= 0L and be <= 500L)
    // margins are pos − neg for every row
    out.foreach(r => r._6 shouldBe r._5 - r._4)
  }

  test("hardNegatives: several positives per query — best pos_bp, no fanout") {
    def v(seed: Long) =
      (0 until 8).map(i => ((seed * 31 + i * 17) % 19).toDouble / 19.0)
    val base = v(1L)
    val near = base.updated(0, base(0) + 0.02)
    val weakPos = base.updated(1, base(1) + 0.05) // second labeled positive
    val corpus = Seq((1L, base), (2L, near), (3L, v(9L)), (4L, weakPos))
      .toDF("vec_id", "embedding")
      .select(col("vec_id"), col("embedding").cast("array<double>").as("embedding"))
    val queries = Seq((1000L, base)).toDF("qid", "embedding")
      .select(col("qid"), col("embedding").cast("array<double>").as("embedding"))
    val positives = Seq((1000L, 1L), (1000L, 4L)).toDF("qid", "vec_id")
    val out = Similarity.hardNegatives(queries, corpus, positives, k = 3,
        numTables = 4, bits = 2, dims = 8)
      .as[(Long, Long, Long, Long, Long, Long)].collect()
    // no labeled positive leaks in as a negative
    out.map(r => (r._1, r._2)).toSet.intersect(
      Set((1000L, 1L), (1000L, 4L))) shouldBe empty
    // exactly one row per (qid, rank): the second positive must NOT fan
    // the negatives out with an ambiguous pos_bp
    out.groupBy(r => (r._1, r._3)).values.foreach(_.length shouldBe 1)
    // pos_bp is the BEST labeled positive's score (exact match → 10000)
    out.foreach(_._5 shouldBe 10000L)
    out.foreach(r => r._6 shouldBe r._5 - r._4)
  }

  test("knnLabel: majority wins; ties break similarity then label; partition-invariant") {
    def v(seed: Long) =
      (0 until 8).map(i => ((seed * 31 + i * 17) % 19).toDouble / 19.0)
    val base = v(1L)
    val near = base.updated(0, base(0) + 0.02)
    val far = base.updated(1, base(1) + 0.05)
    def df(rows: Seq[(Long, Seq[Double], Int)]) =
      rows.toDF("vec_id", "embedding", "label")
        .select(col("vec_id"),
          col("embedding").cast("array<double>").as("embedding"), col("label"))
    val queries = Seq((1000L, base)).toDF("qid", "embedding")
      .select(col("qid"), col("embedding").cast("array<double>").as("embedding"))
    def predict(corpus: Seq[(Long, Seq[Double], Int)], k: Int) =
      Similarity.knnLabel(queries, df(corpus), k = k,
          numTables = 4, bits = 2, dims = 8)
        .as[(Long, Long, Long, Long)].collect().toSeq
    // majority: two label-3 neighbors outvote the single label-5 exact hit
    predict(Seq((1L, base, 5), (2L, near, 3), (3L, far, 3)), k = 3) shouldBe
      Seq((1000L, 3L, 2L, 3L))
    // vote tie → best similarity wins (the exact copy carries label 5)
    predict(Seq((1L, base, 5), (2L, near, 3)), k = 2) shouldBe
      Seq((1000L, 5L, 1L, 2L))
    // full tie (two exact copies) → lowest label
    predict(Seq((1L, base, 9), (2L, base, 4)), k = 2) shouldBe
      Seq((1000L, 4L, 1L, 2L))
    // partition-invariant
    val big = Seq((1L, base, 5), (2L, near, 3), (3L, far, 3))
    Similarity.knnLabel(queries, df(big).repartition(5), k = 3,
        numTables = 4, bits = 2, dims = 8)
      .as[(Long, Long, Long, Long)].collect().toSeq shouldBe
      Seq((1000L, 3L, 2L, 3L))
    an[IllegalArgumentException] should be thrownBy
      Similarity.knnLabel(queries, df(big).drop("label"), k = 3)
    // non-integral labels are a caller error, never silent NULL votes:
    // a string-labeled corpus used to elect pred_label = null unanimously
    val strLabeled = df(big).withColumn("label",
      concat(lit("cls_"), col("label")))
    val eStr = intercept[IllegalArgumentException] {
      Similarity.knnLabel(queries, strLabeled, k = 3,
        numTables = 4, bits = 2, dims = 8) }
    eStr.getMessage should include ("must be integral")
    an[IllegalArgumentException] should be thrownBy
      Similarity.knnLabel(queries,
        df(big).withColumn("label", col("label").cast("double")), k = 3)
  }

  test("marginMine is invariant under repartitioning") {
    val (src, tgt) = bitextFixture
    val once = Similarity.marginMine(src, tgt, k = 2).collect().toSet
    val again = Similarity.marginMine(
      src.repartition(7), tgt.repartition(5), k = 2).collect().toSet
    again shouldBe once
  }

  test("randomProject: lattice signs exact, components are kernel dots") {
    // dims=2, outDims=1: sign(i=1,j=1) = −1 (15171 % 9973 = 5198),
    // sign(i=2,j=1) = +1 (21178 % 9973 = 1232) → y = −vq1 + vq2
    val df = Seq((1L, Seq(1.0f, 0.5f))).toDF("vec_id", "embedding")
    val out = Similarity.randomProject(df, outDims = 1, dims = 2).collect()
    out.head.getSeq[Long](out.head.fieldIndex("proj")) shouldBe Seq(-32L)
    // width and determinism at the real shape
    val full = Seq((1L, Seq.tabulate(64)(i => i / 64.0f)),
      (2L, Seq.tabulate(64)(i => 1.0f - i / 64.0f)))
      .toDF("vec_id", "embedding")
    val p = Similarity.randomProject(full).collect()
      .map(r => r.getLong(0) -> r.getSeq[Long](r.fieldIndex("proj"))).toMap
    p(1L).length shouldBe 16
    Similarity.randomProject(full.repartition(3)).collect()
      .map(r => r.getLong(0) -> r.getSeq[Long](r.fieldIndex("proj")))
      .toMap shouldBe p
    an[IllegalArgumentException] should be thrownBy
      Similarity.randomProject(full, outDims = 65)
  }

  test("annRecall: hit counting, absent-approx queries score 0") {
    val truth = Seq((1L, 10L), (1L, 20L), (1L, 30L), (2L, 10L))
      .toDF("qid", "vec_id")
    val approx = Seq((1L, 10L), (1L, 30L), (1L, 40L)).toDF("qid", "vec_id")
    val out = Similarity.annRecall(truth, approx).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3))))
      .toMap
    out(1L) shouldBe ((3L, 2L, 6666L))
    out(2L) shouldBe ((1L, 0L, 0L))   // approx returned nothing → 0
  }

  test("quantizedBruteTopK: exact integer metric, anti/orthogonal dropped") {
    val q = Seq((100L, Seq(1.0f, 0.0f))).toDF("qid", "embedding")
    val c = Seq(
      (1L, Seq(1.0f, 0.0f)),    // cos² = 10⁴
      (2L, Seq(0.0f, 1.0f)),    // dot 0 → dropped
      (3L, Seq(-1.0f, 0.0f)),   // anti → dropped
      (4L, Seq(1.0f, 1.0f))     // cos² = 5000 (rounded)
    ).toDF("vec_id", "embedding")
    val out = Similarity.quantizedBruteTopK(q, c, k = 10).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    out.toSeq shouldBe Seq((100L, 1L, 10000L), (100L, 4L, 5000L))
  }

  test("mmrRerank: twins demote, ties break to higher simq then lower id") {
    // ids 10/11 identical vectors (pair sim 10000), id 20 orthogonal
    val pool = Seq(
      (10L, 9000L, Seq(2L, 0L), 4L),
      (11L, 9000L, Seq(2L, 0L), 4L),
      (20L, 5000L, Seq(0L, 3L), 9L)
    ).toDF("vec_id", "simq_bp", "vq", "na")
    val out = Similarity.mmrRerank(pool, k = 3).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    // first pick: simq tie 10 vs 11 → lower id; second: the twin's
    // mmr is 9000−10000 < 5000−0 so the orthogonal 20 wins; the twin
    // lands last carrying its full redundancy
    out.toSeq shouldBe Seq((1L, 10L, 9000L, 0L), (2L, 20L, 5000L, 0L),
      (3L, 11L, 9000L, 10000L))
    // k beyond the pool clamps
    Similarity.mmrRerank(pool, k = 9).collect().length shouldBe 3
    an[IllegalArgumentException] should be thrownBy
      Similarity.mmrRerank(pool, k = 0)
  }

  test("rrfFuse: both-list ids sum their terms, single-list ids carry one, absent rank is 0") {
    val lex = Seq((10L, 1), (20L, 2)).toDF("id", "rank")
    val den = Seq((20L, 1), (30L, 2)).toDF("id", "rank")
    val rows = Similarity.rrfFuse(lex, den).collect()
    val out = rows.map(r =>
      r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    // 10⁶//61 = 16393, 10⁶//62 = 16129
    out(20L) shouldBe ((2L, 1L, 32522L))   // in both lists → sums, wins
    out(10L) shouldBe ((1L, 0L, 16393L))
    out(30L) shouldBe ((0L, 2L, 16129L))
    rows.map(_.getLong(0)).toSeq shouldBe Seq(20L, 10L, 30L)
    an[IllegalArgumentException] should be thrownBy
      Similarity.rrfFuse(lex, den, kRrf = 0)
  }
}
