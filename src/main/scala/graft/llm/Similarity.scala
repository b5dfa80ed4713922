package graft.llm

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Approximate-nearest-neighbor / similarity search over an embedding
  * column (SURVEY §2.9 L3; north-star mandate — absent in the reference).
  *
  * Two tiers:
  *  - [[bruteTopK]]: exact cosine top-k — broadcast the (small) query set,
  *    score every vector with codegen'd higher-order functions, take top-k
  *    per query via window rank. The correctness baseline.
  *  - [[ivfTopK]]: IVF-style bucketed search — assign vectors to their
  *    nearest centroid with a NARROW argmax over a driver-collected
  *    centroid literal (no join, no shuffle, no row blow-up), then probe
  *    only `nprobe` buckets per query. At 100 TB this turns a full scan per
  *    query into a ~(nprobe/nlist) partial scan; the only wide op left is
  *    the probe-bucket equi-join (hash-partitioned, AQE-managed).
  *
  * Norms are computed ONCE per row before any pairing ([[withNorm]]), so a
  * pair costs a single dot product — not dot + two norms over the same
  * vectors again. All arithmetic is double-precision over the float vectors
  * via `zip_with`/`aggregate` — whole-stage-codegen'd, no UDFs, no MLlib
  * vector conversions on the hot path.
  */
object Similarity {

  /** dot(a, b) in double precision, left-to-right accumulation. Native
    * codegen kernel (graft.functions.DotProduct) — the HOF formulation
    * `aggregate(zip_with(...))` is interpreted and allocates per row. */
  def dot(a: Column, b: Column): Column = graft.functions.VectorFunctions.dot(a, b)

  def norm(a: Column): Column = sqrt(dot(a, a))

  def cosine(a: Column, b: Column): Column = dot(a, b) / (norm(a) * norm(b))

  /** Attach the L2 norm as a column — compute once, reuse across pairs. */
  def withNorm(df: DataFrame, vecCol: String, out: String): DataFrame =
    df.withColumn(out, norm(col(vecCol)))

  /** Exact top-k cosine neighbors for each query vector (excluding self).
    * Output: (qid, vec_id, cos, rank 1..k). */
  def bruteTopK(queries: DataFrame, corpus: DataFrame, k: Int,
                idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    val q = broadcast(withNorm(queries, vecCol, "qn")
      .select(col(idCol).as("qid"), col(vecCol).as("qv"), col("qn")))
    val c = withNorm(corpus.select(col(idCol), col(vecCol)), vecCol, "cn")
    val scored = q.join(c, col("qid") =!= col(idCol))
      .select(col("qid"), col(idCol),
        (dot(col("qv"), col(vecCol)) / (col("qn") * col("cn"))).as("cos"))
    topK(scored, k, idCol)
  }

  /** Per-query top-k by (cos desc, id asc) via the bounded-heap collector
    * (graft.relational.TopK) — each map task keeps k candidates per query
    * instead of the window formulation's full sort of every scored row. */
  private def topK(scored: DataFrame, k: Int, idCol: String): DataFrame =
    graft.relational.TopK.topKPerGroupRanked(
        scored.select(col("qid"), (-col("cos")).as("__negcos"), col(idCol)),
        keys = Seq(col("qid")),
        sortCols = Seq(col("__negcos"), col(idCol)), k = k, rankCol = "rnk")
      .select(col("qid"), col(idCol), (-col("__negcos")).as("cos"), col("rnk"))

  /** Driver-collected centroid set as a literal array of structs
    * `{negid, cv}` with L2-normalized vectors. Centroids are small by
    * contract (the IVF codebook — thousands at most), so the literal stays
    * well under task-binary limits and broadcasts with the plan itself.
    * `negid` (= -cid) makes struct-ordering ties resolve to the LOWEST
    * centroid id under array_max.
    */
  /** Hard ceiling on the driver-collected codebook — 64Ki centroids × a
    * few-hundred-double vectors is the most a plan literal (and driver
    * heap) should ever carry; a corpus-sized frame passed by mistake must
    * fail fast, not OOM the driver. */
  val MaxCentroids = 65536

  private def centroidLit(centroids: DataFrame, idCol: String, vecCol: String): Column = {
    val capped = centroids.select(col(idCol).cast("long"), col(vecCol))
      .limit(MaxCentroids + 1)
    val rows = capped.collect()
    require(rows.length <= MaxCentroids,
      s"IVF codebook exceeds $MaxCentroids centroids — this is a driver-side " +
        "plan literal; cluster the codebook down (or use lshTopK) instead")
    val normed = rows
      .map { r =>
        // element type may be float or double — go through Number
        val v = r.getSeq[Number](1).map(_.doubleValue()).toArray
        val n = math.sqrt(v.map(x => x * x).sum) max java.lang.Double.MIN_VALUE
        (r.getLong(0), v.map(_ / n))
      }
      .sortBy(_._1)
    require(normed.nonEmpty, "centroid set must be non-empty")
    array(normed.map { case (cid, cv) =>
      struct(lit(-cid).as("negid"), typedLit(cv.toSeq).as("cv"))
    }: _*)
  }

  /** Scores per centroid for one row's vector: array of `{cos-ish, negid}`.
    * dot(v, c_norm) ranks identically to cosine for a fixed v. */
  private def centroidScores(vec: Column, cents: Column): Column =
    transform(cents, c =>
      struct(dot(vec, c.getField("cv")).as("s"), c.getField("negid").as("negid")))

  /** Assign every vector to its nearest centroid. Pure narrow projection:
    * argmax via array_max over the centroid literal — no join, no window,
    * no shuffle, stays inside whole-stage codegen. */
  def assign(corpus: DataFrame, centroids: DataFrame,
             idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    val cents = centroidLit(centroids, idCol, vecCol)
    corpus.select(col(idCol), col(vecCol))
      .withColumn("__best", array_max(centroidScores(col(vecCol), cents)))
      .select(col(idCol), col(vecCol), (-col("__best.negid")).as("cid"))
  }

  /** LSH-bucketed ANN (MLlib BucketedRandomProjectionLSH) — the third tier
    * next to [[bruteTopK]] (exact) and [[ivfTopK]] (needs a codebook).
    * Vectors are L2-normalized first, so euclidean bucket distance orders
    * like cosine (cos = 1 − d²/2) and `maxDist` bounds the candidate join.
    * Seeded → deterministic buckets across runs and cluster sizes.
    */
  def lshTopK(queries: DataFrame, corpus: DataFrame, k: Int,
              bucketLength: Double = 1.0, numHashTables: Int = 3,
              maxDist: Double = 1.2, seed: Long = 42L,
              idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    import org.apache.spark.ml.feature.BucketedRandomProjectionLSH
    import org.apache.spark.ml.functions.array_to_vector
    def unitVec(df: DataFrame): DataFrame =
      withNorm(df.select(col(idCol), col(vecCol)), vecCol, "__n")
        .select(col(idCol), array_to_vector(
          transform(col(vecCol), x => x.cast("double") / col("__n"))).as("__v"))
    val lsh = new BucketedRandomProjectionLSH()
      .setInputCol("__v").setOutputCol("__h")
      .setBucketLength(bucketLength).setNumHashTables(numHashTables).setSeed(seed)
    val c = unitVec(corpus)
    val model = lsh.fit(c)
    val joined = model.approxSimilarityJoin(unitVec(queries), c, maxDist, "dist")
      .select(col(s"datasetA.$idCol").as("qid"), col(s"datasetB.$idCol").as(idCol),
        (lit(1.0) - col("dist") * col("dist") / 2).as("cos"))
      .where(col("qid") =!= col(idCol))
    topK(joined, k, idCol)
  }

  /** IVF search: probe the `nprobe` nearest centroids' buckets per query.
    * Recall < 1.0 by construction; the ScalaTest spec measures it against
    * [[bruteTopK]]. */
  def ivfTopK(queries: DataFrame, corpus: DataFrame, centroids: DataFrame,
              k: Int, nprobe: Int = 2,
              idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    val cents = centroidLit(centroids, idCol, vecCol)
    val assigned = withNorm(assign(corpus, centroids, idCol, vecCol), vecCol, "cn")
    // nprobe nearest centroids per query: sort the per-row score array and
    // take the top slice — narrow, no window
    // clamp the slice to the codebook size: slice(arr, -n, n) with n past
    // the array length returns EMPTY, which would silently drop every query
    val sorted = array_sort(centroidScores(col(vecCol), cents))
    val take = least(lit(nprobe), size(sorted))
    val probes = withNorm(queries, vecCol, "qn")
      .select(col(idCol).as("qid"), col(vecCol).as("qv"), col("qn"),
        explode(slice(sorted, -take, take)).as("probe"))
      .select(col("qid"), col("qv"), col("qn"), (-col("probe.negid")).as("cid"))
    // search only the probed buckets — equi-join on centroid id
    val scored = probes.join(assigned, "cid")
      .where(col("qid") =!= col(idCol))
      .select(col("qid"), col(idCol),
        (dot(col("qv"), col(vecCol)) / (col("qn") * col("cn"))).as("cos"))
    topK(scored, k, idCol)
  }
}
