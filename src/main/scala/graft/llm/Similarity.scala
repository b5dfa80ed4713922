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
  *    nearest centroid once (narrow after a small broadcast), then probe
  *    only `nprobe` buckets per query. At 100 TB this turns a full scan per
  *    query into a ~(nprobe/nlist) partial scan, and the assignment join is
  *    an equi-join on centroid id (hash-partitioned, AQE-managed).
  *
  * All arithmetic is double-precision over the float vectors via
  * `zip_with`/`aggregate` — whole-stage-codegen'd, no UDFs, no MLlib
  * vector conversions on the hot path.
  */
object Similarity {

  /** dot(a, b) in double precision, left-to-right accumulation. */
  def dot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")),
      lit(0.0), (acc, x) => acc + x)

  def norm(a: Column): Column = sqrt(dot(a, a))

  def cosine(a: Column, b: Column): Column = dot(a, b) / (norm(a) * norm(b))

  /** Exact top-k cosine neighbors for each query vector (excluding self).
    * Output: (qid, vec_id, cos, rank 1..k). */
  def bruteTopK(queries: DataFrame, corpus: DataFrame, k: Int,
                idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    val q = broadcast(queries.select(col(idCol).as("qid"), col(vecCol).as("qv")))
    val c = corpus.select(col(idCol), col(vecCol))
    val scored = q.join(c, col("qid") =!= col(idCol))
      .select(col("qid"), col(idCol), cosine(col("qv"), col(vecCol)).as("cos"))
    val w = Window.partitionBy("qid").orderBy(col("cos").desc, col(idCol))
    scored.withColumn("rnk", row_number().over(w).cast("long"))
      .where(col("rnk") <= k)
  }

  /** Assign every vector to its nearest centroid (small broadcast LUT). */
  def assign(corpus: DataFrame, centroids: DataFrame,
             idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    val cents = broadcast(centroids.select(col(idCol).as("cid"), col(vecCol).as("cv")))
    val w = Window.partitionBy(col(idCol)).orderBy(col("cos_c").desc, col("cid"))
    corpus.select(col(idCol), col(vecCol))
      .crossJoin(cents)
      .select(col(idCol), col(vecCol), col("cid"), cosine(col(vecCol), col("cv")).as("cos_c"))
      .withColumn("rn", row_number().over(w))
      .where(col("rn") === 1)
      .drop("rn", "cos_c")
  }

  /** IVF search: probe the `nprobe` nearest centroids' buckets per query.
    * Recall < 1.0 by construction; the ScalaTest spec measures it against
    * [[bruteTopK]]. */
  def ivfTopK(queries: DataFrame, corpus: DataFrame, centroids: DataFrame,
              k: Int, nprobe: Int = 2,
              idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    val assigned = assign(corpus, centroids, idCol, vecCol)
    val cents = broadcast(centroids.select(col(idCol).as("cid"), col(vecCol).as("cv")))
    // nprobe nearest centroids per query
    val wq = Window.partitionBy("qid").orderBy(col("cos_c").desc, col("cid"))
    val probes = queries.select(col(idCol).as("qid"), col(vecCol).as("qv"))
      .crossJoin(cents)
      .select(col("qid"), col("qv"), col("cid"), cosine(col("qv"), col("cv")).as("cos_c"))
      .withColumn("rn", row_number().over(wq))
      .where(col("rn") <= nprobe)
      .select("qid", "qv", "cid")
    // search only the probed buckets — equi-join on centroid id
    val w = Window.partitionBy("qid").orderBy(col("cos").desc, col(idCol))
    probes.join(assigned, "cid")
      .where(col("qid") =!= col(idCol))
      .select(col("qid"), col(idCol), cosine(col("qv"), col(vecCol)).as("cos"))
      .withColumn("rnk", row_number().over(w).cast("long"))
      .where(col("rnk") <= k)
  }
}
