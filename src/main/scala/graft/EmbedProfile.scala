package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Dev tool: decompose embeddingNearDups cost — signature projection vs
  * bucketing vs candidate verify (round-3 investigation). */
object EmbedProfile {
  def main(args: Array[String]): Unit = {
    val n = args.headOption.map(_.toLong).getOrElse(50000L)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def synthEmb(m: Long, dims: Int = 32): DataFrame =
      spark.range(m).select(col("id").as("vec_id"),
        transform(sequence(lit(1), lit(dims)),
          i => (pmod(xxhash64(col("id"), i), lit(2000)).cast("double") / 1000.0 - 1.0)
            .cast("float")).as("embedding"))
    val emb = synthEmb(n)
    emb.count() // warm

    def time(name: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val rows = f
      println(f"""{"stage":"$name","sec":${(System.nanoTime() - t0) / 1e9}%.3f,"rows":$rows}""")
    }

    val bits = math.min(24, math.max(4, // mirror Dedup.autoBits (private[llm])
      math.ceil(math.log(math.max(2L, n).toDouble) / math.log(2)).toInt))
    def planes2(nt: Int, b: Int, d: Int): Array[Array[Double]] = {
      val r = new scala.util.Random(42L)
      Array.fill(nt * b)(Array.fill(d)(r.nextGaussian()))
    }
    val numTables = 8
    val rng = new scala.util.Random(42L)
    val dims = 32
    val sigs = (0 until numTables).map { t =>
      val laneBits = (0 until bits).map { j =>
        val plane = Array.fill(dims)(rng.nextGaussian())
        when(graft.llm.Similarity.dot(col("embedding"), typedLit(plane.toSeq)) >= 0,
          lit(1L << j)).otherwise(lit(0L))
      }
      struct(lit(t).as("tbl"), laneBits.reduce(_.bitwiseOR(_)).as("sig"))
    }
    val banded = emb.select(col("vec_id"), explode(array(sigs: _*)).as("b"))
      .select(col("vec_id"), col("b.tbl").as("tbl"), col("b.sig").as("sig"))
    time("signature_projection")(banded.count())
    time("signature_projection_2nd")(banded.count())
    val bucketed = banded.groupBy("tbl", "sig").agg(count(lit(1)).as("m"))
    time("bucket_histogram_old_formulation")(bucketed.count())
    val pairCount = bucketed.agg(sum(col("m") * (col("m") - 1) / 2))
      .head().getDouble(0).toLong
    println(s"""{"candidate_pairs":$pairCount}""")
    val banded2 = emb.select(col("vec_id"),
      posexplode(graft.functions.SignProjection(
        col("embedding"), planes2(numTables, bits, dims), numTables, bits))
        .as(Seq("tbl", "sig")))
    time("bucket_histogram_signprojection")(
      banded2.groupBy("tbl", "sig").agg(count(lit(1))).count())
    time("full_neardup")(graft.llm.Dedup.embeddingNearDups(emb, threshold = 0.7).count())
    spark.stop()
  }
}
