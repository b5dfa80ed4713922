package graft.relational

import graft.SparkSpec
import graft.functions.GraftExtensions
import org.apache.spark.sql.functions._

class SkewSpec extends SparkSpec {
  import spark.implicits._

  test("saltedJoin equals the plain equi-join result") {
    // one pathologically hot key (0) plus a tail
    val big = ((1 to 500).map(i => (0L, i)) ++ (1 to 50).map(i => (i.toLong, i)))
      .toDF("k", "payload")
    val small = (0L to 50L).map(k => (k, s"dim_$k")).toDF("k2", "name")
    val plain = big.join(small, col("k") === col("k2"))
      .select("k", "payload", "name")
    val salted = Skew.saltedJoin(big, small, col("k"), col("k2"),
        discriminator = col("payload"), buckets = 8)
      .select("k", "payload", "name")
    salted.count() shouldBe plain.count()
    salted.except(plain).count() shouldBe 0
    plain.except(salted).count() shouldBe 0
  }

  test("salt spreads a hot key across buckets deterministically") {
    val big = (1 to 1000).map(i => (0L, i)).toDF("k", "payload")
    val salts = big.withColumn("s", pmod(xxhash64(col("payload")), lit(8)))
      .select(countDistinct("s")).as[Long].head()
    salts shouldBe 8
  }

  test("graft_dot is callable from SQL after runtime registration") {
    GraftExtensions.register(spark)
    spark.sql("SELECT graft_dot(array(1.0D, 2.0D), array(3.0D, 4.0D)) AS d")
      .as[Double].head() shouldBe 11.0
  }
}
