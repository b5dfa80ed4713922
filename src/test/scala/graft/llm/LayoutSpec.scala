package graft.llm

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Z-order layout: Morton interleave bit-exactness vs a reference
  * implementation, the quadrant-locality property that IS the point of
  * the curve, clamping, guards and determinism. */
class LayoutSpec extends SparkSpec {
  import spark.implicits._

  private def mortonRef(a: Long, b: Long, bits: Int): Long =
    (0 until bits).foldLeft(0L) { (acc, i) =>
      acc | (((a >> i) & 1L) << (2 * i)) | (((b >> i) & 1L) << (2 * i + 1))
    }

  test("mortonColumn matches the reference interleave over a full grid") {
    // 32×32 grid, 5 bits — every (a, b) combination, kernel vs Scala
    val n = 32L
    val grid = spark.range(n * n)
      .select((col("id") % n).as("a"), (col("id") / n).cast("long").as("b"))
    val got = grid
      .select(col("a"), col("b"), Layout.mortonColumn(col("a"), col("b"), 5).as("z"))
      .as[(Long, Long, Long)].collect()
    got.foreach { case (a, b, z) => z shouldBe mortonRef(a, b, 5) }
  }

  test("mortonColumn known values") {
    // a=3 (bits 0,1 → result bits 0,2), b=1 (bit 0 → result bit 1)
    val one = spark.range(1)
      .select(Layout.mortonColumn(lit(3L), lit(1L), 2).as("z"),
        Layout.mortonColumn(lit(0L), lit(0L), 4).as("z0"),
        Layout.mortonColumn(lit(15L), lit(15L), 4).as("zf"))
      .as[(Long, Long, Long)].head()
    one shouldBe ((7L, 0L, 255L))
  }

  test("mortonSql replays mortonColumn term for term") {
    // evaluate the generated SQL in Spark itself — if the two term lists
    // ever drift, this catches it without DuckDB in the loop
    val n = 16L
    val grid = spark.range(n * n)
      .select((col("id") % n).as("a"), (col("id") / n).cast("long").as("b"))
    val viaSql = grid.selectExpr("a", "b", s"${Layout.mortonSql("a", "b", 4)} as z")
    val viaCol = grid.select(col("a"), col("b"),
      Layout.mortonColumn(col("a"), col("b"), 4).as("z"))
    viaSql.exceptAll(viaCol).count() shouldBe 0L
    viaCol.exceptAll(viaSql).count() shouldBe 0L
  }

  test("zOrder shard 0 is exactly the low quadrant — the locality property") {
    // 16×16 grid, 64 rows per shard: z < 64 iff a < 8 and b < 8, so the
    // first shard is precisely the (a<8, b<8) quadrant — the bounding
    // rectangle a row-major layout cannot give
    val n = 16L
    val grid = spark.range(n * n).select(col("id").as("doc_id"),
      (col("id") % n).as("a"), (col("id") / n).cast("long").as("b"))
    val laid = Layout.zOrder(grid, col("a"), col("b"), bits = 4, rowsPerShard = 64L)
    val shard0 = laid.where(col("shard_id") === 0)
      .select("a", "b").as[(Long, Long)].collect()
    shard0.length shouldBe 64
    shard0.foreach { case (a, b) =>
      a should be < 8L
      b should be < 8L
    }
  }

  test("zOrder clamps out-of-range dimensions to the edge, not the origin") {
    val df = Seq((1L, -5L, 0L), (2L, 99L, 0L), (3L, 3L, 3L))
      .toDF("doc_id", "a", "b")
    val z = Layout.zOrder(df, col("a"), col("b"), bits = 2, rowsPerShard = 10L)
      .orderBy("doc_id").select("z_value").as[Long].collect()
    // -5 clamps to 0; 99 clamps to 3 (max for 2 bits); morton(3,0)=5
    z shouldBe Array(mortonRef(0, 0, 2), mortonRef(3, 0, 2), mortonRef(3, 3, 2))
  }

  test("zOrder positions are dense, deterministic and partition-invariant") {
    val df = spark.range(100).select(col("id").as("doc_id"),
      (col("id") * 7 % 32).as("a"), (col("id") * 13 % 32).as("b"))
    val once = Layout.zOrder(df, col("a"), col("b"), 5, 16L)
      .select("doc_id", "shard_id", "pos_in_shard").collect().toSet
    val again = Layout.zOrder(df.repartition(7), col("a"), col("b"), 5, 16L)
      .select("doc_id", "shard_id", "pos_in_shard").collect().toSet
    again shouldBe once
    val positions = Layout.zOrder(df, col("a"), col("b"), 5, 16L)
      .select(col("shard_id") * 16 + col("pos_in_shard")).as[Long].collect().sorted
    positions shouldBe (0L until 100L).toArray
  }

  test("zOrder fails fast on reserved columns and bad parameters") {
    val df = Seq((1L, 2L)).toDF("doc_id", "z_value")
    an[IllegalArgumentException] should be thrownBy
      Layout.zOrder(df, col("doc_id"), col("doc_id"), 4, 10L)
    val ok = Seq((1L, 2L)).toDF("doc_id", "a")
    an[IllegalArgumentException] should be thrownBy
      Layout.zOrder(ok, col("a"), col("a"), 0, 10L)
    an[IllegalArgumentException] should be thrownBy
      Layout.zOrder(ok, col("a"), col("a"), 32, 10L)
    an[IllegalArgumentException] should be thrownBy
      Layout.zOrder(ok, col("a"), col("a"), 4, 0L)
  }
}
