package graft.relational

import graft.SparkSpec
import org.apache.spark.sql.functions._

class CdcSpec extends SparkSpec {
  import spark.implicits._

  private def base = Seq(
    (1L, "a", 10.0), (2L, "b", 20.0), (3L, "c", 30.0))
    .toDF("k", "name", "amt")

  private def changes = Seq(
    // update key 2 at v1, then delete it at v2 — version order decides
    (2L, "b2", 21.0, 1L, "U"),
    (2L, "", 0.0, 2L, "D"),
    // plain update
    (3L, "c9", 33.0, 5L, "U"),
    // out-of-order arrival: the LOWER version must lose
    (3L, "c1", 31.0, 1L, "U"),
    // insert
    (9L, "i", 90.0, 1L, "U"))
    .toDF("k", "name", "amt", "version", "op")

  test("upsert: update/delete/insert/pass-through, latest version wins") {
    val out = Cdc.upsert(base, changes, Seq("k"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getDouble(2)))
    out shouldBe Array(
      (1L, "a", 10.0),   // untouched
      (3L, "c9", 33.0),  // v5 beats v1
      (9L, "i", 90.0))   // inserted; key 2 deleted (v2 D beats v1 U)
  }

  test("snapshotAsOf: time travel through the same changelog") {
    def at(v: Long) = Cdc.snapshotAsOf(changes, lit(v), Seq("k"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getDouble(2)))
    at(1L) shouldBe Array((2L, "b2", 21.0), (3L, "c1", 31.0), (9L, "i", 90.0))
    at(2L) shouldBe Array((3L, "c1", 31.0), (9L, "i", 90.0)) // 2 deleted
    at(5L) shouldBe Array((3L, "c9", 33.0), (9L, "i", 90.0)) // 3 updated
    at(0L) shouldBe empty
  }

  test("plan: windowed latest (no object agg), base join reuses the key hash") {
    val plan = Cdc.upsert(base, changes, Seq("k"))
      .queryExecution.executedPlan.toString
    plan should not include "ObjectHashAggregate"
    // window hash + base-side hash + declared sort range partition —
    // the change side of the join must RIDE the window's exchange
    "Exchange hashpartitioning".r.findAllIn(plan).length shouldBe 2
    an[IllegalArgumentException] should be thrownBy
      Cdc.upsert(base, changes.drop("version"), Seq("k"))
    an[IllegalArgumentException] should be thrownBy
      Cdc.upsert(base, changes, Seq.empty)
  }

  test("unexpected changelog columns are rejected, not silently dropped (r16 verdict #1)") {
    // payload derives from the BASE side, so an upstream schema
    // evolution (new/renamed payload column) used to vanish silently
    val evolved = changes.withColumn("discount", lit(0.1))
    val eU = intercept[IllegalArgumentException] {
      Cdc.upsert(base, evolved, Seq("k"))
    }
    eU.getMessage should include ("discount")
    eU.getMessage should include ("silently")
    val eM = intercept[IllegalArgumentException] {
      Cdc.mergeVersioned(Cdc.bootstrap(base, Seq("k")), evolved, Seq("k"))
    }
    eM.getMessage should include ("discount")
    // additive evolution stays possible, explicitly: evolve the
    // snapshot first, then the changelog may carry the column
    val evolvedBase = base.withColumn("discount", lit(0.0))
    Cdc.upsert(evolvedBase, evolved, Seq("k")).columns should contain ("discount")
  }

  test("diffSnapshots: the defining law — upsert(prev, diff(prev, next)) == next") {
    // r18: the inverse of upsert, for dump-fed deployments. next vs
    // base: key 1 unchanged (emits NOTHING), key 2 payload change, key
    // 3 null↔value change (null-safe compare), key 4 deleted... from
    // next's side: base has 1,2,3; next has 1, 2', 3'(null amt), 9 new
    val next = Seq((1L, "a", Some(10.0)), (2L, "b9", Some(29.0)),
      (3L, "c", None), (9L, "i", Some(90.0)))
      .toDF("k", "name", "amt")
      .select(col("k"), col("name"), col("amt").cast("double"))
    val diff = Cdc.diffSnapshots(base, next, Seq("k"), version = 4L)
    val rowsOut = diff.orderBy("k", "op").collect()
      .map(r => (r.getLong(0), r.getString(1), Option(r.get(2)),
        r.getLong(3), r.getString(4))).toSeq
    rowsOut shouldBe Seq(
      (2L, "b9", Some(29.0), 4L, "U"),  // payload change
      (3L, "c", None, 4L, "U"),         // value -> null IS a change
      (9L, "i", Some(90.0), 4L, "U"))   // insert; key 1 absent (unchanged)
    // deletes carry prev's payload and the D op
    val shrunk = Seq((1L, "a", 10.0)).toDF("k", "name", "amt")
    Cdc.diffSnapshots(base, shrunk, Seq("k"), version = 5L)
      .orderBy("k").collect()
      .map(r => (r.getLong(0), r.getString(4))).toSeq shouldBe
      Seq((2L, "D"), (3L, "D"))
    // THE LAW: replaying the diff over prev reconstructs next exactly
    def canon(df: org.apache.spark.sql.DataFrame) =
      df.orderBy("k").collect().map(_.toString).toSeq
    canon(Cdc.upsert(base, diff, Seq("k"))) shouldBe canon(next)
    canon(Cdc.upsert(base,
      Cdc.diffSnapshots(base, shrunk, Seq("k"), 5L), Seq("k"))) shouldBe
      canon(shrunk)
    // and an identical pair diffs to EMPTY (the adjacent-dump bulk case)
    Cdc.diffSnapshots(base, base, Seq("k"), 6L).count() shouldBe 0L
    // misuse is loud: schema drift and internal columns
    an[IllegalArgumentException] should be thrownBy
      Cdc.diffSnapshots(base, base.withColumnRenamed("amt", "amt2"),
        Seq("k"), 1L)
    an[IllegalArgumentException] should be thrownBy
      Cdc.diffSnapshots(base.withColumn("op", lit("U")),
        base.withColumn("op", lit("U")), Seq("k"), 1L)
    // reserved marker/rename prefixes collide loudly instead of
    // silently corrupting the diff (r19, the r18 advice)
    for (bad <- Seq("__in_p", "__in_n", "__p_name", "__n_amt")) {
      val e = intercept[IllegalArgumentException] {
        Cdc.diffSnapshots(base.withColumn(bad, lit(1)),
          base.withColumn(bad, lit(1)), Seq("k"), 1L)
      }
      e.getMessage should include (bad)
    }
  }

  test("unknown op codes raise instead of half-applying (r15 verdict #4)") {
    // an 'X' row used to pass the delete filter but miss the payload
    // swap — a new key leaked an all-NULL base payload
    val corrupt = changes.union(
      Seq((7L, "x", 70.0, 1L, "X")).toDF("k", "name", "amt", "version", "op"))
    val eU = intercept[Exception] { Cdc.upsert(base, corrupt, Seq("k")).collect() }
    eU.getMessage should include ("must be 'U' or 'D'")
    val eS = intercept[Exception] {
      Cdc.snapshotAsOf(corrupt, lit(5L), Seq("k")).collect() }
    eS.getMessage should include ("must be 'U' or 'D'")
    // NULL op is equally corrupt
    val nullOp = changes.union(
      Seq((8L, "n", 80.0, 1L, null.asInstanceOf[String]))
        .toDF("k", "name", "amt", "version", "op"))
    val eN = intercept[Exception] { Cdc.upsert(base, nullOp, Seq("k")).collect() }
    eN.getMessage should include ("must be 'U' or 'D'")
  }

  test("snapshotAsOf pushes the version predicate into a parquet changelog scan") {
    val dir = java.nio.file.Files.createTempDirectory("cdc_push").toString
    changes.write.mode("overwrite").parquet(dir)
    val fromDisk = spark.read.parquet(dir)
    val plan = Cdc.snapshotAsOf(fromDisk, lit(2L), Seq("k"))
      .queryExecution.executedPlan.toString
    plan should include regex "PushedFilters:.*LessThanOrEqual\\(version,2\\)"
  }
}
