package graft.model

import graft.SparkSpec

/** Fixture scans: the ns-safe events reader and SQL view registration. */
class TablesSpec extends SparkSpec {
  import spark.implicits._

  private val sf = "/root/testdata/sf0.001"

  test("events reader rebuilds a microsecond timestamp from ns parquet") {
    val schema = Tables.events(spark, sf).schema
    schema("ts").dataType.typeName shouldBe "timestamp"
    Tables.events(spark, sf).count() should be > 0L
  }

  test("registerAll makes every table reachable from SQL text") {
    Tables.registerAll(spark, sf)
    val n = spark.sql(
      """SELECT count(*) FROM lineitem l
        |JOIN orders o ON l.l_orderkey = o.o_orderkey
        |JOIN events e ON e.event_id = o.o_orderkey
        |WHERE e.ts IS NOT NULL""".stripMargin).as[Long].head()
    n should be > 0L
  }
}
