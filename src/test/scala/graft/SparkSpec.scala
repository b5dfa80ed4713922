package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

/** Shared local SparkSession for all specs (one JVM, forked by sbt).
  * Mirrors the reference's per-operator unit-spec style (SURVEY §5.1/5.2)
  * on tiny literal datasets with hand-computed expectations.
  */
object SparkSpec {
  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .appName("graft-test")
    .config("spark.sql.shuffle.partitions", 4)
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.sql.warehouse.dir", "/tmp/graft_test_warehouse")
    .config("spark.ui.enabled", "false")
    .getOrCreate()
}

abstract class SparkSpec extends AnyFunSuite with Matchers {
  lazy val spark: SparkSession = {
    val s = SparkSpec.spark
    s.sparkContext.setLogLevel("ERROR")
    // same session-setup contract as the Verify/Bench/Explain mains: the
    // optimizer rewrites are registered once per session, not by query fns
    graft.functions.GraftExtensions.registerRules(s)
    s
  }
}
