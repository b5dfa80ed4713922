package graft
import org.apache.spark.sql.SparkSession
/** Driver-contract benchmark: wall-clock `count()` per declared query
  * (the metric BASELINE was measured with — see BASELINE.md). count()
  * lets Catalyst prune final projections/sorts, so this measures the
  * scan/join/aggregate skeleton; that is the harness's definition, applied
  * identically to baseline and engine. For full-plan timing use
  * `Sinks.noop(df)`, which executes every projection. */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // warm the session once (parquet footers, codegen, JIT) so the first
    // measured query isn't charged JVM/session initialization
    graft.model.Tables.names.foreach { n =>
      try {
        val d = if (n == "events") graft.model.Tables.events(spark, sfDir)
                else graft.model.Tables.df(spark, sfDir, n)
        d.count()
      } catch { case _: Throwable => () }
    }
    val results = SparkEntry.queries.map { case (name, fn) =>
      val t0 = System.nanoTime()
      try { fn(spark, sfDir).count() } catch { case _: Throwable => -1L }
      name -> (System.nanoTime() - t0) / 1e9
    }
    val qs = results.map { case (k, v) => s"\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val total = if (results.nonEmpty) results.values.sum else 0.0
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"sf":"$sfDir"}""")
    spark.stop()
  }
}
