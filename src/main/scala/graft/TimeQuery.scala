package graft

import org.apache.spark.sql.SparkSession

/** Dev tool: time individual declared queries, N iterations each — the
  * "is this regression real or bench noise" check (CLAUDE.md: bench is
  * noisy ±25%; rerun before trusting a regression).
  *
  * Usage: runMain graft.TimeQuery <query>[,<query>...] [iters]
  * Env: SPARK_GRAFT_SF_DIR (default sf0.1), SPARK_GRAFT_CPUS (default 4).
  */
object TimeQuery {
  def main(args: Array[String]): Unit = {
    val names = args.headOption
      .map(_.split(",").toSeq)
      .getOrElse(SparkEntry.queries.keys.toSeq)
    val iters = args.lift(1).map(_.toInt).getOrElse(3)
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    // session-scoped optimizer rewrites (RewriteDotProduct,
    // RewriteRangeJoin) — registered once here, never inside a query fn
    graft.functions.GraftExtensions.registerRules(spark)
    graft.model.Tables.names.foreach { n =>  // warm footers/codegen/JIT
      try {
        val d = if (n == "events") graft.model.Tables.events(spark, sfDir)
                else graft.model.Tables.df(spark, sfDir, n)
        d.count()
      } catch { case _: Throwable => () }
    }
    Warmup.kernels(spark) // same policy as Bench: don't charge janino to iter 1
    names.foreach { name =>
      val fn = SparkEntry.queries.getOrElse(name,
        sys.error(s"unknown query: $name (known: ${SparkEntry.queries.keys.toSeq.sorted.mkString(", ")})"))
      val times = (1 to iters).map { _ =>
        val t0 = System.nanoTime()
        fn(spark, sfDir).count()
        (System.nanoTime() - t0) / 1e9
      }
      println(f"""{"query":"$name","times":[${times.map(t => f"$t%.3f").mkString(",")}],"min":${times.min}%.3f}""")
    }
    spark.stop()
  }
}
