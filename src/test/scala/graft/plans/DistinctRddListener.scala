package graft.plans

/** Counts DISTINCT RDD instances with a given name across every job on
  * the bus — the executed-plan measurement primitive behind the scan and
  * shuffle gates. Each materialized scan operator creates one
  * `FileScanRDD`; each executed shuffle exchange creates one
  * `ShuffledRowRDD` (RDD-level shuffles a `ShuffledRDD`) — so a stage
  * re-derived N times contributes N ids even when the displayed plan
  * shows only a `Scan ExistingRDD` cut, and a reused exchange counts
  * once (it IS computed once).
  */
final class DistinctRddListener(names: Set[String])
    extends org.apache.spark.scheduler.SparkListener {
  private val ids = new java.util.concurrent.ConcurrentHashMap[String,
    java.util.Set[Int]]()
  override def onJobStart(
      j: org.apache.spark.scheduler.SparkListenerJobStart): Unit =
    j.stageInfos.foreach(_.rddInfos.foreach { r =>
      if (names.contains(r.name))
        ids.computeIfAbsent(r.name,
          _ => java.util.concurrent.ConcurrentHashMap.newKeySet[Int]())
          .add(r.id)
    })
  /** Distinct ids across ALL tracked names. */
  def count: Int = countOf(names.toSeq: _*)
  /** Distinct ids across the given names only. */
  def countOf(which: String*): Int =
    which.map(n => Option(ids.get(n)).map(_.size).getOrElse(0)).sum
  def reset(): Unit = ids.clear()
}
