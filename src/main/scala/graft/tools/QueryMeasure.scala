package graft.tools

import org.apache.spark.sql.SparkSession

/** Per-query measurement harness shared by [[graft.Bench]] and
  * [[ScaleBench]] — one implementation so their JSON evidence stays
  * comparable (SCALE.md reads them side by side).
  *
  * JMH-style hygiene: measure against a quiet heap (without the gc(),
  * allocation-heavy queries absorb earlier queries' collection debt —
  * observed 1.7 s clean vs 13 s mid-suite), snapshot shuffle-byte
  * deltas around the run, and clear cached intermediates afterwards so
  * later queries aren't squeezed by stale persisted relations.
  */
object QueryMeasure {

  /** Run `work`, returning (seconds, metric deltas: shuffle read/write,
    * spill, job count, GC ms); seconds = -1.0 if it threw (reported on
    * stderr, never fatal to the suite).
    */
  def measure(spark: SparkSession, metrics: ShuffleMetricsListener, name: String)(
      work: => Unit): (Double, ShuffleMetricsListener.Snap) = {
    System.gc()
    val m0 = metrics.snapshot(spark.sparkContext)
    val t0 = System.nanoTime()
    val t =
      try { work; (System.nanoTime() - t0) / 1e9 }
      catch {
        case e: Throwable =>
          System.err.println(s"[bench] $name failed: ${e.getMessage}")
          -1.0
      }
    val m1 = metrics.snapshot(spark.sparkContext)
    spark.catalog.clearCache()
    (t, m1 - m0)
  }
}
