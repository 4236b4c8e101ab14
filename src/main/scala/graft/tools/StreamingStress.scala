package graft.tools

import java.util.concurrent.atomic.AtomicLong

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.streaming.StreamingQueryListener

import graft.streaming.StreamingEvents

/** Density stress for the STREAMING family — the batch dedup family
  * has a measured 25×/50× knee table in SCALE.md; this gives the eight
  * streaming twins the same treatment: per-twin drain wall, micro-batch
  * count, and PEAK state-store rows/bytes (from
  * StreamingQueryProgress.stateOperators), each twin also run with a
  * production TTL where the operator takes one.
  *
  * Note on the TTL arms: the drain harness uses Trigger.AvailableNow,
  * which never FIRES ProcessingTimeTimeout — so the TTL arm measures
  * the state-bookkeeping overhead of arming the horizon (per-key
  * timeout timestamps in the store), not expiry itself; the expiry
  * path runs end-to-end under a real clock in StreamingSpec.
  *
  * Usage: runMain graft.tools.StreamingStress <sfDir> [outJson]
  */
object StreamingStress {

  /** Max over progress events of Σ state rows / bytes across the
    * query's stateful operators, plus the number of progress events
    * (micro-batches) observed since the last reset.
    */
  private final class PeakStateListener extends StreamingQueryListener {
    val maxRows = new AtomicLong
    val maxBytes = new AtomicLong
    val batches = new AtomicLong
    def reset(): Unit = { maxRows.set(0); maxBytes.set(0); batches.set(0) }
    override def onQueryStarted(e: StreamingQueryListener.QueryStartedEvent): Unit = ()
    override def onQueryTerminated(e: StreamingQueryListener.QueryTerminatedEvent): Unit = ()
    override def onQueryProgress(e: StreamingQueryListener.QueryProgressEvent): Unit = {
      val so = e.progress.stateOperators
      var r = 0L; var b = 0L
      var i = 0
      while (i < so.length) { r += so(i).numRowsTotal; b += so(i).memoryUsedBytes; i += 1 }
      maxRows.updateAndGet(m => math.max(m, r))
      maxBytes.updateAndGet(m => math.max(m, b))
      batches.incrementAndGet()
    }
  }

  def main(args: Array[String]): Unit = {
    val dir = args(0)
    val outJson = if (args.length > 1) args(1) else "bench/streaming_stress_last.json"
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.codegen.cache.maxEntries", "5000")
      .getOrCreate()
    graft.GraftSession.tune(spark)
    spark.sparkContext.setLogLevel("WARN")
    val listener = new PeakStateListener
    spark.streams.addListener(listener)

    def events: DataFrame = graft.Tables(spark, dir, "events")
    val ttl = Some("7 days")

    // (name, variant, thunk). Attribution/window/sliding have no TTL
    // knob: state is bounded by watermarks / open windows by design.
    val runs: Seq[(String, String, () => DataFrame)] = Seq(
      ("evt_window_stream", "plain", () => StreamingEvents.runWindowAgg(spark, events)),
      ("evt_sliding_stream", "plain", () => StreamingEvents.runSlidingAgg(spark, events)),
      ("evt_attribution_stream", "plain", () => StreamingEvents.runAttribution(spark, events)),
      ("evt_sessionize_stream", "plain", () => StreamingEvents.runSessionize(spark, events)),
      ("evt_sessionize_stream", "ttl", () => StreamingEvents.runSessionize(spark, events, stateTtl = ttl)),
      ("evt_paths_stream", "plain", () => StreamingEvents.runPaths(spark, events)),
      ("evt_paths_stream", "ttl", () => StreamingEvents.runPaths(spark, events, stateTtl = ttl)),
      ("evt_funnel_stream", "plain", () => StreamingEvents.runFunnel(spark, events)),
      ("evt_funnel_stream", "ttl", () => StreamingEvents.runFunnel(spark, events, stateTtl = ttl)),
      ("evt_retention_stream", "plain", () => StreamingEvents.runRetention(spark, events)),
      ("evt_retention_stream", "ttl", () => StreamingEvents.runRetention(spark, events, stateTtl = ttl)),
      ("evt_anomaly_stream", "plain", () => StreamingEvents.runAnomaly(spark, events)),
      ("evt_anomaly_stream", "ttl", () => StreamingEvents.runAnomaly(spark, events, stateTtl = ttl)))

    // Both state-store backends: the default in-memory/HDFS provider
    // AND RocksDB — the backend a 100 TB deployment actually runs
    // (state off-heap and disk-spillable, snapshot+changelog uploads).
    // Same pipelines, same drain; only the provider conf changes.
    val providers = Seq(
      "hdfs" -> "org.apache.spark.sql.execution.streaming.state.HDFSBackedStateStoreProvider",
      "rocksdb" -> "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")

    val out = new StringBuilder("[")
    var first = true
    providers.foreach { case (provName, provClass) =>
      spark.conf.set("spark.sql.streaming.stateStore.providerClass", provClass)
      runs.foreach { case (name, variant, mk) =>
        System.gc()
        listener.reset()
        val t0 = System.nanoTime()
        val res =
          try { val n = mk().count(); Right(n) }
          catch { case e: Throwable => Left(e.getMessage) }
        val wall = (System.nanoTime() - t0) / 1e9
        // progress events arrive async; give the bus a moment
        org.apache.spark.graftglue.CoreBridge.waitListenerBus(spark.sparkContext)
        val line = res match {
          case Right(n) =>
            f"""{"query":"$name","variant":"$variant","provider":"$provName","wall_s":$wall%.2f,"rows":$n,"batches":${listener.batches.get()},"peak_state_rows":${listener.maxRows.get()},"peak_state_bytes":${listener.maxBytes.get()}}"""
          case Left(msg) =>
            s"""{"query":"$name","variant":"$variant","provider":"$provName","error":${"\"" + msg.replace("\"", "'").take(120) + "\""}}"""
        }
        println(s"[stress] $line")
        if (!first) out.append(",\n") else first = false
        out.append(line)
        spark.catalog.clearCache()
      }
    }
    out.append("]")
    try {
      new java.io.File(outJson).getParentFile.mkdirs()
      java.nio.file.Files.writeString(java.nio.file.Paths.get(outJson), out.result() + "\n")
    } catch { case _: Throwable => }
    spark.stop()
  }
}
