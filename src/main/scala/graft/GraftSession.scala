package graft

import org.apache.spark.sql.SparkSession

/** Session factory for the graft engine.
  *
  * Spark-native replacement for the reference's DataFusion
  * `SessionContext` (reference: src/data_source/context.rs:17-24).
  * One place to pin the configs that matter at scale: AQE (runtime
  * re-planning, skew-join handling, partition coalescing), a shuffle
  * partition count sized to the local core count (the 200 default is
  * wrong for local mode and is re-derived by AQE on a cluster), and a
  * UTC session timezone so timestamp semantics match the oracle.
  */
object GraftSession {

  /** Runtime-settable confs applied to any session (including ones the
    * driver built for us in Verify/Bench). Safe to call repeatedly.
    */
  def tune(spark: SparkSession): SparkSession = {
    spark.conf.set("spark.sql.adaptive.enabled", "true")
    spark.conf.set("spark.sql.adaptive.coalescePartitions.enabled", "true")
    spark.conf.set("spark.sql.adaptive.skewJoin.enabled", "true")
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    // Dims at TPC-H-ish ratios stay far below this even at SF ≫ 1;
    // 64m keeps region/nation/supplier/part joins broadcast at scale.
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", (64L << 20).toString)
    // Runtime bloom-filter join pruning: a selective predicate on the
    // build side of a shuffle equi-join becomes a bloom filter probed
    // at the other side's SCAN, cutting fact-table rows before the
    // exchange. Thresholds stay at Spark defaults (creation ≤ 10 MB,
    // application scan ≥ 10 GB): inert at test SFs, exactly the
    // selective fact-fact shapes (q03/q04) at 100 TB.
    spark.conf.set("spark.sql.optimizer.runtime.bloomFilter.enabled", "true")
    spark
  }

  /** Run `body` with AQE off, restoring the previous value after.
    *
    * For DRIVER-SIDE iteration loops (Lloyd rounds, gradient descent)
    * whose per-iteration action is a bounded aggregate (≤ k rows, one
    * tiny exchange): AQE can never improve that shape — nothing to
    * coalesce or skew-split — but re-planning after the shuffle stage
    * costs an extra scheduled job per collect, which the iteration
    * count multiplies. Results are unchanged (AQE is physical-only;
    * the aggregates are partition-order-free by construction).
    *
    * SCOPE WARNING: the toggle is SESSION-WIDE — while any training
    * loop holds it, every concurrent query on the same session (e.g.
    * the non-training builds in the standing-index pool) plans without
    * AQE coalescing/skew handling. Results are unaffected, but a
    * concurrent query that NEEDS AQE for performance should run on
    * `spark.newSession()` (independent runtime conf, shared state).
    * The depth counter below only makes nested/concurrent *callers* of
    * this method restore the right value — it does not scope the conf.
    */
  def withoutAqe[T](spark: SparkSession)(body: => T): T = {
    val key = "spark.sql.adaptive.enabled"
    // depth-counted per session: concurrent training loops share one
    // session conf (the standing-index build pool), so a naive
    // save/set/restore pair can interleave and restore the WRONG
    // previous value (leaving AQE off for the rest of the session).
    // The first entrant saves, the last one restores.
    aqeState.keySet.removeIf(s => s.sparkContext.isStopped) // no dead-session pins
    val (lock, depth, saved) = aqeState.computeIfAbsent(spark,
      _ => (new Object, new java.util.concurrent.atomic.AtomicInteger(0),
        new java.util.concurrent.atomic.AtomicReference[String]("true")))
    lock.synchronized {
      if (depth.getAndIncrement() == 0) {
        saved.set(spark.conf.get(key))
        spark.conf.set(key, "false")
      }
    }
    try body finally lock.synchronized {
      if (depth.decrementAndGet() == 0) spark.conf.set(key, saved.get())
    }
  }
  private val aqeState = new java.util.concurrent.ConcurrentHashMap[SparkSession,
    (Object, java.util.concurrent.atomic.AtomicInteger,
      java.util.concurrent.atomic.AtomicReference[String])]()

  def builder(master: String = "local[*]", app: String = "graft"): SparkSession.Builder =
    SparkSession
      .builder()
      .master(master)
      .appName(app)
      .config("spark.sql.shuffle.partitions",
        math.max(4, Runtime.getRuntime.availableProcessors()).toString)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
      .config("spark.sql.adaptive.skewJoin.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.autoBroadcastJoinThreshold", (64L << 20).toString)
      .config("spark.sql.optimizer.runtime.bloomFilter.enabled", "true")
      // static conf: default 100-entry codegen class cache evicts and
      // re-pays multi-second compilation in many-query workloads
      .config("spark.sql.codegen.cache.maxEntries", "5000")
      // FAIR job scheduling (static conf): concurrent API requests get
      // round-robin executor time via per-request pools (HttpApi sets
      // spark.scheduler.pool per handler thread) instead of FIFO
      // head-of-line blocking behind one big query
      .config("spark.scheduler.mode", "FAIR")
      .config("spark.ui.enabled", "false")

  def apply(master: String = "local[*]", app: String = "graft"): SparkSession = {
    val spark = builder(master, app).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark
  }
}
