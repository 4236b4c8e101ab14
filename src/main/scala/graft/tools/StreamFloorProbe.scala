package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.streaming.StreamingQueryListener

/** Anatomy of the streaming drain's fixed costs: run a few streaming
  * twins while a listener captures every micro-batch's durationMs
  * breakdown (triggerExecution, addBatch, getBatch, walCommit,
  * queryPlanning, commitOffsets) — the evidence for what the trigger
  * floor is actually made of (round-6 verdict task #7).
  *
  * Usage: runMain graft.tools.StreamFloorProbe <sfDir> [conf=value ...] [name ...]
  * (args containing '=' are applied as runtime conf overrides — the
  * A/B loop for drain knobs like the state-store provider.)
  */
object StreamFloorProbe {
  def main(args: Array[String]): Unit = {
    val dir = args(0)
    val (confs, rest) = args.drop(1).partition(_.contains("="))
    val names = if (rest.nonEmpty) rest.toSeq
      else Seq("evt_attribution_stream", "evt_window_stream", "dedup_exact_stream")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.codegen.cache.maxEntries", "5000")
      .getOrCreate()
    graft.GraftSession.tune(spark)
    confs.foreach { kv =>
      val Array(k, v) = kv.split("=", 2)
      spark.conf.set(k, v)
      System.err.println(s"[floor-probe] conf $k=$v")
    }
    spark.sparkContext.setLogLevel("WARN")

    // per-stage wall and task-time attribution: where addBatch goes
    val stageLines = new java.util.concurrent.ConcurrentLinkedQueue[String]()
    spark.sparkContext.addSparkListener(new org.apache.spark.scheduler.SparkListener {
      override def onStageCompleted(
          e: org.apache.spark.scheduler.SparkListenerStageCompleted): Unit = {
        val si = e.stageInfo
        val wall = (for {s <- si.submissionTime; c <- si.completionTime} yield c - s)
          .getOrElse(-1L)
        if (wall >= 200)
          stageLines.add(f"stage=${si.stageId} wall=${wall}ms tasks=${si.numTasks} " +
            f"exec=${si.taskMetrics.executorRunTime}ms " +
            f"gc=${si.taskMetrics.jvmGCTime}ms " +
            f"ser=${si.taskMetrics.resultSerializationTime}ms " +
            f"deser=${si.taskMetrics.executorDeserializeTime}ms " +
            si.name.take(110))
      }
    })

    val batches = new java.util.concurrent.ConcurrentLinkedQueue[String]()
    spark.streams.addListener(new StreamingQueryListener {
      override def onQueryStarted(e: StreamingQueryListener.QueryStartedEvent): Unit = ()
      override def onQueryTerminated(e: StreamingQueryListener.QueryTerminatedEvent): Unit = ()
      override def onQueryProgress(e: StreamingQueryListener.QueryProgressEvent): Unit = {
        val p = e.progress
        val d = p.durationMs
        val st = p.stateOperators.zipWithIndex.map { case (s, i) =>
          f"state$i[${s.operatorName}]=${s.numRowsTotal}rows/${s.memoryUsedBytes / 1024}KB"
        }.mkString(" ")
        batches.add(f"batch=${p.batchId} rows=${p.numInputRows} " +
          f"trigger=${d.getOrDefault("triggerExecution", -1L)}ms " +
          f"addBatch=${d.getOrDefault("addBatch", -1L)}ms " +
          f"getBatch=${d.getOrDefault("getBatch", -1L)}ms " +
          f"latestOffset=${d.getOrDefault("latestOffset", -1L)}ms " +
          f"queryPlanning=${d.getOrDefault("queryPlanning", -1L)}ms " +
          f"walCommit=${d.getOrDefault("walCommit", -1L)}ms " +
          f"commitOffsets=${d.getOrDefault("commitOffsets", -1L)}ms " + st)
      }
    })

    names.foreach { name =>
      batches.clear()
      stageLines.clear()
      val t0 = System.nanoTime()
      val n = graft.SparkEntry.queries(name)(spark, dir).count()
      val wall = (System.nanoTime() - t0) / 1e9
      println(f"[floor-probe] $name wall=$wall%.2f s rows=$n")
      batches.forEach(b => println(s"[floor-probe]   $b"))
      stageLines.forEach(s => println(s"[floor-probe]   $s"))
    }
    spark.stop()
  }
}
