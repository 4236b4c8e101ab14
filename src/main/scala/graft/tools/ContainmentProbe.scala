package graft.tools

import graft.functions.GraftFunctions
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** One-off diagnostics for the containment prefix×index join: how many
  * index occurrences survive the distinct-prefix-fp semi-filter, and
  * where the shuffle bytes actually come from.
  *
  * Usage: runMain graft.tools.ContainmentProbe <sfDir>
  */
object ContainmentProbe {
  def main(args: Array[String]): Unit = {
    val dir = args(0)
    val spark = SparkSession.builder()
      .master("local[16]")
      .config("spark.sql.shuffle.partitions", "16")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    graft.GraftSession.tune(spark)
    spark.sparkContext.setLogLevel("WARN")
    GraftFunctions.register(spark)
    val docs = graft.Tables(spark, dir, "documents")
    val k = 3; val threshold = 0.9; val histLimit = 1 << 20
    // fused fp kernel — keeps the probe representative of the
    // round-7 containment structure (no shingle strings anywhere)
    val sh = docs.select(col("doc_id"), GraftFunctions.shingleFps(col("text"), k).as("_fps0"))
    val ex = sh.select(col("doc_id"), explode(col("_fps0")).as("h"))
    val top = ex.groupBy(col("h")).agg(count(lit(1)).as("cnt"))
      .filter(col("cnt") >= 2)
      .orderBy(col("cnt").desc, col("h")).limit(histLimit)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).sortBy(_._1)
    val keys = top.map(_._1); val vals = top.map(_._2)
    val fps = col("_fps0")
    val prefixes = sh.select(col("doc_id").as("doc_src"),
      explode(GraftFunctions.freqPrefix(fps, keys, vals, threshold)).as("_block"))
    val ordered = sh.select(col("doc_id"),
      GraftFunctions.freqOrder(fps, keys, vals).as("_ord"))
    val take = (col("_n") - ceil(col("_n") * lit(threshold)) + lit(1)).cast("int")
    val prefixes2 = ordered.withColumn("_n", size(col("_ord")))
      .select(col("doc_id").as("doc_src"), col("_n").as("_ns"),
        posexplode(slice(col("_ord"), lit(1), greatest(take, lit(0)))).as(Seq("_i", "_block")))
    val probeFps = prefixes2.select(col("_block")).distinct()
    val index = ordered.withColumn("_n", size(col("_ord")))
      .select(col("doc_id").as("doc_dst"), col("_n").as("_nd"),
        posexplode(col("_ord")).as(Seq("_j", "_block")))
      .join(broadcast(probeFps), Seq("_block"), "left_semi")
    val raw = prefixes2.join(index, "_block")
      .filter(col("doc_src") =!= col("doc_dst"))
    val noFilter = raw.select(col("doc_src"), col("doc_dst")).distinct().count()
    val cands = raw.filter(
        (least(col("_i"), col("_j")) + lit(1) +
          least(col("_ns") - col("_i") - 1, col("_nd") - col("_j") - 1))
          .cast("double") / col("_ns") >= threshold)
      .select(col("doc_src"), col("doc_dst")).distinct()
    println(s"[probe] candidatesNoPos=$noFilter candidatesPos=${cands.count()}")
    val out = graft.operators.Dedup.containment(docs)
    // per-stage shuffle accounting
    val stages = scala.collection.mutable.Map.empty[Int, (String, Long, Long)]
    spark.sparkContext.addSparkListener(new org.apache.spark.scheduler.SparkListener {
      override def onStageCompleted(sc: org.apache.spark.scheduler.SparkListenerStageCompleted): Unit = {
        val si = sc.stageInfo
        stages(si.stageId) = (si.name.take(60),
          si.taskMetrics.shuffleReadMetrics.totalBytesRead,
          si.taskMetrics.shuffleWriteMetrics.bytesWritten)
      }
    })
    println(s"[probe] containment rows=${out.count()}")
    org.apache.spark.graftglue.CoreBridge.waitListenerBus(spark.sparkContext)
    stages.toSeq.sortBy(_._1).foreach { case (id, (n, r, w)) =>
      if (r + w > 1000000) println(f"[stage] $id r=${r/1e6}%.1f MB w=${w/1e6}%.1f MB $n")
    }
    spark.stop()
  }
}
