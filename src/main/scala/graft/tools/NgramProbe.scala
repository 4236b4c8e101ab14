package graft.tools

import org.apache.spark.scheduler.{SparkListener, SparkListenerStageCompleted}
import org.apache.spark.sql.SparkSession

/** Stage-level anatomy of dedup_ngram_jaccard on a given corpus:
  * per-stage wall, shuffle bytes and spill, to locate exactly which
  * exchange breaks first under pair-output growth (the 50×-density
  * stress spills tens of GB; per-query totals can't say where).
  *
  * Usage: SPARK_GRAFT_CPUS=32 runMain graft.tools.NgramProbe <sfDir>
  */
object NgramProbe {
  def main(args: Array[String]): Unit = {
    val dir = args(0)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "16")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    graft.GraftSession.tune(spark)
    spark.sparkContext.setLogLevel("WARN")
    val stages = scala.collection.mutable.ArrayBuffer
      .empty[(Int, Int, Long, Long, Long, Long, Long, String)]
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onStageCompleted(sc: SparkListenerStageCompleted): Unit = {
        val si = sc.stageInfo
        val m = si.taskMetrics
        stages.synchronized {
          stages += ((si.stageId, si.numTasks,
            si.completionTime.getOrElse(0L) - si.submissionTime.getOrElse(0L),
            m.shuffleReadMetrics.totalBytesRead, m.shuffleWriteMetrics.bytesWritten,
            m.memoryBytesSpilled, m.diskBytesSpilled,
            si.name.takeWhile(_ != '\n').take(70)))
        }
      }
    })
    val docs = graft.Tables(spark, dir, "documents")
    val t0 = System.nanoTime()
    val n = graft.operators.Dedup.ngramJaccard(docs).count()
    val wall = (System.nanoTime() - t0) / 1e9
    Thread.sleep(2000)
    println(f"RESULT pairs=$n wall=$wall%.1f")
    stages.synchronized {
      stages.sortBy(-_._3).foreach { case (id, nt, ms, r, w, mem, dsk, name) =>
        println(f"stage=$id%4d tasks=$nt%5d wall=${ms / 1000.0}%8.1fs " +
          f"read=${r / 1e6}%9.1fMB write=${w / 1e6}%9.1fMB " +
          f"spillMem=${mem / 1e6}%10.1fMB spillDisk=${dsk / 1e6}%9.1fMB  $name")
      }
    }
  }
}
