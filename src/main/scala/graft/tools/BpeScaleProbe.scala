package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Measures the batched distributed BPE trainer at a deep merge
  * budget: rounds (= Spark job groups) vs merges learned, and wall —
  * the evidence that a real 30 k-merge tokenizer no longer costs one
  * sequential Spark job per merge.
  *
  * Usage: runMain graft.tools.BpeScaleProbe <sfDir> <nMerges>
  */
object BpeScaleProbe {
  def main(args: Array[String]): Unit = {
    val dir = args(0)
    val nMerges = args(1).toInt
    val spark = SparkSession.builder()
      .master("local[16]")
      .config("spark.sql.shuffle.partitions", "16")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    graft.GraftSession.tune(spark)
    spark.sparkContext.setLogLevel("WARN")
    val docs = graft.Tables(spark, dir, "documents")
    val vocab = graft.operators.Bpe.wordCounts(docs, col("text"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    vocab.count()
    var rounds = 0
    spark.sparkContext.addSparkListener(new org.apache.spark.scheduler.SparkListener {
      override def onJobStart(j: org.apache.spark.scheduler.SparkListenerJobStart): Unit =
        rounds += 1
    })
    val t0 = System.nanoTime()
    val merges = graft.operators.Bpe.trainDistributed(vocab, nMerges)
    val t1 = System.nanoTime()
    println(f"[bpe-probe] merges=${merges.length} jobs=$rounds " +
      f"wall=${(t1 - t0) / 1e9}%.1f s jobsPerMerge=${rounds.toDouble / merges.length}%.3f")
    spark.stop()
  }
}
