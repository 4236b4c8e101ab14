package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Per-arm anatomy of sim_recall_report — times each ANN arm's
  * score-join separately (sequential, exclusive) so optimization
  * effort lands on the arm that actually costs, not the aggregate.
  *
  * Usage: runMain graft.tools.RecallProbe <sfDir>
  */
object RecallProbe {
  def main(args: Array[String]): Unit = {
    val dir = args(0)
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
    import graft.operators.{Opq, Pq, Similarity, Sq8}

    val emb = graft.Tables(spark, dir, "embeddings")
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val queries = emb.filter(col("vec_id") < 64)
    val bf = Similarity.topKBruteForce(emb, queries, k = 5)
      .select(col("query_id"), col("neighbor_id"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val t0 = System.nanoTime()
    bf.count()
    println(f"[recall-probe] ground_truth ${(System.nanoTime() - t0) / 1e9}%.2f s")

    val arms: Seq[(String, () => DataFrame)] = Seq(
      ("lsh", () => Similarity.topKLsh(emb, queries, k = 5, bits = 6)),
      ("ivf", () => Similarity.topKIvf(emb, queries, k = 5)),
      ("ivf_kmeans", () => Similarity.topKIvf(emb, queries, k = 5, kmeansIters = 3)),
      ("pq", () => Pq.topKPq(emb, queries, k = 5)),
      ("ivfpq", () => Pq.topKIvfPq(emb, queries, k = 5)),
      ("ivfpq_nc", () => Pq.topKIvfPqWith(emb, queries, k = 5,
        Similarity.centroidsFor(emb, 16, kmeansIters = 0),
        Pq.codebooks(emb, m = 8, ksub = 16, dim = 64),
        nProbe = 4, m = 8, dim = 64, rerankMult = 8, normCorrect = true)),
      ("sq8", () => Sq8.topKSq8(emb, queries, k = 5)),
      ("opq", () => Opq.topKOpq(emb, queries, k = 5)))
    arms.foreach { case (name, mk) =>
      val t = System.nanoTime()
      val hits = mk().select(col("query_id"), col("neighbor_id"))
        .join(bf, Seq("query_id", "neighbor_id"), "left_semi")
        .count()
      println(f"[recall-probe] $name ${(System.nanoTime() - t) / 1e9}%.2f s hits=$hits")
    }
    spark.stop()
  }
}
