package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Per-arm anatomy of sim_recall_report — times each ANN arm's
  * score-join separately (sequential, exclusive) with per-arm job
  * counts, so optimization effort lands on the arm that actually
  * costs, not the aggregate. Mirrors the query's round-7 shared-
  * artifact structure: one seed-centroid relation, one codebook, one
  * persisted coded corpus shared by the pq / ivfpq / ivfpq_nc arms.
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
    val metrics = new ShuffleMetricsListener
    spark.sparkContext.addSparkListener(metrics)
    import graft.operators.{Opq, Pq, Similarity, Sq8}

    def timed[T](name: String)(work: => T): T = {
      val m0 = metrics.snapshot(spark.sparkContext)
      val t0 = System.nanoTime()
      val out = work
      val m1 = metrics.snapshot(spark.sparkContext)
      val d = m1 - m0
      println(f"[recall-probe] $name ${(System.nanoTime() - t0) / 1e9}%.2f s " +
        f"njobs=${d.jobs} gc=${d.gcMs}ms")
      out
    }

    val emb = graft.Tables(spark, dir, "embeddings")
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val queries = emb.filter(col("vec_id") < 64)
    val bf = Similarity.topKBruteForce(emb, queries, k = 5)
      .select(col("query_id"), col("neighbor_id"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    timed("ground_truth") { bf.count() }

    val seedCentroids = Similarity.centroidsFor(emb, 16, kmeansIters = 0)
    val seedBooks = Pq.codebooks(emb, m = 8, ksub = 16, dim = 64)
    val pqIndex = Pq.encode(emb, seedBooks, m = 8, dim = 64)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    timed("pq_index") { pqIndex.count() }
    val ivfpqIndex = pqIndex.join(
      Similarity.assignCells(emb, seedCentroids, "vec_id", "embedding", keep = 1)
        .withColumnRenamed("cid", "_cell"), "vec_id")
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    timed("ivfpq_index") { ivfpqIndex.count() }

    val arms: Seq[(String, () => DataFrame)] = Seq(
      ("opq", () => Opq.topKOpq(emb, queries, k = 5)),
      ("ivf_kmeans", () => Similarity.topKIvf(emb, queries, k = 5, kmeansIters = 3)),
      ("sq8", () => Sq8.topKSq8(emb, queries, k = 5)),
      ("lsh", () => Similarity.topKLsh(emb, queries, k = 5, bits = 6)),
      ("ivf", () => Similarity.topKIvfWith(emb, queries, k = 5, seedCentroids, nProbe = 4)),
      ("pq", () => Pq.topKPqOnIndex(pqIndex, emb, queries, k = 5,
        seedBooks, m = 8, dim = 64, rerankMult = 8)),
      ("ivfpq", () => Pq.topKIvfPqOnIndex(ivfpqIndex, emb, queries, k = 5,
        seedCentroids, seedBooks, nProbe = 4, m = 8, dim = 64, rerankMult = 8)),
      ("ivfpq_nc", () => Pq.topKIvfPqOnIndex(ivfpqIndex, emb, queries, k = 5,
        seedCentroids, seedBooks, nProbe = 4, m = 8, dim = 64, rerankMult = 8,
        normCorrect = true)))
    arms.foreach { case (name, mk) =>
      timed(name) {
        mk().select(col("query_id"), col("neighbor_id"))
          .join(bf, Seq("query_id", "neighbor_id"), "left_semi")
          .count()
      }
    }
    spark.stop()
  }
}
