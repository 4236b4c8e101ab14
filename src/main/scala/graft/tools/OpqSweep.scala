package graft.tools

import graft.operators.{Pq, Similarity}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** OPQ dimension-allocation A/B (VERDICT round-2 item 9): recall@5 of
  * trained-codebook IVF-PQ with and without the variance-balanced
  * dimension permutation ([[Pq.varianceBalancedPerm]]), same centroids
  * and knobs. The permutation is orthogonal, so brute-force truth is
  * computed once on the unpermuted corpus and applies to both.
  *
  * Usage: runMain graft.tools.OpqSweep <embDir> [nQueries]
  */
object OpqSweep {

  def main(args: Array[String]): Unit = {
    val dir = args(0)
    val nQueries = if (args.length > 1) args(1).toInt else 200
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "16")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.codegen.cache.maxEntries", "5000")
      .getOrCreate()
    graft.GraftSession.tune(spark)
    spark.sparkContext.setLogLevel("WARN")
    val P = org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK

    val emb = spark.read.parquet(s"$dir/embeddings.parquet").persist(P)
    val n = emb.count()
    val dim = emb.select(size(col("embedding"))).head.getInt(0)
    val stride = math.max(1L, n / nQueries)
    val queries = emb.filter(col("vec_id") % stride === 0)
      .orderBy(col("vec_id")).limit(nQueries).persist(P)
    val q = queries.count()
    val bf = Similarity.topKBruteForce(emb, queries, k = 5)
      .select(col("query_id"), col("neighbor_id")).persist(P)
    val bfTotal = bf.count().toDouble

    val perm = Pq.varianceBalancedPerm(emb, m = 8, dim = dim)
    println(s"[opqsweep] corpus=$n dim=$dim queries=$q perm=${perm.mkString(",")}")
    println("variant\tm\tksub\trecall@5\tsec")

    val nCentroids = math.max(16, (n / 256).toInt)
    for (m <- Seq(8, 16); ks <- Seq(64, 256)) {
      for ((label, corpus0, queries0) <- Seq(
        ("plain", emb, queries),
        ("opq", Pq.permuteEmbedding(emb, perm).persist(P),
          Pq.permuteEmbedding(queries, perm).persist(P)))) {
        val centroids = Similarity.centroidsFor(corpus0, nCentroids, kmeansIters = 2)
          .persist(P)
        centroids.count()
        val books = Pq.trainCodebooks(corpus0, m, ks, dim, iters = 2).persist(P)
        books.count()
        val t0 = System.nanoTime()
        val hits = Pq.topKIvfPqWith(corpus0, queries0, k = 5, centroids, books,
            nProbe = 8, m = m, dim = dim, rerankMult = 8, normCorrect = true)
          .select(col("query_id"), col("neighbor_id"))
          .join(bf, Seq("query_id", "neighbor_id"), "left_semi")
          .count()
        val sec = (System.nanoTime() - t0) / 1e9
        println(f"$label\t$m\t$ks\t${hits / bfTotal}%.4f\t$sec%.1f")
        books.unpersist(); centroids.unpersist()
      }
    }
    spark.stop()
  }
}
