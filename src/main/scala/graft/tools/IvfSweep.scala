package graft.tools

import graft.operators.Similarity
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** IVF quality sweep at realistic corpus size (VERDICT round-1 item
  * 7): recall@5 and scored-candidate fraction across
  * (nCentroids, nProbe, kmeansIters) against exact brute force, on a
  * ScaleData-generated clustered corpus. Prints one TSV row per
  * config plus a JSON summary line; results land in SCALE.md.
  *
  * Usage: runMain graft.tools.IvfSweep <embDir> [nQueries]
  */
object IvfSweep {

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

    val emb = spark.read.parquet(s"$dir/embeddings.parquet")
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val n = emb.count()
    // queries spread across the id space so they cover many clusters
    val stride = math.max(1L, n / nQueries)
    val queries = emb.filter(col("vec_id") % stride === 0)
      .limit(nQueries)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val q = queries.count()

    val bf = Similarity.topKBruteForce(emb, queries, k = 5)
      .select(col("query_id"), col("neighbor_id"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val bfTotal = bf.count().toDouble
    println(s"[ivfsweep] corpus=$n queries=$q bfPairs=$bfTotal")
    println("nCentroids\tnProbe\tkmeansIters\trecall@5\tcand_frac\tsec")

    val results = for {
      nc <- Seq(64, 256, 1024)
      np <- Seq(4, 8, 16, 32) if np < nc
      km <- Seq(0, 2)
    } yield {
      val t0 = System.nanoTime()
      val centroids = Similarity.centroidsFor(emb, nc, km)
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      // candidate fraction: probed-cell sizes summed per query
      val cellSizes = Similarity.assignCells(emb, centroids, "vec_id", "embedding", 1)
        .groupBy(col("cid")).agg(count(lit(1)).as("cell_n"))
      val cand = Similarity.assignCells(queries, centroids, "vec_id", "embedding", np)
        .join(cellSizes, "cid")
        .agg(sum(col("cell_n"))).head.getLong(0).toDouble
      val candFrac = cand / (q.toDouble * n)
      val hits = Similarity.topKIvfWith(emb, queries, k = 5, centroids, nProbe = np)
        .select(col("query_id"), col("neighbor_id"))
        .join(bf, Seq("query_id", "neighbor_id"), "left_semi")
        .count()
      val recall = hits / bfTotal
      val sec = (System.nanoTime() - t0) / 1e9
      centroids.unpersist()
      println(f"$nc%d\t$np%d\t$km%d\t$recall%.4f\t$candFrac%.4f\t$sec%.1f")
      (nc, np, km, recall, candFrac, sec)
    }

    val good = results.filter(r => r._4 >= 0.9 && r._5 < 0.2)
      .sortBy(_._5).headOption
    val best = good.map(r => s"""{"nCentroids":${r._1},"nProbe":${r._2},"kmeansIters":${r._3},"recall":${r._4},"cand_frac":${r._5}}""").getOrElse("null")
    println(s"""{"metric":"ivf_sweep","corpus":$n,"queries":$q,"best_config":$best}""")
    spark.stop()
  }
}
