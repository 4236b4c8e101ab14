package graft.tools

import graft.operators.{Pq, Similarity}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.SparkSession

/** Composed IVF-PQ quality sweep (SURVEY §8 round-3 item): recall@5 vs
  * exact brute force across (nProbe, m, ksub, train, normCorrect) at a
  * fixed cell layout, on a ScaleData-generated clustered corpus. The
  * point of the composition: IVF bounds the FRACTION of the corpus a
  * query scans, PQ bounds the BYTES per scanned row — the sweep
  * reports both levers next to the recall they buy, plus the
  * norm-correction's effect on trained codebooks (SCALE.md recorded
  * Lloyd's mean-shrinkage HURTING plain ADC at low ksub).
  *
  * Usage: runMain graft.tools.IvfPqSweep <embDir> [nQueries]
  */
object IvfPqSweep {

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
    val dim = emb.select(size(col("embedding"))).head.getInt(0)
    val stride = math.max(1L, n / nQueries)
    // orderBy before limit: the query set must be deterministic even
    // if the frame is ever recomputed
    val queries = emb.filter(col("vec_id") % stride === 0)
      .orderBy(col("vec_id")).limit(nQueries)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val q = queries.count()

    val bf = Similarity.topKBruteForce(emb, queries, k = 5)
      .select(col("query_id"), col("neighbor_id"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val bfTotal = bf.count().toDouble

    // cell layout fixed at the IvfSweep winner shape (~100-400
    // vectors/cell, 2 Lloyd iterations); the sweep varies the scoring
    val nCentroids = math.max(16, (n / 256).toInt)
    val centroids = Similarity.centroidsFor(emb, nCentroids, kmeansIters = 2)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    centroids.count()
    val cellSizes = Similarity.assignCells(emb, centroids, "vec_id", "embedding", 1)
      .groupBy(col("cid")).agg(count(lit(1)).as("cell_n"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)

    println(s"[ivfpqsweep] corpus=$n dim=$dim queries=$q bfPairs=$bfTotal nCentroids=$nCentroids")
    println("nProbe\tm\tksub\ttrain\tnormCorr\trr\trecall@5\tcand_frac\tbytes/row\tsec")

    val results = (for {
      np <- Seq(8, 16)
      m <- Seq(8, 16)
      ks <- Seq(64, 256)
      ti <- Seq(0, 2)
    } yield {
      val books =
        (if (ti == 0) Pq.codebooks(emb, m, ks, dim)
         else Pq.trainCodebooks(emb, m, ks, dim, ti))
          .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      books.count()
      val candFrac = Similarity.assignCells(queries, centroids, "vec_id", "embedding", np)
        .join(cellSizes, "cid")
        .agg(sum(col("cell_n"))).head.getLong(0).toDouble / (q.toDouble * n)
      val rows = (for {
        nc <- Seq(false, true)
        rr <- Seq(8, 32)
      } yield {
        val t0 = System.nanoTime()
        val hits = Pq.topKIvfPqWith(emb, queries, k = 5, centroids, books,
            nProbe = np, m = m, dim = dim, rerankMult = rr, normCorrect = nc)
          .select(col("query_id"), col("neighbor_id"))
          .join(bf, Seq("query_id", "neighbor_id"), "left_semi")
          .count()
        val sec = (System.nanoTime() - t0) / 1e9
        val recall = hits / bfTotal
        val bytesPerRow = m + 4.0 // packed codes + one float norm
        println(f"$np\t$m\t$ks\t$ti\t$nc\t$rr\t$recall%.4f\t$candFrac%.4f\t$bytesPerRow%.0f\t$sec%.1f")
        (np, m, ks, ti, nc, rr, recall, candFrac, sec)
      })
      // release only this config's codebook — clearCache() here would
      // ALSO wipe emb/bf/centroids and force their recompute inside
      // the next config's timed section; the per-config PQ indexes
      // are small enough for the block-store LRU to manage
      books.unpersist()
      rows
    }).flatten

    val good = results.filter(r => r._7 >= 0.9 && r._8 < 0.2).sortBy(r => (r._8, r._6))
    val best = good.headOption.map(r =>
      s"""{"nProbe":${r._1},"m":${r._2},"ksub":${r._3},"train":${r._4},"normCorrect":${r._5},"rerankMult":${r._6},"recall":${r._7},"cand_frac":${r._8}}""")
      .getOrElse("null")
    println(s"""{"metric":"ivfpq_sweep","corpus":$n,"queries":$q,"configs":${results.size},"best_config":$best}""")
    spark.stop()
  }
}
