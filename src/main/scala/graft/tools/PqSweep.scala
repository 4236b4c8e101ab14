package graft.tools

import graft.operators.{Pq, Similarity}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** PQ quality sweep at realistic corpus size — the [[IvfSweep]]
  * counterpart for the product-quantization searcher: recall@5 vs
  * brute force across (m, ksub, rerankMult) on a ScaleData-generated
  * clustered corpus, with the compression ratio each config implies
  * (dim floats vs m codes + 1 norm). Results land in SCALE.md.
  *
  * Usage: runMain graft.tools.PqSweep <embDir> [nQueries]
  */
object PqSweep {

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
    val queries = emb.filter(col("vec_id") % stride === 0)
      .limit(nQueries)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    queries.count()

    val bf = Similarity.topKBruteForce(emb, queries, k = 5)
      .select(col("query_id"), col("neighbor_id"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val bfTotal = bf.count().toDouble
    println(s"[pqsweep] corpus=$n dim=$dim queries=$nQueries bfPairs=$bfTotal")
    println("m\tksub\ttrainIters\trerankMult\trecall@5\tcompression\tsec")

    val results = (for {
      m <- Seq(8, 16)
      ks <- Seq(16, 64, 256)
      ti <- Seq(0, 2)
    } yield {
      // one codebook (and one training run) per config; rerank sweeps
      // reuse it
      val books =
        (if (ti == 0) Pq.codebooks(emb, m, ks, dim)
         else Pq.trainCodebooks(emb, m, ks, dim, ti))
          .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      books.count()
      val rows = Seq(4, 8, 16, 32).map { rr =>
        val t0 = System.nanoTime()
        val hits = Pq.topKPqWith(emb, queries, k = 5, books, m, dim, rerankMult = rr)
          .select(col("query_id"), col("neighbor_id"))
          .join(bf, Seq("query_id", "neighbor_id"), "left_semi")
          .count()
        val sec = (System.nanoTime() - t0) / 1e9
        val recall = hits / bfTotal
        // codes as ints in this prototype; a packed layout stores m
        // bytes (ksub<=256) + 4-byte norm vs dim*4 bytes of floats
        val compression = (dim * 4.0) / (m + 4.0)
        println(f"$m\t$ks\t$ti\t$rr\t$recall%.4f\t${compression}%.0fx\t$sec%.2f")
        (m, ks, ti, rr, recall, sec)
      }
      spark.catalog.clearCache()
      emb.persist(); queries.persist(); bf.persist()
      rows
    }).flatten
    val best = results.filter(_._5 >= 0.9).sortBy(_._4)
    println(s"""{"metric":"pq_sweep","corpus":$n,"configs":${results.size},""" +
      s""""reaching_0.9_recall":${best.size}}""")
    spark.stop()
  }
}
