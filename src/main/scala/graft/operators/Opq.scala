package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

import graft.functions.GraftFunctions

/** OPQ-initialized product quantization (Ge et al. 2013, "Optimized
  * Product Quantization", CVPR — the "natural parameterization" init):
  * rotate the corpus into its PCA eigenbasis, deal the decorrelated
  * dimensions onto the m blocks with the variance-balancing serpentine
  * permutation, then run the trained-codebook PQ search unchanged.
  * Both transforms are orthogonal, so cosine geometry is preserved;
  * what changes is WHERE the variance sits — each sub-quantizer sees
  * an equal share of decorrelated energy instead of whatever raw
  * coordinate slice it happened to get, which is precisely the
  * quantization-error objective full OPQ optimizes.
  *
  * Deterministic end to end (safe to fixture-gate): the rotation comes
  * from [[Pca]]'s fixed-point moments + fixed-sweep Jacobi, the
  * permutation from fixed-point variance sums, the codebooks from
  * [[Pq.trainCodebooks]]' fixed-point Lloyd means. 100 TB shape: two
  * corpus-sized constant relations (moment sums, variance sums — both
  * map-side-combined aggregates of ≤ d² longs), one rotate+encode scan
  * (d² multiply-adds/row, no shuffle), then exactly PQ's search cost.
  */
object Opq {

  /** Row-major d×d PCA eigenbasis (eigenvalue-descending, sign-fixed)
    * — the OPQ rotation matrix.
    */
  private[graft] def rotationBasis(corpus: DataFrame, dim: Int): Array[Double] = {
    val (_, _, cov) = Pca.moments(corpus, dim)
    val (vals, vecs) = Pca.jacobi(cov)
    Pca.topComponents(vals, vecs, dim).flatten
  }

  def topKOpq(corpus: DataFrame, queries: DataFrame, k: Int,
      m: Int = 8, ksub: Int = 16, dim: Int = 64, rerankMult: Int = 8,
      trainIters: Int = 2): DataFrame = {
    val flat = rotationBasis(corpus, dim)
    def rotate(df: DataFrame): DataFrame = df.select(col("vec_id"),
      GraftFunctions.matVecF(col("embedding"), flat, dim).as("embedding"))
    val rc = rotate(corpus).persist(StorageLevel.MEMORY_AND_DISK)
    try {
      val perm = Pq.varianceBalancedPerm(rc, m, dim)
      val pc = Pq.permuteEmbedding(rc, perm)
      val pq = Pq.permuteEmbedding(rotate(queries), perm)
      val books = Pq.trainCodebooks(pc, m, ksub, dim, trainIters)
      Pq.topKPqWith(pc, pq, k, books, m, dim, rerankMult, normCorrect = true)
    } finally rc.unpersist()
  }

  /** The OPQ transform as a 1-row RELATION — (rot: flat row-major d×d
    * rotation, perm: the block permutation) — the persisted form of the
    * training-time geometry ([[transformFrom]] rehydrates it; doubles
    * roundtrip parquet exactly).
    */
  def transformRelation(corpus: DataFrame, m: Int, dim: Int): DataFrame = {
    val flat = rotationBasis(corpus, dim)
    def rotate(df: DataFrame): DataFrame = df.select(col("vec_id"),
      GraftFunctions.matVecF(col("embedding"), flat, dim).as("embedding"))
    val rc = rotate(corpus).persist(StorageLevel.MEMORY_AND_DISK)
    val perm = try Pq.varianceBalancedPerm(rc, m, dim) finally rc.unpersist()
    val spark = corpus.sparkSession
    import spark.implicits._
    Seq((flat.toSeq, perm.map(_.toLong))).toDF("rot", "perm")
  }

  /** (rotation, permutation) from a [[transformRelation]] — a 1-row
    * bounded collect.
    */
  private[graft] def transformFrom(rel: DataFrame): (Array[Double], Seq[Int]) = {
    val r = rel.select(col("rot"), col("perm")).head()
    (r.getSeq[Double](0).toArray, r.getSeq[Long](1).map(_.toInt))
  }

  /** The permuted-rotated view of a raw-embedding relation under a
    * known transform — a pure projection (no aggregate), so applying it
    * to the re-rank fetch-join costs d² multiply-adds ONLY for the
    * candidate rows the join keeps.
    */
  def applyTransform(df: DataFrame, flat: Array[Double], perm: Seq[Int],
      dim: Int): DataFrame =
    Pq.permuteEmbedding(df.select(col("vec_id"),
      GraftFunctions.matVecF(col("embedding"), flat, dim).as("embedding")), perm)

  /** OPQ search over PREBUILT (typically persisted) artifacts — the
    * transform relation, trained codebooks, and the coded
    * permuted-rotated corpus: zero training/encode jobs at query time.
    * `coded` must be `Pq.encode(applyTransform(corpus,…), books,…)`.
    */
  def topKOpqOnIndex(transform: DataFrame, books: DataFrame, coded: DataFrame,
      corpus: DataFrame, queries: DataFrame, k: Int,
      m: Int = 8, dim: Int = 64, rerankMult: Int = 8): DataFrame = {
    val (flat, perm) = transformFrom(transform)
    Pq.topKPqOnIndex(coded, applyTransform(corpus, flat, perm, dim),
      applyTransform(queries, flat, perm, dim), k, books, m, dim, rerankMult,
      normCorrect = true)
  }
}
