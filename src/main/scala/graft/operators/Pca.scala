package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Deterministic PCA over the embedding corpus (Pearson/Hotelling;
  * the Jacobi eigenvalue method of von Neumann era numerics — chosen
  * here over QR/Lanczos because its rotation sequence is a FIXED,
  * branch-stable program both engines can replay bit-for-bit). PCA is
  * the embedding-transform workhorse of a curation stack: variance
  * reports, whitening before cosine dedup, OPQ-style rotations, and
  * cheap 2-D corpus maps all start from the same loadings.
  *
  * Distribution shape, sized for 100 TB:
  *  - the ONLY corpus-sized work is two scans producing fixed-point
  *    integer moment sums (Σx_i and upper-tri Σx_i·x_j), partially
  *    aggregated map-side; the exchange is d + d(d+1)/2 longs
  *    (2 144 rows at d=64) REGARDLESS of corpus size;
  *  - truncating each term to 2^-30 fixed point makes the sums exact
  *    integers — order-independent under any partitioning, and
  *    mirrored exactly by the pure-Python fixture generator (the same
  *    trick Pq.trainCodebooks uses for Lloyd means);
  *  - the d×d eigensolve is driver-side O(d³) scalar work — at any
  *    corpus size it stays 64×64; cyclic Jacobi with a fixed sweep
  *    count has no data-dependent control flow beyond exact-zero
  *    skips, which replicate since both sides see identical doubles;
  *  - projection is one broadcast join against the (i, k, loading)
  *    relation and a decimal-summed dot product per (vector,
  *    component) — deterministic under partial-agg reordering, no
  *    shuffle of embeddings.
  *
  * At ~1e12 rows the 2^-30-scaled product sums would overflow int64;
  * the production knob is the standard one — estimate moments on a
  * hash-sampled slice (Sampling.hashSample) — which changes none of
  * the dataflow here.
  */
object Pca {

  /** Fixed-point scale for moment terms (2^30). */
  val Fp: Double = (1L << 30).toDouble

  /** Mean vector and raw-second-moment covariance from two exact
    * integer-sum aggregates; returns (n, mean, cov).
    */
  def moments(emb: DataFrame, dim: Int): (Long, Array[Double], Array[Array[Double]]) = {
    // One scan, one custom aggregate, one collected row: the old plan
    // double-posexploded every embedding into dim(dim+1)/2 = 2 080
    // (i, j, product) rows BEFORE the partial aggregate — 2 080× the
    // corpus row count through a hash aggregate, in two separate jobs.
    // VecMomentsFp keeps one running (n, s1, s2) array per partial
    // (map-side combined, one triple per partition on the exchange)
    // with the identical per-element truncate-then-sum arithmetic, so
    // the collected moments are bit-identical to the explode form.
    val row = emb.agg(graft.functions.GraftFunctions
      .vecMomentsFp(col("embedding"), Fp, dim, outer = true).as("m"))
      .head().getStruct(0)
    val n = row.getLong(0)
    // fail loudly on an empty corpus (the old posexplode plan threw on
    // head(); a silent n=0 here would divide into NaN means/covariance)
    require(n > 0, "Pca.moments: empty input — no embedding rows to aggregate")
    val s1 = row.getSeq[Long](1).toArray
    val s2 = row.getSeq[Long](2).toArray

    val mean = s1.map(s => s.toDouble / (Fp * n.toDouble))
    val cov = Array.ofDim[Double](dim, dim)
    var idx = 0
    var i = 0
    while (i < dim) {
      var j = i
      while (j < dim) {
        val c = s2(idx).toDouble / (Fp * n.toDouble) - mean(i) * mean(j)
        cov(i)(j) = c
        cov(j)(i) = c
        idx += 1
        j += 1
      }
      i += 1
    }
    (n, mean, cov)
  }

  /** Cyclic Jacobi with a fixed sweep count: returns (eigenvalues,
    * row-major eigenvectors V, V(k) the k-th vector). No thresholds,
    * no early exit — the rotation program depends only on the input
    * doubles, so the Python fixture replays it exactly.
    */
  def jacobi(cIn: Array[Array[Double]], sweeps: Int = 30): (Array[Double], Array[Array[Double]]) = {
    val d = cIn.length
    val a = cIn.map(_.clone())
    val v = Array.tabulate(d, d)((i, j) => if (i == j) 1.0 else 0.0)
    var sweep = 0
    while (sweep < sweeps) {
      var p = 0
      while (p < d - 1) {
        var q = p + 1
        while (q < d) {
          val apq = a(p)(q)
          if (apq != 0.0) {
            val theta = (a(q)(q) - a(p)(p)) / (2.0 * apq)
            val t =
              if (theta >= 0.0) 1.0 / (theta + math.sqrt(theta * theta + 1.0))
              else 1.0 / (theta - math.sqrt(theta * theta + 1.0))
            val c = 1.0 / math.sqrt(t * t + 1.0)
            val s = t * c
            var k = 0
            while (k < d) {
              val akp = a(k)(p); val akq = a(k)(q)
              a(k)(p) = c * akp - s * akq
              a(k)(q) = s * akp + c * akq
              k += 1
            }
            k = 0
            while (k < d) {
              val apk = a(p)(k); val aqk = a(q)(k)
              a(p)(k) = c * apk - s * aqk
              a(q)(k) = s * apk + c * aqk
              k += 1
            }
            k = 0
            while (k < d) {
              val vkp = v(k)(p); val vkq = v(k)(q)
              v(k)(p) = c * vkp - s * vkq
              v(k)(q) = s * vkp + c * vkq
              k += 1
            }
          }
          q += 1
        }
        p += 1
      }
      sweep += 1
    }
    (Array.tabulate(d)(i => a(i)(i)), v)
  }

  /** Top-r loadings ordered by (eigenvalue desc, index asc), each
    * sign-fixed so its largest-|component| entry is positive.
    */
  def topComponents(eigVals: Array[Double], v: Array[Array[Double]], r: Int): Array[Array[Double]] = {
    val d = eigVals.length
    val order = (0 until d).sortBy(i => (-eigVals(i), i)).take(r)
    order.map { c =>
      val vec = Array.tabulate(d)(i => v(i)(c))
      var best = 0
      var i = 1
      while (i < d) {
        if (math.abs(vec(i)) > math.abs(vec(best))) best = i
        i += 1
      }
      if (vec(best) < 0.0) vec.map(x => -x) else vec
    }.toArray
  }

  /** (vec_id, k, proj): the corpus projected onto the top-r principal
    * components; decimal-summed dot products, rounded to 6 decimals.
    */
  def project(emb: DataFrame, comps: Array[Array[Double]]): DataFrame = {
    val spark = emb.sparkSession
    import spark.implicits._
    val compDF = (for {
      k <- comps.indices
      i <- comps(k).indices
    } yield (i, k, comps(k)(i))).toDF("i", "k", "v")
    emb.select(col("vec_id"), posexplode(col("embedding")).as(Seq("i", "xi")))
      .join(broadcast(compDF), "i")
      .select(col("vec_id"), col("k"),
        (col("xi").cast("double") * col("v")).cast("decimal(28,16)").as("t"))
      .groupBy(col("vec_id"), col("k"))
      .agg(sum(col("t")).cast("double").as("_p"))
      .select(col("vec_id"), col("k"), round(col("_p"), 6).as("proj"))
  }

  /** The full operator: moments → eigensolve → projection. */
  def pca(emb: DataFrame, dim: Int = 64, r: Int = 8): DataFrame = {
    val (_, _, cov) = moments(emb, dim)
    val (vals, vecs) = jacobi(cov)
    project(emb, topComponents(vals, vecs, r))
  }
}
