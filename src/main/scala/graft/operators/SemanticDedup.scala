package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

import graft.functions.GraftFunctions.{vecDot, vecNorm}

/** SemDeDup-style semantic deduplication (Abbas et al. 2023,
  * arXiv:2303.09540): embedding-space near-duplicates are searched
  * ONLY inside k-means clusters, which turns the corpus-quadratic
  * pair scan into a sum of cluster-local quadratics — the published
  * scale path for embedding dedup, complementary to the LSH-bucket
  * blocking of [[Dedup.embeddingCosine]] (LSH buckets by random
  * hyperplanes; SemDeDup buckets by the data's own cluster
  * structure, so a well-chosen `nClusters ≈ n/1000` bounds every
  * cell's quadratic at ~10^6 comparisons regardless of corpus size).
  *
  * Scale shape: centroid training and assignment are broadcast
  * argmin-L2 joins followed by map-side-combined aggregates (the
  * only corpus-sized exchanges carry one row per vector); the pair
  * scan shuffles each vector ONCE, keyed by its cluster id; the
  * verdict joins move (vec_id, group) pairs. Nothing is ever
  * corpus × corpus.
  *
  * Determinism: centroids are Lloyd-trained through
  * [[Pq.trainCodebooks]] with ONE block spanning the whole vector —
  * reusing its fixed-point (x·2^20) order-free mean update, so the
  * trained centroids are bit-reproducible under any partitioning and
  * the operator is oracle-gateable (mirrored by
  * tools/make_expected.py `train_books(m=1)`).
  */
object SemanticDedup {

  /** Per-vector verdict: (vec_id, cid, grp, keep) for EVERY input
    * vector — cluster id, duplicate-group id (the group's minimum
    * vec_id; singletons group with themselves), and whether this
    * vector is the group's kept representative. The keep rule is the
    * paper's: per group keep the member FARTHEST from its cluster
    * centroid (lowest centroid-cosine, ties by vec_id) — the least
    * prototypical example, which preserves diversity where keep-any
    * would collapse toward cluster centers.
    */
  def semantic(emb: DataFrame, nClusters: Int = 16, iters: Int = 2,
      tau: Double = 0.4, dim: Int = 64): DataFrame = {
    val cents = Pq.trainCodebooks(emb, m = 1, ksub = nClusters, dim = dim,
      iters = iters).select(col("cid"), col("cent"), col("cn2"))
    // assign: argmin-L2 over broadcast centroids, (dist, cid) struct
    // min — one row per vector leaves the partial aggregate. The
    // centroid-cosine rides along for the keep rule.
    val assigned = emb
      .select(col("vec_id"), col("embedding"), vecNorm(col("embedding")).as("_vn"))
      .join(broadcast(cents))
      .withColumn("_dist", col("cn2") - lit(2.0) * vecDot(col("embedding"), col("cent")))
      .withColumn("_cc", vecDot(col("embedding"), col("cent")) / (col("_vn") * sqrt(col("cn2"))))
      .groupBy(col("vec_id"))
      .agg(min(struct(col("_dist"), col("cid"), col("_cc"),
        col("embedding"), col("_vn"))).as("_b"))
      .select(col("vec_id"), col("_b._dist").as("_dist"), col("_b.cid").as("cid"),
        col("_b._cc").as("_ccos"), col("_b.embedding").as("embedding"),
        col("_b._vn").as("_vn"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    // cluster-local pair scan: each side shuffles the corpus once,
    // keyed by cid; the quadratic stays inside a cell.
    val a = assigned.select(col("cid"), col("vec_id").as("doc_a"),
      col("embedding").as("_ea"), col("_vn").as("_na"))
    val b = assigned.select(col("cid"), col("vec_id").as("doc_b"),
      col("embedding").as("_eb"), col("_vn").as("_nb"))
    val pairs = a.join(b, Seq("cid"))
      .filter(col("doc_a") < col("doc_b"))
      .filter(vecDot(col("_ea"), col("_eb")) / (col("_na") * col("_nb")) >= tau)
      .select(col("doc_a"), col("doc_b"))
    // intra-cluster duplicate groups (pairs never cross clusters, so
    // the global component resolution stays cluster-confined)
    val fam = Dedup.componentMap(pairs).withColumnRenamed("doc_id", "vec_id")
    val verdict = assigned
      .join(fam, Seq("vec_id"), "left")
      .withColumn("grp", coalesce(col("family_id"), col("vec_id")))
      .select(col("vec_id"), col("cid"), col("grp"), col("_ccos"))
    val keepers = verdict.groupBy(col("grp"))
      .agg(min(struct(col("_ccos"), col("vec_id"))).as("_k"))
      .select(col("grp"), col("_k.vec_id").as("_keep_id"))
    verdict.join(keepers, Seq("grp"))
      .select(col("vec_id"), col("cid"), col("grp"),
        (col("vec_id") === col("_keep_id")).as("keep"))
  }
}
