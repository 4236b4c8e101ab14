package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
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
  /** Lloyd-trained cluster assignment: one row per input vector with
    * its argmin-L2 cluster id and centroid-cosine (prototypicality).
    * The shared first stage of [[semantic]] and [[prunePrototypes]] —
    * an argmin over BROADCAST centroids folded into a partial-
    * aggregate struct-min, so the only corpus-sized exchange carries
    * one row per vector. Caller unpersists via the returned frame.
    */
  def assign(emb: DataFrame, nClusters: Int, iters: Int, dim: Int): DataFrame = {
    val cents = Pq.trainCodebooks(emb, m = 1, ksub = nClusters, dim = dim,
      iters = iters).select(col("cid"), col("cent"), col("cn2"))
    emb
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
  }

  def semantic(emb: DataFrame, nClusters: Int = 16, iters: Int = 2,
      tau: Double = 0.4, dim: Int = 64): DataFrame = {
    val assigned = assign(emb, nClusters, iters, dim)
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

  /** K-means cluster DIAGNOSTICS report: per-cluster cardinality,
    * inertia (Σ‖v−c‖², the Lloyd objective) and the prototypicality
    * (centroid-cosine) spread — the table you read before choosing
    * SemDeDup / prototype-pruning / IVF parameters (balanced cells ⇒
    * bounded per-cell quadratics; a giant cell means nClusters is too
    * small for the corpus). Same broadcast-centroid assignment as
    * [[assign]]; the report aggregate is map-side combinable and
    * exchanges one row per cluster. Deterministic: per-vector doubles
    * share the oracle's expression tree, sums run in decimal
    * (order-free), min/max are exact.
    */
  def kmeansReport(emb: DataFrame, nClusters: Int = 16, iters: Int = 2,
      dim: Int = 64): DataFrame = {
    val assigned = assign(emb, nClusters, iters, dim)
    assigned
      // assign's _dist omits the constant ‖v‖² (argmin-invariant);
      // restore it so inertia is the true L2² objective
      .withColumn("_l2sq", col("_dist") + col("_vn") * col("_vn"))
      .groupBy(col("cid"))
      .agg(count(lit(1)).as("n_vectors"),
        round(sum(col("_l2sq").cast("decimal(28,12)")).cast("double"), 4).as("inertia"),
        round(sum(col("_ccos").cast("decimal(28,12)")).cast("double") / count(lit(1)), 6)
          .as("mean_ccos"),
        round(min(col("_ccos")), 6).as("min_ccos"),
        round(max(col("_ccos")), 6).as("max_ccos"))
      .orderBy(col("cid"))
  }

  /** SSL-prototype / D4-style data pruning (Sorscher et al. 2022,
    * arXiv:2206.14486; Tirumala et al. 2023 D4): rank each vector by
    * prototypicality (cosine to its k-means centroid) and PRUNE the
    * most prototypical `pruneFrac` of every cluster — with abundant
    * data, easy/redundant prototypical examples contribute least to
    * training, so dropping them per-cluster preserves coverage of the
    * embedding space where a global quality cut would not.
    *
    * Output: (vec_id, cid, rank, n_cluster, keep) — rank 1 = most
    * prototypical in its cluster (ties by vec_id), keep = rank past
    * the pruned prefix.
    *
    * Scale shape: centroid training/assignment as in [[assign]]
    * (broadcast centroids, one row per vector through the exchanges);
    * the ranking is ONE shuffle keyed by cluster id followed by a
    * partition-local sort — per-cell work is bounded because
    * `nClusters` scales as ~n/1000 (the SemDeDup operating rule), so
    * no single cell's sort grows with the corpus.
    */
  def prunePrototypes(emb: DataFrame, nClusters: Int = 16, iters: Int = 2,
      pruneFrac: Double = 0.25, dim: Int = 64): DataFrame = {
    val byCell = Window.partitionBy(col("cid"))
    val protoOrder = byCell.orderBy(col("_ccos").desc, col("vec_id"))
    assign(emb, nClusters, iters, dim)
      .select(col("vec_id"), col("cid"), col("_ccos"))
      .withColumn("rank", row_number().over(protoOrder))
      .withColumn("n_cluster", count(lit(1)).over(byCell))
      .withColumn("keep", col("rank") > floor(lit(pruneFrac) * col("n_cluster")))
      .select(col("vec_id"), col("cid"), col("rank"), col("n_cluster"), col("keep"))
  }
}
