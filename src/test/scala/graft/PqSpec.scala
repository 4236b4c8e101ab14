package graft

import graft.operators.{Pq, Similarity}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class PqSpec extends AnyFunSuite {
  import SparkTestSession._

  private def emb = Tables(spark, sfDir, "embeddings")

  test("kmeans centroids derive the vector width from the corpus") {
    import spark.implicits._
    // regression: the VecMomentsFp rewrite hardcoded dim = 64 — a
    // 3-dim corpus threw 'expected 64 elements' mid-Lloyd-iteration
    val tiny = Seq(
      (0L, Array(1.0f, 0.0f, 0.0f)), (1L, Array(0.0f, 1.0f, 0.0f)),
      (2L, Array(0.9f, 0.1f, 0.0f)), (3L, Array(0.1f, 0.9f, 0.0f)))
      .toDF("vec_id", "embedding")
    val cents = Similarity.kmeansCentroids(tiny, k = 2, iters = 2)
      .collect().map(r => r.getLong(0) -> r.getSeq[Float](1))
    assert(cents.length == 2)
    assert(cents.forall(_._2.length == 3), "centroid width follows the corpus")
  }

  test("encode: codebook members quantize to themselves, codes in range") {
    val books = Pq.codebooks(emb, m = 8, ksub = 16, dim = 64)
    val index = Pq.encode(emb, books, m = 8, dim = 64)
    // a centroid's own sub-block has reconstruction distance 0, so
    // vector 0 must encode to code 0 in every block (no duplicate
    // sub-blocks in the synthetic embeddings)
    val c0 = index.filter(col("vec_id") === 0)
      .select(col("codes")).head().getSeq[Int](0)
    assert(c0 == Seq.fill(8)(0), s"vec 0 codes: $c0")
    val bad = index.select(explode(col("codes")).as("c"))
      .filter(col("c") < 0 || col("c") >= 16)
    assert(bad.isEmpty, "codes must index the ksub codebook")
    assert(index.count() == emb.count())
  }

  test("trained codebooks: bounded size, total encode, search intact") {
    val books = Pq.trainCodebooks(emb, m = 8, ksub = 16, dim = 64, iters = 2)
    val sizes = books.groupBy("b").count().collect().map(_.getLong(1))
    assert(sizes.length == 8 && sizes.forall(s => s >= 1 && s <= 16))
    val index = Pq.encode(emb, books, m = 8, dim = 64)
    assert(index.count() == emb.count(), "every vector must encode")
    val q = emb.filter(col("vec_id") < 8)
    val r = Pq.topKPqWith(emb, q, k = 5, books, m = 8, dim = 64, rerankMult = 8)
    assert(r.groupBy("query_id").count().collect().forall(_.getLong(1) == 5))
  }

  test("ivf-pq: candidates confined to probed cells, recall tracks pq") {
    val q = emb.filter(col("vec_id") < 16)
    val r = Pq.topKIvfPq(emb, q, k = 5)
    // partition-invariance: the composed index must rank identically
    val a = r.collect().map(x => (x.getLong(0), x.getInt(1), x.getLong(2))).toSet
    val b = Pq.topKIvfPq(emb.repartition(7), q, k = 5).collect()
      .map(x => (x.getLong(0), x.getInt(1), x.getLong(2))).toSet
    assert(a == b, "IVF-PQ ranking must be partition-invariant")
    assert(r.groupBy("query_id").count().collect().forall(_.getLong(1) <= 5))
    // pruning cannot invent neighbors: every (q, n) pair must also be
    // an IVF candidate (same cells, same probes)
    val ivf = Similarity.topKIvf(emb, q, k = 400)
      .select(col("query_id"), col("neighbor_id"))
    val stray = r.select(col("query_id"), col("neighbor_id"))
      .join(ivf, Seq("query_id", "neighbor_id"), "left_anti")
    assert(stray.isEmpty, "IVF-PQ returned a neighbor outside the probed cells")
    val bf = Similarity.topKBruteForce(emb, q, k = 5)
      .select(col("query_id"), col("neighbor_id"))
    val hits = r.select(col("query_id"), col("neighbor_id"))
      .join(bf, Seq("query_id", "neighbor_id"), "left_semi").count()
    val recall = hits.toDouble / bf.count()
    assert(recall >= 0.3, s"IVF-PQ recall collapsed: $recall")
  }

  test("pq top-k: deterministic under repartitioning, sane recall") {
    val q = emb.filter(col("vec_id") < 16)
    val a = Pq.topKPq(emb, q, k = 5).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSet
    val b = Pq.topKPq(emb.repartition(7), q, k = 5).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSet
    assert(a == b, "PQ ranking must be partition-invariant")
    val bf = Similarity.topKBruteForce(emb, q, k = 5)
      .select(col("query_id"), col("neighbor_id"))
    val hits = Pq.topKPq(emb, q, k = 5).select(col("query_id"), col("neighbor_id"))
      .join(bf, Seq("query_id", "neighbor_id"), "left_semi").count()
    val recall = hits.toDouble / bf.count()
    assert(recall >= 0.4, s"ADC+rerank recall collapsed: $recall")
  }

  test("sq8: codes 1 byte/dim, grid partition-invariant, high recall") {
    val q = emb.filter(col("vec_id") < 16)
    // codes are exactly dim bytes — the 4x-vs-float32 compression claim
    val (mins, scales) = graft.operators.Sq8.grid(emb, dim = 64)
    assert(mins.length == 64 && scales.forall(_ >= 0.0))
    val lens = emb.select(graft.functions.GraftFunctions
        .sq8Encode(col("embedding"), mins, scales).as("c"))
      .select(length(col("c")).as("l")).distinct().collect().map(_.getInt(0)).toSeq
    assert(lens == Seq(64), s"code lengths: $lens")
    // min/max grid is an order-free aggregate: ranking survives repartition
    val a = graft.operators.Sq8.topKSq8(emb, q, k = 5).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSet
    val b = graft.operators.Sq8.topKSq8(emb.repartition(7), q, k = 5).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSet
    assert(a == b, "SQ8 ranking must be partition-invariant")
    // 8-bit per-dim quantization is near-lossless for ranking: recall
    // well above the coarser PQ codes (floor 0.4 there)
    val bf = Similarity.topKBruteForce(emb, q, k = 5)
      .select(col("query_id"), col("neighbor_id"))
    val hits = graft.operators.Sq8.topKSq8(emb, q, k = 5)
      .select(col("query_id"), col("neighbor_id"))
      .join(bf, Seq("query_id", "neighbor_id"), "left_semi").count()
    val recall = hits.toDouble / bf.count()
    assert(recall >= 0.9, s"SQ8 recall collapsed: $recall")
  }

  test("opq: orthogonal rotation, partition-invariant, recall beats plain pq floor") {
    // the PCA eigenbasis is orthonormal: R·Rᵀ = I to fp tolerance
    val dim = 64
    val flat = graft.operators.Opq.rotationBasis(emb, dim)
    for (a <- 0 until dim; b <- a until dim) {
      var acc = 0.0
      var i = 0
      while (i < dim) { acc += flat(a * dim + i) * flat(b * dim + i); i += 1 }
      val expect = if (a == b) 1.0 else 0.0
      assert(math.abs(acc - expect) < 1e-9, s"R not orthonormal at ($a,$b): $acc")
    }
    val q = emb.filter(col("vec_id") < 16)
    val x = graft.operators.Opq.topKOpq(emb, q, k = 5).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSet
    val y = graft.operators.Opq.topKOpq(emb.repartition(7), q, k = 5).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSet
    assert(x == y, "OPQ ranking must be partition-invariant")
    val bf = Similarity.topKBruteForce(emb, q, k = 5)
      .select(col("query_id"), col("neighbor_id"))
    val hits = graft.operators.Opq.topKOpq(emb, q, k = 5)
      .select(col("query_id"), col("neighbor_id"))
      .join(bf, Seq("query_id", "neighbor_id"), "left_semi").count()
    val recall = hits.toDouble / bf.count()
    assert(recall >= 0.4, s"OPQ recall collapsed: $recall")
  }

  test("variance-balanced permutation: valid bijection, search is cosine-invariant") {
    val dim = 64
    val perm = Pq.varianceBalancedPerm(emb, m = 8, dim = dim)
    assert(perm.sorted == (0 until dim), s"not a permutation: $perm")
    // determinism across partitionings (fixed-point variance sums)
    assert(perm == Pq.varianceBalancedPerm(emb.repartition(7), m = 8, dim = dim))
    // a permutation is orthogonal: top-k under permuted coordinates is
    // the same ranking with the same (rounded) cosines
    val q = emb.filter(col("vec_id") < 8)
    def top(c: org.apache.spark.sql.DataFrame, qs: org.apache.spark.sql.DataFrame) =
      Similarity.topKBruteForce(c, qs, k = 5).collect()
        .map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getDouble(3))).toSet
    assert(top(emb, q) == top(Pq.permuteEmbedding(emb, perm), Pq.permuteEmbedding(q, perm)))
  }
}
