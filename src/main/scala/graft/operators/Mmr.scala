package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Maximal Marginal Relevance re-ranking (Carbonell & Goldstein 1998)
  * over an ANN candidate pool — the standard diversity pass between
  * retrieval and a RAG context window: from the top-`kCand` cosine
  * candidates per query, greedily select `k` maximizing
  * `λ·rel(q,c) − (1−λ)·max_{s∈selected} sim(c,s)`, so near-duplicate
  * hits (which the embeddings corpus is full of, by construction)
  * can't crowd out coverage.
  *
  * Scale shape (100 TB): the candidate pool comes from any ANN
  * operator (here brute force for exactness); the pool relation is
  * |queries|·kCand rows and is BROADCAST against the corpus scan to
  * fetch candidate vectors — the corpus never shuffles. The greedy
  * selection is inherently sequential *per query* but each group is a
  * bounded kCand-element array, so `mapGroups` over the
  * query-partitioned pool is O(kCand²·d) per query with no cross-query
  * coupling — embarrassingly parallel in the number of queries.
  *
  * Determinism: relevance uses the candidate table's 4-dp cosine;
  * pairwise sims are the same index-ordered double-accumulated
  * cosine as the VecDot kernel, rounded to 4 dp before scoring;
  * argmax ties break to the smaller neighbor_id (candidates iterate
  * id-ascending, strictly-greater wins). Mirrored bit-for-bit by
  * make_expected.gen_sim_mmr_rerank.
  */
/** One pooled candidate row (top-level for Encoder derivation). */
case class MmrCand(query_id: Long, neighbor_id: Long, cosine: Double,
    embedding: Array[Float])

object Mmr {

  private def cosine(a: Array[Float], b: Array[Float]): Double = {
    var dot = 0.0; var na = 0.0; var nb = 0.0; var i = 0
    val n = math.min(a.length, b.length)
    while (i < n) {
      val x = a(i).toDouble; val y = b(i).toDouble
      dot += x * y; na += x * x; nb += y * y; i += 1
    }
    dot / (math.sqrt(na) * math.sqrt(nb))
  }

  // Spark round(double, 4) semantics: HALF_UP over the shortest-decimal
  // form (BigDecimal.valueOf == Python Decimal(repr(x)) in make_expected)
  private def round4(x: Double): Double =
    java.math.BigDecimal.valueOf(x)
      .setScale(4, java.math.RoundingMode.HALF_UP).doubleValue()

  /** Greedy MMR selection over one query's candidate array (id-asc). */
  private[operators] def select(cands: Array[(Long, Double, Array[Float])],
      k: Int, lambda: Double): Seq[(Int, Long, Double)] = {
    val n = cands.length
    // pairwise candidate sims, rounded like the relevance column
    val sim = Array.ofDim[Double](n, n)
    for (i <- 0 until n; j <- (i + 1) until n) {
      val s = round4(cosine(cands(i)._3, cands(j)._3))
      sim(i)(j) = s; sim(j)(i) = s
    }
    val picked = scala.collection.mutable.ArrayBuffer.empty[(Int, Long, Double)]
    val used = new Array[Boolean](n)
    val maxSimToSel = new Array[Double](n) // max over empty set = 0.0
    var rank = 1
    while (rank <= math.min(k, n)) {
      var best = -1; var bestScore = Double.NegativeInfinity
      var i = 0
      while (i < n) {
        if (!used(i)) {
          val score = lambda * cands(i)._2 - (1 - lambda) * maxSimToSel(i)
          if (score > bestScore) { best = i; bestScore = score }
        }
        i += 1
      }
      picked += ((rank, cands(best)._1, round4(bestScore)))
      used(best) = true
      var j = 0
      while (j < n) {
        if (!used(j) && sim(j)(best) > maxSimToSel(j)) maxSimToSel(j) = sim(j)(best)
        j += 1
      }
      rank += 1
    }
    picked.toSeq
  }

  /** (query_id, rank, neighbor_id, mmr_score): λ-diversified top-k
    * from the exact top-`kCand` cosine pool.
    */
  def rerank(corpus: DataFrame, queries: DataFrame, kCand: Int, k: Int,
      lambda: Double): DataFrame = {
    val spark = corpus.sparkSession
    import spark.implicits._
    val pool = Similarity.topKBruteForce(corpus, queries, kCand)
      .select(col("query_id"), col("neighbor_id"), col("cosine"))
    // broadcast the tiny pool against the corpus scan: vectors are
    // fetched map-side, the corpus never shuffles
    val withVec = corpus
      .select(col("vec_id").as("neighbor_id"), col("embedding"))
      .join(broadcast(pool), "neighbor_id")
      .select(col("query_id"), col("neighbor_id"), col("cosine"), col("embedding"))
      .as[MmrCand]
    withVec
      .groupByKey(_.query_id)
      .flatMapGroups { (qid, it) =>
        val cands = it.toArray.sortBy(_.neighbor_id)
          .map(c => (c.neighbor_id, c.cosine, c.embedding))
        select(cands, k, lambda).map { case (r, id, s) => (qid, r, id, s) }
      }
      .toDF("query_id", "rank", "neighbor_id", "mmr_score")
      .select(col("query_id"), col("rank").cast("int").as("rank"),
        col("neighbor_id"), col("mmr_score"))
  }
}
