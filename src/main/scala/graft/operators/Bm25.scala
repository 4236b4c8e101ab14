package graft.operators

import graft.functions.GraftFunctions
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Okapi BM25 ranked retrieval over the documents corpus — the search
  * capability of a data-curation stack (find near-matches of an eval
  * prompt, audit what a crawl contains for a topic, build retrieval
  * training pairs). The reference engine has no search operator; this
  * extends SURVEY §2D (Robertson/Spärck Jones BM25, the Lucene
  * `ln(1 + (N-df+0.5)/(df+0.5))` idf form).
  *
  * Plan shape, sized for 100 TB:
  *  - the corpus scan computes doc length and emits ONLY the
  *    fingerprints of tokens in the query-term set (the codegen'd
  *    MatchedTermFps kernel — binary search per word, no join, no
  *    per-word string explode): non-matching text never leaves the
  *    scan, not even as exploded rows;
  *  - the one corpus-proportional exchange carries (doc_id, term)
  *    pairs AFTER map-side combine, i.e. O(distinct matched doc-term
  *    pairs), each row 8B id + a term from the fixed query vocabulary
  *    (O(1) distinct values — dictionary-encodes to bytes);
  *  - df / corpus stats / query relations are O(|terms|) and
  *    broadcast — the scored relation never shuffles for them;
  *  - per-term partial scores are decimal-summed per (query, doc)
  *    (order-independent, hash-stable) and ranked by the bounded-heap
  *    TopKAgg — no global sort, no window over the full posting list.
  */
object Bm25 {

  // k1 = 1.2 and b = 0.75 (the canonical defaults) appear as inline
  // literals in the scoring expression: the oracle's doubles match
  // only if both engines parse the IDENTICAL literal (1.2 + 1.0 is a
  // different double than the literal 2.2), so the formula is written
  // out rather than derived from constants.

  /** Fixed keyword queries over the synthetic corpus vocabulary. */
  val defaultQueries: Seq[(Int, String)] = Seq(
    1 -> "spark join agg",
    2 -> "window sort merge",
    3 -> "customer query fast",
    4 -> "stream batch filter")

  /** The query-term fingerprint relation: (query_id, term fp) plus
    * the sorted distinct fp array the MatchedTermFps scan kernel
    * binary-searches. require()s the term set fp-collision-free so
    * fp-keyed matching is exactly string-keyed matching (up to the
    * 2⁻⁶⁴ corpus-word/term collision convention the n-gram dedup
    * family already carries).
    */
  private def termFingerprints(
      queries: Seq[(Int, String)]): (Seq[(Int, Long)], Array[Long]) = {
    def fp(t: String): Long = graft.functions.TextHashes.fnv1a64(
      org.apache.spark.unsafe.types.UTF8String.fromString(t))
    // fingerprint per (query, term) PAIR — never zip the per-pair qid
    // list against a per-DISTINCT-term fp list: with a term shared by
    // two queries the lists have different lengths and zip silently
    // misaligns/truncates the relation
    val qTermFps = queries.flatMap { case (qid, text) =>
      text.split(" ").distinct.map(t => (qid, fp(t)))
    }
    val termSet = queries.flatMap(_._2.split(" ")).distinct
    require(termSet.map(fp).distinct.length == termSet.length,
      "Bm25: fnv1a64 collision inside the query term set")
    (qTermFps, termSet.map(fp).toArray.sorted)
  }

  /** Top-k docs per keyword query: (query_id, rank, doc_id, score). */
  def topK(docs: DataFrame, queries: Seq[(Int, String)], k: Int): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._

    val (qTermFps, termFps) = termFingerprints(queries)

    // matched postings: tf per (doc, term fp), dl carried through (it
    // is constant per doc — max() is just the cheapest way to keep
    // it). The scan kernel emits O(matches) longs; non-matching text
    // never leaves the scan, not even as exploded rows.
    val tf = docs
      .select(col("doc_id"), size(split(rtrim(col("text")), " ")).as("dl"),
        explode(GraftFunctions.matchedTermFps(col("text"), termFps)).as("_fp"))
      .groupBy(col("doc_id"), col("_fp"))
      .agg(count(lit(1)).as("tf"), max(col("dl")).as("dl"))

    val dfRel = tf.groupBy(col("_fp")).agg(count(lit(1)).as("df"))
    val stats = docs.agg(
      count(lit(1)).as("n"),
      sum(size(split(rtrim(col("text")), " "))).as("sdl"))
    val q = qTermFps.toDF("query_id", "_fp")

    // per-term score — written as the EXACT expression tree the DuckDB
    // oracle uses (same literals, same associativity), so each term
    // score is the same IEEE double on both engines; the per-doc sum
    // is decimal for partition-order independence
    val scored = tf
      .join(broadcast(dfRel), "_fp")
      .crossJoin(broadcast(stats))
      .join(broadcast(q), "_fp")
      .withColumn("_s",
        (log(lit(1.0) + (col("n") - col("df") + lit(0.5)) / (col("df") + lit(0.5))) *
          (col("tf") * lit(2.2)) /
          (col("tf") + lit(1.2) * (lit(0.25) + lit(0.75) * col("dl") / (col("sdl") / col("n")))))
          .cast("decimal(28,12)"))

    val perDoc = scored
      .groupBy(col("query_id"), col("doc_id"))
      .agg(sum(col("_s")).cast("double").as("score"))

    perDoc
      .groupBy(col("query_id"))
      .agg(GraftFunctions.topKAgg(col("score"), col("doc_id"), k).as("_top"))
      .select(col("query_id"), posexplode(col("_top")).as(Seq("_pos", "_t")))
      .select(col("query_id"), (col("_pos") + 1).as("rank"),
        col("_t.id").as("doc_id"), col("_t.score").as("score"))
      .orderBy(col("query_id"), col("rank"))
  }

  /** Reciprocal Rank Fusion (Cormack et al. 2009) of BM25 with a
    * lexical-overlap ranking — the standard hybrid-retrieval combiner
    * (in production the second arm is usually the vector ANN list;
    * the fusion algebra is identical). Each arm contributes
    * `1/(60+rank)` for its top-`kPool` docs; a doc missing from one
    * arm contributes 0 there. Determinism: the lexical arm ranks on
    * the composite integer `nmatch·2³¹ + Σtf` (exact in a double while
    * Σtf < 2³¹ — raise_error-guarded — so the bounded-heap aggregate
    * reproduces `ORDER BY nmatch DESC,
    * tfsum DESC, doc_id`), fusion terms are single correctly-rounded
    * divisions summed in fixed coalesce order, ranks re-ranked by the
    * same heap. Scale shape: both arms are matched-postings-only
    * aggregates (the corpus text never shuffles); the fusion joins two
    * |queries|·kPool relations — trivially broadcastable.
    */
  def rrfTopK(docs: DataFrame, queries: Seq[(Int, String)], k: Int,
      kPool: Int = 20): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    val (qTermFps, termFps) = termFingerprints(queries)

    // BOTH arms rank the same matched postings, so the corpus is
    // scanned ONCE for them (plus the full-corpus stats aggregate —
    // two scans total, down from three): one combined per-(query,
    // doc) aggregate carries the BM25 decimal score sum AND the
    // lexical counts, and one per-query aggregate holds BOTH
    // bounded heaps — no shared-subtree recompute, nothing persisted.
    // Every component expression is identical to the two-tree form it
    // replaces (same joins, literals, decimal sums, heap semantics),
    // so the fused output is bit-identical.
    val tf = docs
      .select(col("doc_id"), size(split(rtrim(col("text")), " ")).as("dl"),
        explode(GraftFunctions.matchedTermFps(col("text"), termFps)).as("_fp"))
      .groupBy(col("doc_id"), col("_fp"))
      .agg(count(lit(1)).as("tf"), max(col("dl")).as("dl"))
    val dfRel = tf.groupBy(col("_fp")).agg(count(lit(1)).as("df"))
    val stats = docs.agg(
      count(lit(1)).as("n"),
      sum(size(split(rtrim(col("text")), " "))).as("sdl"))
    val q = qTermFps.toDF("query_id", "_fp")

    val perDoc = tf
      .join(broadcast(dfRel), "_fp")
      .crossJoin(broadcast(stats))
      .join(broadcast(q), "_fp")
      .withColumn("_s",
        (log(lit(1.0) + (col("n") - col("df") + lit(0.5)) / (col("df") + lit(0.5))) *
          (col("tf") * lit(2.2)) /
          (col("tf") + lit(1.2) * (lit(0.25) + lit(0.75) * col("dl") / (col("sdl") / col("n")))))
          .cast("decimal(28,12)"))
      .groupBy(col("query_id"), col("doc_id"))
      .agg(sum(col("_s")).cast("double").as("_bm"),
        count(lit(1)).as("nmatch"), sum(col("tf")).as("tfsum"))
      // Composite key reproducing ORDER BY nmatch DESC, tfsum DESC in one
      // double: nmatch·2^31 + tfsum. Exact while tfsum < 2^31 (a doc would
      // need 2B+ matched-term occurrences to break it — guarded below) and
      // nmatch < 2^22 (nmatch ≤ |query terms|, always tiny), keeping the
      // sum inside the 2^53 exact-integer budget of a double.
      .withColumn("_lex",
        when(col("tfsum") >= lit(1L << 31), raise_error(concat(
          lit("rrfTopK: tfsum overflows the composite rank key for doc_id="),
          col("doc_id"))))
          .otherwise((col("nmatch") * lit(1L << 31) + col("tfsum")).cast("double")))

    // one row per QUERY (bounded by the query set, not the corpus) —
    // materialized once so the bm/lex derivations below don't each
    // recompute the corpus prefix: column pruning specializes the
    // aggregate per consumer (one keeps _tb, the other _tl), so the
    // two subtrees are NOT identical and exchange reuse cannot
    // dedupe them; an eager localCheckpoint of the Q-row relation
    // runs the heavy prefix exactly once.
    val tops = perDoc
      .groupBy(col("query_id"))
      .agg(GraftFunctions.topKAgg(col("_bm"), col("doc_id"), kPool).as("_tb"),
        GraftFunctions.topKAgg(col("_lex"), col("doc_id"), kPool).as("_tl"))
      .localCheckpoint()
    val bm = tops
      .select(col("query_id"), posexplode(col("_tb")).as(Seq("_pos", "_t")))
      .select(col("query_id"), col("_t.id").as("doc_id"), (col("_pos") + 1).as("_r1"))
    val lexRanked = tops
      .select(col("query_id"), posexplode(col("_tl")).as(Seq("_pos", "_t")))
      .select(col("query_id"), col("_t.id").as("doc_id"), (col("_pos") + 1).as("_r2"))

    val fused = bm.join(lexRanked, Seq("query_id", "doc_id"), "full_outer")
      .withColumn("rrf",
        coalesce(lit(1.0) / (lit(60) + col("_r1")), lit(0.0)) +
          coalesce(lit(1.0) / (lit(60) + col("_r2")), lit(0.0)))
    fused
      .groupBy(col("query_id"))
      .agg(GraftFunctions.topKAgg(col("rrf"), col("doc_id"), k).as("_top"))
      .select(col("query_id"), posexplode(col("_top")).as(Seq("_pos", "_t")))
      .select(col("query_id"), (col("_pos") + 1).as("rank"),
        col("_t.id").as("doc_id"), round(col("_t.score"), 6).as("rrf_score"))
      .orderBy(col("query_id"), col("rank"))
  }

  /** The oracle's VALUES fragment for a query set: (query_id, term). */
  def oracleValues(queries: Seq[(Int, String)]): String =
    queries.flatMap { case (qid, text) =>
      text.split(" ").distinct.map(t => s"($qid, '$t')")
    }.mkString(", ")
}
