package graft.operators

import graft.functions.GraftFunctions
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Benchmark-contamination detection for LLM-data pipelines
  * (SURVEY.md §2D): flag training documents that share word n-grams
  * with an evaluation/benchmark set — the standard decontamination
  * pass before pre-training (n-gram overlap against held-out evals).
  */
object Contamination {

  /** Training docs sharing ≥1 word-`k`-gram with any eval doc
    * (`evalPred` selects the eval side, typically a hash split), with
    * the count of distinct shared n-grams per doc.
    *
    * 100 TB shape: the eval side is small by definition, so its
    * distinct n-gram fingerprints are collected into a broadcast
    * relation; the corpus side then streams through a map-side
    * broadcast join — the corpus is never shuffled, and the only
    * exchange is the per-doc count aggregate over matched (doc_id,
    * fingerprint) rows, which is proportional to the contamination
    * overlap, not the corpus. N-grams travel as 64-bit FNV-1a
    * fingerprints (8-byte keys, ~2^-64 collision odds per gram pair —
    * the standard fingerprinting trade).
    */
  def evalOverlap(docs: DataFrame, evalPred: Column, k: Int = 5): DataFrame = {
    // single tagged scan — the corpus is read once, not once per side
    // (the two-relation overlapAgainst form exists for streams, where
    // the sides genuinely are different relations)
    val grams = docs
      .select(col("doc_id"), evalPred.as("_is_eval"),
        explode(GraftFunctions.shingles(col("text"), k)).as("_g"))
      .select(col("doc_id"), col("_is_eval"),
        GraftFunctions.fnv1a64(col("_g")).as("_h"))
    val evalGrams = grams.filter(col("_is_eval")).select(col("_h")).distinct()
    grams.filter(!col("_is_eval"))
      .join(broadcast(evalGrams), "_h")
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_shared_ngrams"))
  }

  /** The two-relation form: training docs (possibly a STREAM — every
    * stage on the train side is stateless until the final per-doc
    * count) against a static eval/benchmark corpus. Used by
    * [[graft.streaming.StreamingCuration]]'s ingest-time
    * decontamination; semantics identical to [[evalOverlap]] when the
    * two relations partition one corpus.
    */
  def overlapAgainst(train: DataFrame, evalDocs: DataFrame, k: Int = 5): DataFrame =
    overlapAgainstGrams(train, evalGramRelation(evalDocs, k), k)

  /** The distinct eval-gram fingerprint relation — exposed so the
    * streaming gate can materialize it ONCE per drain (a stream-static
    * broadcast join otherwise re-derives it every micro-batch).
    */
  private[graft] def evalGramRelation(evalDocs: DataFrame, k: Int): DataFrame =
    gramHashes(evalDocs, k).select(col("_h")).distinct()

  private[graft] def overlapAgainstGrams(train: DataFrame, evalGrams: DataFrame,
      k: Int): DataFrame =
    gramHashes(train, k)
      .join(broadcast(evalGrams), "_h")
      .groupBy(col("doc_id"))
      // shingles() is distinct per doc, so this counts distinct grams
      .agg(count(lit(1)).as("n_shared_ngrams"))

  /** (doc_id, _h): the doc's distinct word-k-gram 64-bit fingerprints. */
  private def gramHashes(docs: DataFrame, k: Int): DataFrame =
    docs
      .select(col("doc_id"), explode(GraftFunctions.shingles(col("text"), k)).as("_g"))
      .select(col("doc_id"), GraftFunctions.fnv1a64(col("_g")).as("_h"))

  /** Bloom-filter decontamination — the scale path when even the eval
    * set's DISTINCT n-gram relation is too big to broadcast exactly
    * (a full benchmark suite can be 10^8+ grams; the exact relation is
    * ~GBs, a bloom of it is `m/8` bytes regardless). One-sided error:
    * every truly-shared gram hits (no false negatives), a false
    * positive rate of ~(1-e^(-kn/m))^k marks extra grams — for a
    * REMOVAL gate that is the safe direction. Deterministic double
    * hashing (Kirsch-Mitzenmacher over splitmix64) makes even the
    * false positives reproducible, so the op is fixture-oracle-able.
    *
    * Build shape: eval gram fps → k positions each (codegen kernel) →
    * `bit_or` aggregate over m/64 PACKED WORDS — the exchange carries
    * at most m/64 = 2048 rows, and the driver materializes a 16 KB
    * long[] that probes ride as a codegen reference object. The
    * corpus side is a shuffle-free scan: per-doc hit counting happens
    * INSIDE the scan projection (one kernel call per doc), so unlike
    * [[evalOverlap]] there is no per-gram join at all — nothing
    * corpus-sized ever leaves the scan stage.
    */
  def bloomOverlap(docs: DataFrame, evalPred: Column, k: Int = 5,
      m: Int = 1 << 17, numHashes: Int = 4): DataFrame = {
    require((m & (m - 1)) == 0, "bloom size must be a power of two")
    val spark = docs.sparkSession
    val words = docs
      .filter(evalPred)
      .select(explode(GraftFunctions.shingles(col("text"), k)).as("_g"))
      .select(explode(GraftFunctions.bloomPositions(
        GraftFunctions.fnv1a64(col("_g")), numHashes, m)).as("_pos"))
      .select(shiftright(col("_pos"), 6).as("_w"),
        expr("shiftleft(1L, cast(_pos % 64 as int))").as("_bit"))
      .groupBy(col("_w")).agg(bit_or(col("_bit")).as("_word"))
      .collect()
    val packed = new Array[Long](m / 64)
    words.foreach(r => packed(r.getLong(0).toInt) = r.getLong(1))
    docs
      .filter(!evalPred)
      .select(col("doc_id"),
        GraftFunctions.bloomCountHits(
          transformShingleFps(col("text"), k), packed, numHashes, m).as("n_bloom_hits"))
      .filter(col("n_bloom_hits") > 0)
  }

  /** Distinct shingle fps as one array per doc — the probe kernel
    * takes the whole array, so the doc row never fans out. Fused
    * ShingleFps kernel: same fp multiset (hit counts unchanged), no
    * per-shingle string allocation.
    */
  private def transformShingleFps(text: Column, k: Int): Column =
    GraftFunctions.shingleFps(text, k)
}
