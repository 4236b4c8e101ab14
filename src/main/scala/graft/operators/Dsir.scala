package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.GraftFunctions

/** DSIR — Data Selection via Importance Resampling (Xie et al. 2023,
  * arXiv:2302.03169): score every document by how much more likely its
  * hashed-n-gram features are under a TARGET-domain bag-of-grams LM
  * than under the raw-corpus LM. The weight `log p_tgt(x) −
  * log p_raw(x)` is the paper's importance weight; resampling by it is
  * the selection step (compose with the existing sampling/budget
  * operators — scoring and selection are deliberately separate ops,
  * as in the paper).
  *
  * The hashing trick is what makes this 100 TB-safe: both LMs live in
  * `buckets` (default 4096) hashed bins, so the model relation is a
  * CONSTANT-size broadcast no matter the corpus — unlike a word-level
  * LM whose vocabulary grows with the data. Shape: the gram stream
  * (unigrams + bigrams, fnv1a64 → pmod bucket) is scanned twice, like
  * [[TextAnalysis.surprisal]] — once into a ≤`buckets`-row map-side-
  * combined histogram (target counts ride the same aggregate as a
  * conditional sum, so ONE pass builds both LMs), once joined back
  * against the broadcast histogram for per-doc scoring. No
  * corpus-sized relation is ever persisted or shuffled; the per-doc
  * aggregate's exchange carries one row per document.
  *
  * Per-gram log-ratio terms are cast to exact decimal before the
  * per-doc sum (the surprisal convention) so the result is
  * independent of partial-aggregation order; the Laplace-smoothed
  * probabilities make every bucket finite. Mirrored bit-for-bit by
  * tools/make_expected.py gen_dsir_importance.
  */
object Dsir {

  /** Per-doc importance weights: (doc_id, n_grams, dsir_weight).
    * `isTarget` flags the rows whose grams define the target domain.
    */
  def importanceWeights(docs: DataFrame, id: Column, text: Column,
      isTarget: Column, buckets: Int = 4096): DataFrame = {
    // fused GramFps kernel: one text scan emits every unigram and
    // bigram fingerprint — the composed split/arrays_zip/concat form
    // scanned the text twice per pass and allocated a struct + a
    // concatenated string per bigram (its tokenization,
    // split(rtrim(text), " "), is what the kernel mirrors —
    // ScalaCheck-pinned in KernelPropertiesSpec)
    val grams = docs.select(id.as("doc_id"), isTarget.as("_t"),
        explode(GraftFunctions.gramFps(text)).as("_h"))
      .withColumn("_b", pmod(col("_h"), lit(buckets.toLong)))
    // one pass builds BOTH LMs: raw count + target-conditional count
    // ≤`buckets` rows — persisting it means the corpus-sized gram
    // stream is scanned exactly twice (histogram, scoring), not three
    // times (the totals aggregate below reuses the cached histogram)
    val hist = grams.groupBy(col("_b")).agg(
      count(lit(1)).as("_cr"),
      sum(when(col("_t"), lit(1L)).otherwise(lit(0L))).as("_ct"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val totals = hist.agg(sum(col("_cr")).as("_rawTot"), sum(col("_ct")).as("_tgtTot"))
    grams
      .join(broadcast(hist), "_b")
      .crossJoin(broadcast(totals))
      .withColumn("_term",
        (log((col("_ct") + lit(1L)).cast("double") / (col("_tgtTot") + lit(buckets.toLong)))
          - log((col("_cr") + lit(1L)).cast("double") / (col("_rawTot") + lit(buckets.toLong))))
          .cast("decimal(28,12)"))
      .groupBy(col("doc_id"))
      .agg(
        count(lit(1)).as("n_grams"),
        round(sum(col("_term")).cast("double"), 4).as("dsir_weight"))
  }
}
