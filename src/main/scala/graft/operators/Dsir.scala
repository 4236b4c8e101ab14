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
  * CONSTANT-size model no matter the corpus — unlike a word-level
  * LM whose vocabulary grows with the data. Shape: the text is
  * scanned twice — once through the fused GramFps kernel into a
  * ≤`buckets`-row map-side-combined histogram (target counts ride the
  * same aggregate as a conditional sum, so ONE pass builds both LMs),
  * then the histogram collects to the driver (bounded by `buckets`,
  * not the corpus) and becomes a scaled-long LUT; the scoring pass is
  * ONE GramLutSum scan emitting a single (doc_id, n_grams, weight)
  * row per document with no gram explode, join, or regroup. The only
  * exchanges anywhere are the ≤`buckets`-row histogram and the
  * per-doc output.
  *
  * Per-gram log-ratio terms are decimal(28,12)-quantized before the
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
    val grams = docs.select(isTarget.as("_t"),
        explode(GraftFunctions.gramFps(text)).as("_h"))
      .withColumn("_b", pmod(col("_h"), lit(buckets.toLong)))
    // one pass builds BOTH LMs: raw count + target-conditional count.
    // The histogram is ≤`buckets` rows BY CONSTRUCTION (the hashing
    // trick), so it collects to the driver at any corpus size — the
    // model becomes a constant-size scaled-long LUT and scoring is
    // pure in-scan arithmetic (GramLutSum), not an explode →
    // broadcast-join → corpus-group hash-aggregate. Each LUT term is
    // BigDecimal.valueOf(term).setScale(12, HALF_UP) — exactly the
    // decimal(28,12) cast of the old per-gram `_term` column — so the
    // exact long sum reproduces the former decimal sum bit-for-bit.
    val cr = new Array[Long](buckets)
    val ct = new Array[Long](buckets)
    grams.groupBy(col("_b")).agg(
      count(lit(1)).as("_cr"),
      sum(when(col("_t"), lit(1L)).otherwise(lit(0L))).as("_ct"))
      .collect().foreach { r =>
        val b = r.getLong(0).toInt
        cr(b) = r.getLong(1)
        ct(b) = r.getLong(2)
      }
    val rawTot = cr.sum
    val tgtTot = ct.sum
    val lut = Array.tabulate(buckets) { b =>
      val term =
        math.log((ct(b) + 1L).toDouble / (tgtTot + buckets.toLong)) -
          math.log((cr(b) + 1L).toDouble / (rawTot + buckets.toLong))
      java.math.BigDecimal.valueOf(term)
        .setScale(12, java.math.RoundingMode.HALF_UP)
        .unscaledValue().longValueExact()
    }
    // null-text docs are dropped, matching the old explode-scoring
    // path (a null text produced zero gram rows, hence no output row);
    // without the filter, nullSafeEval's null result would surface as
    // a (doc_id, null, null) row — a silent output-shape divergence
    docs.filter(text.isNotNull)
      .select(id.as("doc_id"), GraftFunctions.gramLutSum(text, lut).as("_a"))
      .select(col("doc_id"), col("_a.n_grams").as("n_grams"),
        col("_a.dsir_weight").as("dsir_weight"))
  }
}
