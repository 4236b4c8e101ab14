package graft.queries

import graft.Tables
import graft.functions.GraftFunctions
import graft.operators.{Audio, Bm25, Bpe, Contamination, Graph, Pca, Dedup, Drift, Dsir, Multimodal, Pq, QualityClassifier, Sampling, Opq, SemanticDedup, Similarity, Snapshot, Sq8, TextAnalysis, Video}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** LLM-data-pipeline operators bound to the driver contract
  * (SURVEY.md §2D). Oracle SQL provided wherever the semantics are
  * ANSI-expressible; locality-sensitive ops (minhash/simhash/LSH) are
  * rows-only by design and covered by property specs instead.
  */
object LlmOps {

  type Q = (SparkSession, String) => DataFrame

  private def docs(spark: SparkSession, dir: String): DataFrame = {
    GraftFunctions.register(spark)
    Tables(spark, dir, "documents")
  }

  /** [[docs]] spread across the session's cores when the scan has
    * fewer splits (Multimodal.spreadRows, guide §8) — for queries whose
    * dominant cost is a heavy per-row kernel (langid/quality scoring,
    * redaction, BPE encode): a single-row-group gate fixture otherwise
    * serializes the kernel onto one task. Self-disables at real split
    * counts; results are row-identical (per-row ops + final orderBy).
    */
  private def docsSpread(spark: SparkSession, dir: String): DataFrame =
    Multimodal.spreadRows(docs(spark, dir))

  def text_token_count(spark: SparkSession, dir: String): DataFrame =
    TextAnalysis.withTokenCounts(docs(spark, dir), col("text"))
      .select(col("doc_id"), col("n_ws_tokens"), col("n_bpe_tokens"))
      .orderBy(col("doc_id"))

  def text_quality(spark: SparkSession, dir: String): DataFrame =
    TextAnalysis.withQuality(docs(spark, dir), col("text"))
      .select(col("doc_id"), col("n_chars"), col("n_words"),
        round(col("mean_word_len"), 4).as("mean_word_len"),
        round(col("punct_ratio"), 4).as("punct_ratio"),
        round(col("stop_ratio"), 4).as("stop_ratio"),
        round(col("distinct_ratio"), 4).as("distinct_ratio"),
        col("quality_score"))
      .orderBy(col("doc_id"))

  def text_langid(spark: SparkSession, dir: String): DataFrame =
    TextAnalysis.withLangId(docsSpread(spark, dir), col("text"))
      .select(col("doc_id"), col("lang"), col("pred_lang"), col("lang_score"))
      .orderBy(col("doc_id"))

  def text_redact(spark: SparkSession, dir: String): DataFrame =
    TextAnalysis.withRedaction(docsSpread(spark, dir), col("text"))
      .select(col("doc_id"), md5(col("redacted")).as("redacted_md5"),
        col("n_email"), col("n_url"), col("n_ipv4"), col("n_phone"))
      .orderBy(col("doc_id"))

  /** Code-point Shannon entropy per doc (nats) — the machine-noise /
    * binary-junk detector of the quality battery; shuffle-free scan,
    * one codegen kernel call per doc. Mirrored by make_expected
    * gen_text_entropy.
    */
  def text_entropy(spark: SparkSession, dir: String): DataFrame =
    docs(spark, dir).select(col("doc_id"),
      round(graft.functions.GraftFunctions.charEntropy(col("text")), 4)
        .as("char_entropy_nats"))
      .orderBy(col("doc_id"))

  def text_fingerprint(spark: SparkSession, dir: String): DataFrame =
    TextAnalysis.withFingerprint(docs(spark, dir), col("text"))
      .select(col("doc_id"), col("fp_exact"), col("fp_min"), col("fp_max"), col("fp_sim"))
      .orderBy(col("doc_id"))

  def text_surprisal(spark: SparkSession, dir: String): DataFrame =
    TextAnalysis.surprisal(docs(spark, dir), col("doc_id"), col("text"))
      .orderBy(col("doc_id"))

  /** Per-source chi-squared drift of the language mix vs the corpus
    * marginal — the categorical companion of stats_ks_drift.
    */
  def stats_chi2_drift(spark: SparkSession, dir: String): DataFrame =
    Drift.chi2PerGroup(docs(spark, dir), col("source"), col("lang"))
      .orderBy(col("grp"))
      .withColumnRenamed("grp", "source")

  /** ANALYZE-style per-column profile of the documents table: row /
    * null / distinct counts and min–max per column — the data-quality
    * report every ingest publishes and every optimizer wants. One
    * aggregate PER COLUMN deliberately: each scan prunes to a single
    * column (a fused multi-distinct agg would Expand every row ×4
    * instead), the per-column jobs run independently, and min/max
    * surface as strings so the report schema is uniform. At 100 TB →
    * swap count(distinct) for approx_count_distinct, same shape.
    */
  def stats_profile(spark: SparkSession, dir: String): DataFrame = {
    val d = docs(spark, dir)
    def prof(c: String) = d
      .agg(count(lit(1)).as("n_rows"),
        sum(when(col(c).isNull, 1L).otherwise(0L)).as("n_null"),
        countDistinct(col(c)).as("n_distinct"),
        min(col(c)).cast("string").as("min_value"),
        max(col(c)).cast("string").as("max_value"))
      .select(lit(c).as("col_name"), col("n_rows"), col("n_null"),
        col("n_distinct"), col("min_value"), col("max_value"))
    prof("doc_id").unionByName(prof("lang")).unionByName(prof("source"))
      .unionByName(prof("n_chars"))
      .orderBy(col("col_name"))
  }

  /** Per-source PSI of the banded document-length histogram vs the
    * corpus marginal (10 bands of 100 chars, capped) — the third drift
    * gate beside KS (continuous) and χ² (categorical).
    */
  def stats_psi_drift(spark: SparkSession, dir: String): DataFrame =
    Drift.psiPerGroup(docs(spark, dir), col("source"),
      least(lit(9L), expr("n_chars div 100")))
      .withColumnRenamed("grp", "source")
      .orderBy(col("source"))

  def text_boilerplate(spark: SparkSession, dir: String): DataFrame =
    TextAnalysis.boilerplateSpans(docs(spark, dir), col("doc_id"), col("text"))

  def text_kn_surprisal(spark: SparkSession, dir: String): DataFrame =
    TextAnalysis.knSurprisal(docs(spark, dir), col("doc_id"), col("text"))
      .orderBy(col("doc_id"))

  def text_bigram_surprisal(spark: SparkSession, dir: String): DataFrame =
    TextAnalysis.bigramSurprisal(docs(spark, dir), col("doc_id"), col("text"))
      .orderBy(col("doc_id"))

  /** CCNet-style perplexity bucketing: per-language surprisal
    * tertiles — head (lowest mean surprisal / most fluent), middle,
    * tail. The standard quality partition of a web corpus; downstream
    * mixes sample by bucket. One window over the per-doc surprisal
    * relation (doc_id tie-break keeps ntile deterministic).
    */
  def text_ccnet_bucket(spark: SparkSession, dir: String): DataFrame = {
    val d = docs(spark, dir)
    val s = TextAnalysis.surprisal(d, col("doc_id"), col("text"))
      .join(d.select(col("doc_id"), col("lang")), "doc_id")
    val w = Window.partitionBy(col("lang"))
      .orderBy(col("mean_surprisal"), col("doc_id"))
    s.withColumn("_t", ntile(3).over(w))
      .withColumn("ccnet_bucket",
        when(col("_t") === 1, "head").when(col("_t") === 2, "middle").otherwise("tail"))
      .select(col("doc_id"), col("lang"), col("mean_surprisal"), col("ccnet_bucket"))
      .orderBy(col("doc_id"))
  }

  def text_repetition(spark: SparkSession, dir: String): DataFrame =
    TextAnalysis.repetition(docs(spark, dir), col("doc_id"), col("text"))
      .orderBy(col("doc_id"))

  /** Top-5 TF-IDF keywords per doc (fingerprint-keyed histograms,
    * bounded-heap top-k, vocab fetch-join — see TextAnalysis).
    */
  def text_tfidf(spark: SparkSession, dir: String): DataFrame =
    TextAnalysis.tfidfKeywords(docs(spark, dir), col("doc_id"), col("text"))
      .orderBy(col("doc_id"), col("rank"))

  def text_gopher(spark: SparkSession, dir: String): DataFrame =
    TextAnalysis.withGopherRules(docsSpread(spark, dir), col("text"))
      .select(col("doc_id"), col("n_words"), col("mean_word_len"),
        col("alpha_word_frac"), col("n_stopwords"), col("symbol_word_ratio"),
        col("pass_word_count"), col("pass_mean_word_len"), col("pass_alpha_frac"),
        col("pass_stopwords"), col("pass_symbol_ratio"), col("gopher_pass"))
      .orderBy(col("doc_id"))

  def corpus_stats(spark: SparkSession, dir: String): DataFrame =
    TextAnalysis.corpusStats(docs(spark, dir),
      col("lang"), col("source"), col("text"))
      .orderBy(col("lang"), col("source"))

  /** Per-source document-length drift vs the whole corpus: the exact
    * two-sample KS statistic (see operators/Drift.scala for the
    * histogram-bounded shape). The admission gate a pipeline runs
    * before folding a new crawl snapshot into the mix.
    */
  def stats_ks_drift(spark: SparkSession, dir: String): DataFrame =
    Drift.ksPerGroup(docs(spark, dir), col("source"), col("n_chars"))
      .withColumnRenamed("grp", "source")
      .orderBy(col("source"))

  def data_shuffle(spark: SparkSession, dir: String): DataFrame =
    Sampling.shardShuffle(docs(spark, dir), col("doc_id"))
      .select(col("doc_id"), col("shard"), col("shard_pos"))
      .orderBy(col("doc_id"))

  /** Duplicated-span (ExactSubstr-style) signal; w=5 so the small
    * driver corpora (docs ~20-60 words, near-dup families planted at
    * whole-doc granularity) actually produce cross-doc shared spans.
    */
  def dedup_span_exact(spark: SparkSession, dir: String): DataFrame =
    Dedup.duplicatedSpans(docs(spark, dir), col("doc_id"), col("text"), w = 5)
      .orderBy(col("doc_id"))

  /** The ExactSubstr removal pass: rewrite docs dropping words covered
    * by any corpus-duplicated 5-word window (cleaned text as md5).
    */
  def dedup_span_removal(spark: SparkSession, dir: String): DataFrame =
    Dedup.removeDuplicatedSpans(docs(spark, dir), col("doc_id"), col("text"), w = 5)
      .orderBy(col("doc_id"))

  /** Canonical normalization (lowercase, punct strip, whitespace
    * collapse) — emitted as lengths + md5 so the oracle hash-checks
    * the full normalized string without shipping it.
    */
  def text_normalize(spark: SparkSession, dir: String): DataFrame =
    TextAnalysis.withNormalized(docs(spark, dir), col("text"))
      .select(col("doc_id"), length(col("text")).as("n_chars_raw"),
        length(col("normalized")).as("n_chars_norm"),
        md5(col("normalized")).as("norm_md5"))
      .orderBy(col("doc_id"))

  /** Char-granularity ExactSubstr removal (L=20 chars): the
    * suffix-array answer via duplicated fixed-L rolling-hash windows +
    * single-pass interval-merge rebuild.
    */
  def dedup_span_chars(spark: SparkSession, dir: String): DataFrame =
    Dedup.removeDuplicatedCharSpans(docs(spark, dir), col("doc_id"), col("text"), L = 20)
      .orderBy(col("doc_id"))

  /** Decontamination: docs sharing any word-5-gram with the "eval set"
    * (the top-2% hash split — a stand-in for a benchmark suite).
    */
  def contamination_check(spark: SparkSession, dir: String): DataFrame =
    Contamination.evalOverlap(docs(spark, dir),
      Sampling.bucket(col("doc_id"), 100) >= 98, k = 5)
      .orderBy(col("doc_id"))

  /** Ingest-time (streaming) decontamination: the same overlap op over
    * a 3-micro-batch document stream; the drained stream must equal
    * batch `contamination_check` (same hard oracle).
    */
  def contamination_stream(spark: SparkSession, dir: String): DataFrame =
    graft.streaming.StreamingCuration.runDecontamination(spark, docs(spark, dir),
      Sampling.bucket(col("doc_id"), 100) >= 98, k = 5)
      .orderBy(col("doc_id"))

  /** Trained logistic quality classifier
    * (QualityClassifier.train/score): hashed binary unigram features,
    * Adagrad on the exact-decimal grid; the gated label is "long
    * document" (n_chars ≥ 300) — learnable but not identical to any
    * single feature (char/word ratios vary per doc). Mirrored
    * bit-for-bit by make_expected gen_quality_classifier.
    */
  def quality_classifier(spark: SparkSession, dir: String): DataFrame = {
    val d = docs(spark, dir)
    val label = col("n_chars") >= 300
    val w = QualityClassifier.train(d, col("doc_id"), col("text"), label)
    QualityClassifier.score(d, col("doc_id"), col("text"), label, w)
      .orderBy(col("doc_id"))
  }

  /** Directional containment dedup (Dedup.containment): asymmetric
    * prefix-filter blocking (recall exact by pigeonhole for any
    * prefix order) + codegen linear-merge containment verify. Hard
    * DuckDB all-ordered-pairs oracle.
    */
  def dedup_containment(spark: SparkSession, dir: String): DataFrame =
    Dedup.containment(docs(spark, dir), k = 3, threshold = 0.9)
      .orderBy(col("doc_src"), col("doc_dst"))

  /** Bloom-filter decontamination (Contamination.bloomOverlap): the
    * constant-size-sketch scale path of contamination_check — same
    * eval split, hits counted against a 2^17-bit bloom of the eval
    * grams (no false negatives; deterministic false positives).
    * Mirrored by make_expected gen_contamination_bloom.
    */
  def contamination_bloom(spark: SparkSession, dir: String): DataFrame =
    Contamination.bloomOverlap(docs(spark, dir),
      Sampling.bucket(col("doc_id"), 100) >= 98, k = 5)
      .orderBy(col("doc_id"))

  /** Token-budget selection: the 20k best-quality tokens (exact prefix
    * of the (quality desc, doc_id) order — Sampling.budgetSelect's
    * two-phase bucketed cumsum, no global sort).
    */
  def data_budget_select(spark: SparkSession, dir: String): DataFrame = {
    val q = TextAnalysis.withQuality(docs(spark, dir), col("text"))
    Sampling.budgetSelect(q, col("doc_id"), col("quality_score"),
      size(split(col("text"), " ")), budget = 20000L)
      .orderBy(col("doc_id"))
  }

  /** Per-language dynamic quality flooring: drop every doc below its
    * language's p10 quality — thresholds DERIVED from the corpus, not
    * hardcoded (the way production curation picks filter knobs). The
    * per-lang percentile is one tiny aggregate broadcast back against
    * the scan; the corpus itself is never shuffled.
    */
  /** Keep rows at/above their language's p10 quality — the shared
    * floor of quality_floor and pipeline_curate (one definition, one
    * place to change the percentile/rounding).
    */
  private def floorByLang(q: DataFrame): DataFrame = {
    val thresholds = q.groupBy(col("lang"))
      .agg(round(expr("percentile(quality_score, 0.1D)"), 4).as("p10_quality"))
    q.join(broadcast(thresholds), "lang")
      .filter(col("quality_score") >= col("p10_quality"))
  }

  def quality_floor(spark: SparkSession, dir: String): DataFrame =
    floorByLang(TextAnalysis.withQuality(docsSpread(spark, dir), col("text"))
      .select(col("doc_id"), col("lang"), col("quality_score")))
      .select(col("doc_id"), col("lang"), col("quality_score"), col("p10_quality"))
      .orderBy(col("doc_id"))

  /** Capstone curation chain — normalize → per-lang p10 quality floor
    * → 15k-token budget select, composed as ONE Catalyst plan over the
    * verified pieces: token counts come from the NORMALIZED text, the
    * floor thresholds and budget prefix reuse quality_floor's and
    * data_budget_select's exact shapes. What a production corpus prep
    * actually runs; the oracle chains the same three verified stages.
    */
  def pipeline_curate(spark: SparkSession, dir: String): DataFrame = {
    val normed = TextAnalysis.withNormalized(docsSpread(spark, dir), col("text"))
    val q = TextAnalysis.withQuality(normed, col("text"))
      .select(col("doc_id"), col("lang"), col("quality_score"),
        size(split(col("normalized"), " ")).as("_ntok"))
    Sampling.budgetSelect(floorByLang(q), col("doc_id"), col("quality_score"),
      col("_ntok"), budget = 15000L)
      .orderBy(col("doc_id"))
  }

  def data_pack(spark: SparkSession, dir: String): DataFrame =
    Sampling.pack(docs(spark, dir), col("doc_id"),
      size(split(col("text"), "\\s+")))
      .select(col("doc_id"), col("pack_bucket"), col("pack_bin"), col("pack_offset"))
      .orderBy(col("doc_id"))

  /** Training-mix resampling: upweight two sources 2.5x, hold two at
    * 1x, downsample the long tail to 0.4x — every copy assignment a
    * pure function of (doc_id, epoch).
    */
  def data_mix(spark: SparkSession, dir: String): DataFrame = {
    val rate = when(col("source").isin("src0", "src1"), 2.5)
      .when(col("source").isin("src2", "src3"), 1.0)
      .otherwise(0.4)
    Sampling.mixture(docs(spark, dir), col("doc_id"), rate)
      .select(col("doc_id"), col("source"), col("epoch"))
      .orderBy(col("doc_id"), col("epoch"))
  }

  /** Temperature-flattened language mixture (the mT5/UniMax family):
    * sampling weight w_l = n_l^τ with τ=1/2, per-doc rate
    * r_l = N·(w_l/Σw)/n_l — rare languages upsample (r>1), dominant
    * ones downsample (r<1), expected corpus size preserved. τ=1/2
    * deliberately: sqrt IS correctly rounded in IEEE754 (pow(x,0.7)
    * is not), so both engines compute bit-identical weights; the
    * weight sum runs in decimal (order-independent), rates round at 6,
    * and the copy assignment is [[Sampling.mixture]]'s pure
    * function-of-(id,epoch) md5 gate. Scale shape: the rate relation
    * is |languages| rows, broadcast onto a shuffle-free corpus scan.
    */
  def data_temperature(spark: SparkSession, dir: String): DataFrame = {
    val d = docs(spark, dir)
    val c = d.groupBy(col("lang")).agg(count(lit(1)).as("nl"))
    val w = c.withColumn("wl",
      sqrt(col("nl").cast("double")).cast("decimal(28,12)"))
    val s = w.agg(sum(col("wl")).cast("double").as("sw"),
      sum(col("nl")).as("n"))
    val r = w.crossJoin(broadcast(s))
      .withColumn("rate", round(
        col("n").cast("double") * (col("wl").cast("double") / col("sw"))
          / col("nl").cast("double"), 6))
      .select(col("lang"), col("rate"))
    Sampling.mixture(d.join(broadcast(r), "lang"), col("doc_id"), col("rate"))
      .select(col("doc_id"), col("lang"), col("rate"), col("epoch"))
      .orderBy(col("doc_id"), col("epoch"))
  }

  /** The SpaceSaving heavy-hitter sketch run AS a stream: the
    * mergeable TypedImperativeAggregate is exactly what Structured
    * Streaming needs from an aggregate (partial sketches merge across
    * micro-batches in the state store), so the batch operator
    * composes with readStream unchanged. Capacity 256 ≫ the corpus
    * vocabulary, so the drained sketch is EXACT and the batch
    * oracle gates it verbatim. At scale: state = one 256-entry sketch
    * (a few KB) regardless of stream length — the entire point of the
    * sketch family.
    */
  def text_heavy_hitters_stream(spark: SparkSession, dir: String): DataFrame = {
    GraftFunctions.register(spark)
    graft.streaming.StreamingSketch.runHeavyHitters(spark, docs(spark, dir))
      .orderBy(col("cnt").desc, col("word"))
  }

  /** Ingest-time exact dedup: per-text-hash changelog state converges
    * to the batch [[dedup_exact]] relation under any arrival order
    * (see StreamingSketch.runExactDedup); drained ≡ batch, same
    * oracle.
    */
  def dedup_exact_stream(spark: SparkSession, dir: String): DataFrame =
    graft.streaming.StreamingSketch.runExactDedup(spark, docs(spark, dir))
      .orderBy(col("keep_id"))

  def data_split(spark: SparkSession, dir: String): DataFrame =
    Sampling.split(docs(spark, dir), col("doc_id"))
      .select(col("doc_id"), col("split"))
      .orderBy(col("doc_id"))

  def sample_stratified(spark: SparkSession, dir: String): DataFrame =
    Sampling.stratified(docs(spark, dir), col("doc_id"), col("lang"), 0.2)
      .select(col("lang"), col("doc_id"))
      .orderBy(col("lang"), col("doc_id"))

  def dedup_exact(spark: SparkSession, dir: String): DataFrame =
    Dedup.exact(docs(spark, dir), col("doc_id"), col("text"))
      .orderBy(col("keep_id"))

  def dedup_minhash_lsh(spark: SparkSession, dir: String): DataFrame =
    Dedup.minhashLsh(docs(spark, dir)).orderBy(col("doc_a"), col("doc_b"))

  def dedup_simhash(spark: SparkSession, dir: String): DataFrame =
    Dedup.simhash(docs(spark, dir)).orderBy(col("doc_a"), col("doc_b"))

  def dedup_ngram_jaccard(spark: SparkSession, dir: String): DataFrame =
    Dedup.ngramJaccard(docs(spark, dir)).orderBy(col("doc_a"), col("doc_b"))

  /** LSH banding tuning report: the 16×4 S-curve (per-band hit
    * probability J⁴, detection 1−(1−J⁴)¹⁶ — integer powers as explicit
    * multiplication chains, so both engines produce bit-identical
    * doubles) joined with the corpus's OBSERVED exact pair mass per
    * 0.05 Jaccard bucket (the recall-1 AllPairs operator at τ=0.5).
    * This is the table you read before picking (b, r): where your
    * corpus's near-dup mass sits on the detection curve. Scale shape:
    * the curve is 10 literal rows; the observed mass runs the
    * prefix-filtered AllPairs relation on a DETERMINISTIC 20% md5
    * sample of docs — a τ=0.5 sweep over a full dup-dense corpus is a
    * pair explosion (measured: 3.5 GB spill at the 50 k derived
    * corpus), and a distribution estimate is exactly what sampling is
    * for; the gate stays exact because both engines compute on the
    * same sample.
    */
  def dedup_lsh_tuning(spark: SparkSession, dir: String): DataFrame = {
    val spark2 = spark
    import spark2.implicits._
    val curve = Seq(0.50, 0.55, 0.60, 0.65, 0.70, 0.75, 0.80, 0.85, 0.90, 0.95)
      .toDF("j_lo")
      .withColumn("_pb", col("j_lo") * col("j_lo") * col("j_lo") * col("j_lo"))
      .withColumn("_y", lit(1.0) - col("_pb"))
      .withColumn("_y2", col("_y") * col("_y"))
      .withColumn("_y4", col("_y2") * col("_y2"))
      .withColumn("_y8", col("_y4") * col("_y4"))
      .select(col("j_lo"), round(col("_pb"), 6).as("p_band"),
        round(lit(1.0) - col("_y8") * col("_y8"), 6).as("p_detect_16x4"))
    // FAMILY-COHERENT 20% sample: bucket on the doc's MIN shingle-md5,
    // which near-dups share (the minhash-blocking idea reused for
    // sampling) — pairs are retained at ~the doc rate instead of the
    // doc-rate SQUARED that independent doc sampling would give
    val sampled = docs(spark, dir)
      .withColumn("_sh", GraftFunctions.shingles(col("text"), 3))
      .withColumn("_b", pmod(conv(substring(
        array_min(transform(col("_sh"), x => md5(x))), 1, 8), 16, 10).cast("long"),
        lit(10)))
      .filter(col("_b") < 2)
      .drop("_sh", "_b")
    val observed = Dedup.ngramJaccard(sampled, threshold = 0.5)
      // top bucket is ">= 0.95": exact dups (J = 1.0) land there too
      .select(least(floor(col("jaccard") * 20) / 20, lit(0.95)).as("j_lo"))
      .groupBy(col("j_lo")).agg(count(lit(1)).as("n_pairs"))
    curve.join(observed, Seq("j_lo"), "left")
      .na.fill(0L, Seq("n_pairs"))
      .orderBy(col("j_lo"))
  }

  /** End-to-end dedup: minhash-LSH pairs resolved into connected
    * components, keeping the min doc per family — the kept corpus.
    */
  def dedup_resolve(spark: SparkSession, dir: String): DataFrame = {
    val d = docs(spark, dir)
    Dedup.resolveComponents(d, Dedup.minhashLsh(d)).orderBy(col("doc_id"))
  }

  /** The duplicate-family map over the minhash-LSH pair graph:
    * (doc_id, family_id) for every component member — the relation a
    * pipeline joins to apply its own survivor policy.
    */
  /** Soft-dedup training weights: every doc keeps weight
    * 1/|near-dup family| (singletons weigh 1.0) — the "reweight
    * instead of drop" dedup policy; composes the verified family map
    * with two broadcast-sized joins, the raw 1.0/size division is
    * bit-identical cross-engine so no rounding is needed.
    */
  def dedup_weights(spark: SparkSession, dir: String): DataFrame = {
    val d = docs(spark, dir)
    val fam = Dedup.componentMap(Dedup.minhashLsh(d))
    val sizes = fam.groupBy(col("family_id")).agg(count(lit(1)).as("_fs"))
    d.select(col("doc_id"))
      .join(fam, Seq("doc_id"), "left")
      .join(sizes, Seq("family_id"), "left")
      .select(col("doc_id"),
        coalesce(col("family_id"), col("doc_id")).as("family_id"),
        coalesce(col("_fs"), lit(1L)).as("family_size"),
        (lit(1.0) / coalesce(col("_fs"), lit(1L))).as("train_weight"))
      .orderBy(col("doc_id"))
  }

  def dedup_families(spark: SparkSession, dir: String): DataFrame =
    Dedup.componentMap(Dedup.minhashLsh(docs(spark, dir)))
      .orderBy(col("doc_id"))

  /** Quality-weighted survivor selection: per near-dup family, keep the
    * member with the highest quality score (ties → smallest doc id) —
    * the production resolve policy (componentMap's scaladoc contract)
    * instead of keep-min-id.
    */
  def dedup_keep_best(spark: SparkSession, dir: String): DataFrame = {
    val d = docs(spark, dir)
    val fams = Dedup.componentMap(Dedup.minhashLsh(d))
    val q = TextAnalysis.withQuality(d, col("text"))
      .select(col("doc_id"), col("quality_score"))
    fams.join(q, "doc_id")
      .groupBy(col("family_id"))
      .agg(count(lit(1)).as("n_members"),
        expr("max_by(doc_id, named_struct('q', quality_score, 'i', -doc_id))").as("kept_doc"),
        max(col("quality_score")).as("best_quality"))
      .orderBy(col("family_id"))
  }

  /** Cross-corpus dedup: a 10% hash-split "incoming batch" against the
    * remaining 90% "training corpus" — cross-side LSH candidates only,
    * exact-Jaccard verified (Dedup.crossCorpusPairs).
    */
  def dedup_cross_corpus(spark: SparkSession, dir: String): DataFrame = {
    val d = docs(spark, dir)
    val isNew = Sampling.bucket(col("doc_id"), 100) >= 90
    Dedup.crossCorpusPairs(d.filter(!isNew), d.filter(isNew))
      .orderBy(col("corpus_doc"), col("new_doc"))
  }

  /** Incremental crawl reconciliation (Snapshot.delta): the documents
    * table plays two snapshot roles — "old" drops doc_id % 17 == 3,
    * "new" drops doc_id % 19 == 5 and revises the text of
    * doc_id % 13 == 2 — and every doc is classified added /
    * added_near_dup / removed / changed / unchanged, with added docs
    * near-dup-probed against the retained corpus only (delta-cost
    * ingest). Mirrored by a direct DuckDB oracle (exact all-pairs
    * Jaccard ground truth for the near-dup arm, same convention as
    * dedup_cross_corpus).
    */
  def corpus_delta(spark: SparkSession, dir: String): DataFrame = {
    val d = docs(spark, dir)
    val oldSnap = d.filter(pmod(col("doc_id"), lit(17)) =!= 3)
      .select(col("doc_id"), col("text"))
    val newSnap = d.filter(pmod(col("doc_id"), lit(19)) =!= 5)
      .select(col("doc_id"),
        when(pmod(col("doc_id"), lit(13)) === 2, concat(col("text"), lit(" rev7")))
          .otherwise(col("text")).as("text"))
    Snapshot.delta(oldSnap, newSnap).orderBy(col("doc_id"))
  }

  /** Ingest-time (streaming) crawl reconciliation: the same snapshot
    * roles as [[corpus_delta]], but the NEW snapshot arrives as a
    * 3-micro-batch stream — side-tagged cross-side band state emits
    * added×retained candidates incrementally
    * (StreamingDedup.runDelta); the drained result must equal batch
    * corpus_delta (same hard oracle).
    */
  def corpus_delta_stream(spark: SparkSession, dir: String): DataFrame = {
    val d = docs(spark, dir)
    val oldSnap = d.filter(pmod(col("doc_id"), lit(17)) =!= 3)
      .select(col("doc_id"), col("text"))
    val newSnap = d.filter(pmod(col("doc_id"), lit(19)) =!= 5)
      .select(col("doc_id"),
        when(pmod(col("doc_id"), lit(13)) === 2, concat(col("text"), lit(" rev7")))
          .otherwise(col("text")).as("text"))
    graft.streaming.StreamingDedup.runDelta(spark, oldSnap, newSnap)
      .orderBy(col("doc_id"))
  }

  /** Per-language distribution report of the curation metrics: exact
    * linear-interpolation percentiles of doc length and quality score
    * (the table a curation run eyeballs to pick filter thresholds).
    */
  def quality_quantiles(spark: SparkSession, dir: String): DataFrame = {
    val q = TextAnalysis.withQuality(docs(spark, dir), col("text"))
    q.groupBy(col("lang"))
      .agg(
        count(lit(1)).as("n_docs"),
        expr("percentile(n_words, array(0.25D, 0.5D, 0.75D, 0.9D))").as("_pw"),
        expr("percentile(quality_score, array(0.5D, 0.9D))").as("_pq"))
      .select(col("lang"), col("n_docs"),
        round(element_at(col("_pw"), 1), 4).as("p25_words"),
        round(element_at(col("_pw"), 2), 4).as("p50_words"),
        round(element_at(col("_pw"), 3), 4).as("p75_words"),
        round(element_at(col("_pw"), 4), 4).as("p90_words"),
        round(element_at(col("_pq"), 1), 4).as("p50_quality"),
        round(element_at(col("_pq"), 2), 4).as("p90_quality"))
      .orderBy(col("lang"))
  }

  /** The SCALE path of [[quality_quantiles]]: `approx_percentile`
    * (Greenwald-Khanna sketch — bounded O(accuracy) memory per group,
    * mergeable map-side) instead of exact `percentile`, whose
    * sort-based aggregate buffers one group's ENTIRE value list in one
    * executor: a single dominant language at 100 TB is billions of
    * doubles in one buffer, an OOM. Rule of thumb: switch to the
    * sketch once a group exceeds ~10 M values (~100 MB of buffered
    * doubles); below that exact is fine and is what the report
    * operator ships.
    *
    * Gated HARD despite being approximate: the entry emits the exact
    * percentiles (hash-checked against DuckDB as usual) plus
    * `approx_ok` — the Spark-side assertion that every sketch estimate
    * lands within tolerance of exact (words: ±max(2, 5%); quality:
    * ±0.05) — which the oracle pins to `true`. A drifting sketch fails
    * the gate, not just a spec.
    */
  def quality_quantiles_approx(spark: SparkSession, dir: String): DataFrame = {
    val q = TextAnalysis.withQuality(docs(spark, dir), col("text"))
    q.groupBy(col("lang"))
      .agg(
        count(lit(1)).as("n_docs"),
        expr("percentile(n_words, array(0.5D, 0.9D))").as("_pw"),
        expr("percentile(quality_score, array(0.5D, 0.9D))").as("_pq"),
        expr("approx_percentile(n_words, array(0.5D, 0.9D), 10000)").as("_aw"),
        expr("approx_percentile(quality_score, array(0.5D, 0.9D), 10000)").as("_aq"))
      .select(col("lang"), col("n_docs"),
        round(element_at(col("_pw"), 1), 4).as("p50_words"),
        round(element_at(col("_pw"), 2), 4).as("p90_words"),
        round(element_at(col("_pq"), 1), 4).as("p50_quality"),
        round(element_at(col("_pq"), 2), 4).as("p90_quality"),
        (abs(element_at(col("_aw"), 1) - element_at(col("_pw"), 1)) <=
          greatest(lit(2.0), element_at(col("_pw"), 1) * 0.05) &&
         abs(element_at(col("_aw"), 2) - element_at(col("_pw"), 2)) <=
          greatest(lit(2.0), element_at(col("_pw"), 2) * 0.05) &&
         abs(element_at(col("_aq"), 1) - element_at(col("_pq"), 1)) <= 0.05 &&
         abs(element_at(col("_aq"), 2) - element_at(col("_pq"), 2)) <= 0.05)
          .as("approx_ok"))
      .orderBy(col("lang"))
  }

  /** Incremental dedup: the corpus arrives in micro-batches; the
    * drained stream must equal batch minhashLsh (same hard oracle).
    */
  def dedup_stream_minhash(spark: SparkSession, dir: String): DataFrame =
    graft.streaming.StreamingDedup.runIncremental(spark, docs(spark, dir))
      .orderBy(col("doc_a"), col("doc_b"))

  /** Gates the operator's DEFAULT — which since round 3 IS the scaled
    * operating point (auto bits=ceil(log2(n/16)), 8 plane families),
    * not the old fixed-8-bit config SCALE.md measured turning
    * superlinear. The fixture mirrors the auto-sizing.
    */
  def dedup_embed_cosine(spark: SparkSession, dir: String): DataFrame =
    Dedup.embeddingCosine(Tables(spark, dir, "embeddings"))
      .orderBy(col("vec_a"), col("vec_b"))

  /** A second, PINNED multi-table configuration (bits=10, 4 tables):
    * keeps an explicit-knob path gate-verified alongside the
    * auto-sized default.
    */
  def dedup_embed_cosine_mt(spark: SparkSession, dir: String): DataFrame =
    Dedup.embeddingCosine(Tables(spark, dir, "embeddings"),
      bits = 10, threshold = 0.35, tables = 4)
      .orderBy(col("vec_a"), col("vec_b"))

  /** SemDeDup semantic dedup (SemanticDedup.scala): Lloyd-trained
    * k-means cells, intra-cell cosine pairs, keep the least
    * prototypical member per duplicate group. Gated on the trained
    * configuration (2 Lloyd iters — bit-reproducible via the
    * fixed-point mean update), mirrored by make_expected
    * gen_dedup_semantic.
    */
  def dedup_semantic(spark: SparkSession, dir: String): DataFrame =
    SemanticDedup.semantic(Tables(spark, dir, "embeddings"))
      .orderBy(col("vec_id"))

  /** SSL-prototype/D4 pruning (SemanticDedup.prunePrototypes): rank
    * by centroid-cosine within each k-means cell, prune the most
    * prototypical 25% per cell. Mirrored by make_expected
    * gen_data_prune_prototypes.
    */
  def data_prune_prototypes(spark: SparkSession, dir: String): DataFrame =
    SemanticDedup.prunePrototypes(Tables(spark, dir, "embeddings"))
      .orderBy(col("vec_id"))

  /** BPE tokenizer training (Bpe.trainDf): 24 merges learned from the
    * word-frequency table — one corpus-sized aggregation, then
    * vocab-bounded rounds. Mirrored by make_expected gen_bpe_train.
    */
  def bpe_train(spark: SparkSession, dir: String): DataFrame =
    Bpe.trainDf(spark, Tables(spark, dir, "documents"), col("text"), nMerges = 24,
      corpusKey = Some(dir))
      .orderBy(col("rank"))

  /** Per-doc token counts under the corpus's own learned BPE table —
    * the "token budget" pass. Mirrored by gen_bpe_token_count. The
    * merge table comes from the memoized [[Bpe.trainedFor]], so this
    * entry never re-trains the table bpe_train already learned for
    * the same corpus.
    */
  def bpe_token_count(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables(spark, dir, "documents")
    val merges = Bpe.trainedFor(docs, col("text"), nMerges = 24, corpusKey = dir).merges
    // spread before the per-doc BPE encode (the whole query's cost is
    // this one kernel pass — single-task at below-core-count scans)
    Bpe.tokenCounts(Multimodal.spreadRows(docs.select(col("doc_id"), col("text"))),
      col("doc_id"), col("text"), merges)
      .orderBy(col("doc_id"))
  }

  /** The end artifact of the pipeline: BPE-tokenized, EOS-separated,
    * fixed-length-packed training sequences (Bpe.packIds — same
    * 24-merge table as bpe_train, seqLen=64). Gate output is the
    * exploded (seq_id, pos, token_id) form — integer-only, so the
    * fixture mirror (gen_bpe_pack_ids) is bit-exact by construction.
    */
  def bpe_pack_ids(spark: SparkSession, dir: String): DataFrame = {
    val d = Tables(spark, dir, "documents")
    Bpe.packIds(spark, d, col("doc_id"), col("text"), nMerges = 24, seqLen = 64,
      corpusKey = Some(dir))
      .select(col("seq_id"), posexplode(col("token_ids")))
      .toDF("seq_id", "pos", "token_id")
      .orderBy(col("seq_id"), col("pos"))
  }

  /** DSIR importance weights (Dsir.importanceWeights): hashed-n-gram
    * target-vs-raw LM log-ratio per doc; the gated target domain is
    * the first five sources. Mirrored by make_expected
    * gen_dsir_importance.
    */
  def dsir_importance(spark: SparkSession, dir: String): DataFrame =
    Dsir.importanceWeights(Tables(spark, dir, "documents"),
      col("doc_id"), col("text"),
      col("source").isin("src1", "src2", "src3", "src4", "src5"))
      .orderBy(col("doc_id"))

  /** K-means cluster diagnostics over the embedding corpus
    * (SemanticDedup.kmeansReport): per-cluster cardinality, inertia
    * and prototypicality spread — the parameter-picking table for the
    * SemDeDup / prototype-pruning / IVF family. Mirrored by
    * make_expected gen_emb_kmeans_report.
    */
  def emb_kmeans(spark: SparkSession, dir: String): DataFrame =
    SemanticDedup.kmeansReport(Tables(spark, dir, "embeddings"))
      .orderBy(col("cid"))

  def sim_topk_bruteforce(spark: SparkSession, dir: String): DataFrame = {
    val emb = Tables(spark, dir, "embeddings")
    Similarity.topKBruteForce(emb, emb.filter(col("vec_id") < 8), k = 5)
      .orderBy(col("query_id"), col("rank"))
  }

  /** Self-reporting ANN quality: recall@5 of the LSH and IVF variants
    * against exact brute force, per method (rows-only — documents the
    * approximation quality in every verify run).
    *
    * Every arm is SERVED from its standing artifacts
    * ([[IndexOps.ensureRecallExtras]] builds them once per corpus
    * generation; steady state is a no-op): zero training / encoding /
    * signature jobs run at report time — the only live compute is the
    * brute-force ground truth (the report's raison d'être) and the
    * 64-query-side projections. The per-arm configurations are
    * unchanged from the training form (seed books for the pq/ivfpq
    * arms, 3-iter Lloyd for ivf_kmeans, 6-bit/8-table LSH), so the
    * recall values are bit-identical to the pre-index report.
    */
  def sim_recall_report(spark: SparkSession, dir: String): DataFrame = {
    IndexOps.ensureRecallExtras(spark, dir)
    // shared across the eight variants: one corpus cache, one exact
    // ground-truth materialization — computed and PINNED before the
    // arms fork so none of them re-derives the brute-force relation
    val emb = Tables(spark, dir, "embeddings")
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val queries = emb.filter(col("vec_id") < 64)
    val bf = Similarity.topKBruteForce(emb, queries, k = 5)
      .select(col("query_id"), col("neighbor_id"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val total = bf.count().toDouble // materializes both caches, once
    def recallOf(name: String, approx: => DataFrame): (String, Double) = {
      val hits = approx.select(col("query_id"), col("neighbor_id"))
        .join(bf, Seq("query_id", "neighbor_id"), "left_semi")
        .count().toDouble
      // same HALF_UP rounding as functions.round
      (name, BigDecimal(hits / total)
        .setScale(4, scala.math.BigDecimal.RoundingMode.HALF_UP).toDouble)
    }
    def art(name: String): DataFrame = IndexOps.load(spark, dir, name)
    val seedCentroids = art("ann_centroids")
    val seedBooks = art("ann_pq_books")
    val (sqMins, sqScales) = Sq8.gridFrom(art("ann_sq8_grid"), 64)
    val arms: Seq[(String, () => DataFrame)] = Seq(
      ("opq", () => Opq.topKOpqOnIndex(art("ann_opq_transform"), art("ann_opq_books"),
        art("ann_opq_coded"), emb, queries, k = 5)),
      ("ivf_kmeans", () => Similarity.topKIvfOnIndex(art("ann_ivf_k3_cells"), queries,
        k = 5, art("ann_centroids_k3"), nProbe = 4)),
      ("sq8", () => Sq8.topKSq8OnIndex(art("ann_sq8_coded"), emb, queries, k = 5,
        sqMins, sqScales)),
      ("lsh", () => Similarity.topKLshOnIndex(art("ann_lsh_sigs"), emb, queries,
        k = 5, bits = 6, tables = 8)),
      ("ivf", () => Similarity.topKIvfOnIndex(art("ann_ivf_cells"), queries,
        k = 5, seedCentroids, nProbe = 4)),
      ("pq", () => Pq.topKPqOnIndex(art("ann_pq_coded"), emb, queries, k = 5,
        seedBooks, m = 8, dim = 64, rerankMult = 8)),
      ("ivfpq", () => Pq.topKIvfPqOnIndex(art("ann_pq_celled"), emb, queries, k = 5,
        seedCentroids, seedBooks, nProbe = 4, m = 8, dim = 64, rerankMult = 8)),
      ("ivfpq_nc", () => Pq.topKIvfPqOnIndex(art("ann_pq_celled"), emb, queries, k = 5,
        seedCentroids, seedBooks, nProbe = 4, m = 8, dim = 64, rerankMult = 8,
        normCorrect = true)))
    // Bounded concurrency: 3 arms in flight, not 8 — overlapping a few
    // scan pipelines hides scheduler latency without the unbounded-
    // global-pool GC storm (90 s GC in the round-6 loaded bench) of
    // launching all eight at once.
    import scala.concurrent.{Await, ExecutionContext, Future}
    import scala.concurrent.duration.Duration
    val pool = java.util.concurrent.Executors.newFixedThreadPool(3)
    implicit val ec: ExecutionContext = ExecutionContext.fromExecutorService(pool)
    val rows =
      try Await.result(
        Future.sequence(arms.map { case (name, mk) =>
          Future(recallOf(name, mk()))
        }), Duration.Inf)
      finally {
        pool.shutdown()
        bf.unpersist()
        emb.unpersist()
      }
    import spark.implicits._
    rows.sortBy(_._1).toDF("method", "recall_at_5")
  }

  def sim_topk_ivf(spark: SparkSession, dir: String): DataFrame = {
    val emb = Tables(spark, dir, "embeddings")
    Similarity.topKIvf(emb, emb.filter(col("vec_id") < 64), k = 5)
      .orderBy(col("query_id"), col("rank"))
  }

  def sim_topk_lsh(spark: SparkSession, dir: String): DataFrame = {
    val emb = Tables(spark, dir, "embeddings")
    Similarity.topKLsh(emb, emb.filter(col("vec_id") < 64), k = 5, bits = 6)
      .orderBy(col("query_id"), col("rank"))
  }

  /** Product-quantization ANN: the corpus scans as m-byte codes, exact
    * math only on the ADC top-R re-rank candidates (operators.Pq).
    */
  /** OPQ-initialized PQ (Ge et al. 2013 natural parameterization):
    * PCA rotation + variance-balancing block permutation, then the
    * trained-codebook norm-corrected PQ search — all three stages
    * bit-reproducible, gated against make_expected gen_sim_topk_opq.
    */
  def sim_topk_opq(spark: SparkSession, dir: String): DataFrame = {
    val emb = Tables(spark, dir, "embeddings")
    Opq.topKOpq(emb, emb.filter(col("vec_id") < 64), k = 5)
      .orderBy(col("query_id"), col("rank"))
  }

  /** SQ8 scalar-quantization ANN (1 byte/dim uniform per-dim grid,
    * norm-corrected ADC, exact re-rank) — training-free: the grid is
    * an exact min/max aggregate, so the whole operator is
    * partitioning-independent with no pinned seed state. Mirrored by
    * make_expected gen_sim_topk_sq8.
    */
  def sim_topk_sq8(spark: SparkSession, dir: String): DataFrame = {
    val emb = Tables(spark, dir, "embeddings")
    Sq8.topKSq8(emb, emb.filter(col("vec_id") < 64), k = 5)
      .orderBy(col("query_id"), col("rank"))
  }

  def sim_topk_pq(spark: SparkSession, dir: String): DataFrame = {
    val emb = Tables(spark, dir, "embeddings")
    Pq.topKPq(emb, emb.filter(col("vec_id") < 64), k = 5)
      .orderBy(col("query_id"), col("rank"))
  }

  /** IVF-PQ composition: cells prune, codes score, exact re-rank —
    * gated on the PRODUCTION configuration: Lloyd-TRAINED codebooks
    * (2 iters, bit-reproducible via Pq.trainCodebooks' fixed-point
    * means) and norm-corrected ADC (divide by the reconstruction's
    * norm — the knob SCALE.md measured lifting recall 0.731→0.992 on
    * trained books), not the seed/classic fallback a deployment would
    * never run.
    */
  def sim_topk_ivfpq(spark: SparkSession, dir: String): DataFrame = {
    val emb = Tables(spark, dir, "embeddings")
    Pq.topKIvfPqWith(emb, emb.filter(col("vec_id") < 64), k = 5,
      Similarity.centroidsFor(emb, 16, kmeansIters = 0),
      Pq.trainCodebooks(emb, m = 8, ksub = 16, dim = 64, iters = 2),
      nProbe = 4, m = 8, dim = 64, rerankMult = 8, normCorrect = true)
      .orderBy(col("query_id"), col("rank"))
  }

  /** Corpus heavy hitters via the custom SpaceSaving
    * TypedImperativeAggregate. capacity (256) exceeds the corpus
    * vocabulary, so counts are exact here and the DuckDB word-count
    * oracle applies; at real scale the same aggregate keeps only 256
    * counters per partial.
    */
  def text_heavy_hitters(spark: SparkSession, dir: String): DataFrame =
    docs(spark, dir)
      .select(explode(split(col("text"), " ")).as("word"))
      .agg(GraftFunctions.spaceSavingTopK(col("word"), 15, 256).as("top"))
      .select(explode(col("top")).as("t"))
      .select(col("t.item").as("word"), col("t.cnt").as("cnt"))
      .orderBy(col("cnt").desc, col("word"))

  /** END-TO-END corpus cleaning — the operators composed the way a
    * pre-training pipeline chains them: language filter → quality
    * filter → eval-split + decontamination drop → near-dup resolve,
    * emitting the kept docs with their token counts. Every stage is
    * an already-audited scale shape (scans + one broadcast join + the
    * LSH bucket join). NOTE: calling this runs resolveComponents'
    * label-propagation jobs eagerly (one action per round over the
    * persisted filtered corpus) — the result is a DataFrame, but its
    * construction is not free.
    */
  /** Deterministic PCA of the embedding corpus: top-8 principal
    * components via exact fixed-point moment sums + driver-side cyclic
    * Jacobi (operators/Pca.scala); output is each vector's projection
    * onto the loadings. Fixture-oracled: tools/make_expected.py
    * replays the identical arithmetic in pure Python.
    */
  def emb_pca(spark: SparkSession, dir: String): DataFrame =
    Pca.pca(Tables(spark, dir, "embeddings"))
      .orderBy(col("vec_id"), col("k"))

  /** PageRank over the LSH-verified near-dup pair graph — template /
    * boilerplate hubs concentrate mass (operators/Graph.scala; one
    * O(edges) exchange per superstep, decimal-summed contributions,
    * unrolled DuckDB oracle).
    */
  def graph_pagerank(spark: SparkSession, dir: String): DataFrame =
    // edges from the recall-EXACT PPJoin arm, NOT minhash banding:
    // pagerank's oracle pins deg and pr(8dp) exactly, and deg/pr are
    // sensitive to every individual edge — the 25x density gate caught
    // the 16x4 banding S-curve tail (P(miss|J=0.8) ~= 2.2e-4) dropping
    // 4 of 1.65M edges and shifting deg/pr (SCALE.md round 9). The
    // component-level consumers (dedup_resolve/families/weights/
    // keep_best) stay on minhash: their family outputs are redundant
    // to tail misses (verified identical to the exact fixtures at 25x).
    Graph.pageRank(docs(spark, dir),
        Dedup.ngramJaccard(docs(spark, dir), threshold = 0.8))
      .orderBy(col("doc_id"))

  /** BM25 ranked retrieval: top-10 docs for 4 fixed keyword queries
    * (operators/Bm25.scala — matched-postings-only exchange, broadcast
    * stats, bounded-heap top-k).
    */
  def search_bm25(spark: SparkSession, dir: String): DataFrame =
    Bm25.topK(docs(spark, dir), Bm25.defaultQueries, 10)

  /** Hybrid-retrieval rank fusion: RRF of the BM25 arm and the
    * lexical-overlap arm (operators/Bm25.rrfTopK) — top-10 from two
    * top-20 pools.
    */
  def search_rrf(spark: SparkSession, dir: String): DataFrame =
    Bm25.rrfTopK(docs(spark, dir), Bm25.defaultQueries, 10)

  def pipeline_clean(spark: SparkSession, dir: String): DataFrame = {
    val d = docsSpread(spark, dir)
    val isEval = Sampling.bucket(col("doc_id"), 100) >= 98
    val scored = TextAnalysis.withQuality(
      TextAnalysis.withLangId(d, col("text")), col("text"))
    val base = scored
      .filter(col("pred_lang") === "en" && col("quality_score") >= 0.65 && !isEval)
      .select(col("doc_id"), col("text"))
    val contaminated = Contamination.evalOverlap(d, isEval, k = 5).select(col("doc_id"))
    // persisted: the filtered corpus feeds the signature pass, both
    // verify fetch-joins, and the final keep-set anti-join — without
    // this the langid+quality+contamination scoring re-runs per job
    val clean = base.join(contaminated, Seq("doc_id"), "left_anti")
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    // tokenize AFTER the keep-set join: the regex pass runs over kept
    // docs only, not the full corpus
    TextAnalysis.withTokenCounts(
      Dedup.resolveComponents(clean, Dedup.minhashLsh(clean)).join(d, "doc_id"),
      col("text"))
      .select(col("doc_id"), col("n_bpe_tokens"))
      .orderBy(col("doc_id"))
  }

  /** The curation FUNNEL report (dataset-card numbers): how many docs
    * survive each stage of [[pipeline_clean]]'s chain — total → langid
    * → quality floor → holdout split → decontamination → near-dup
    * resolve. Same verified stage operators, but aggregated to one
    * row per stage instead of materializing the kept corpus; the
    * per-stage counts come from ONE pass over the flagged corpus
    * (conditional sums, map-side combinable) plus the resolve
    * fixpoint on the filtered base. What a pipeline publishes next to
    * its training set.
    */
  def pipeline_report(spark: SparkSession, dir: String): DataFrame = {
    val d = docsSpread(spark, dir)
    val isEval = Sampling.bucket(col("doc_id"), 100) >= 98
    val scored = TextAnalysis.withQuality(
      TextAnalysis.withLangId(d, col("text")), col("text"))
    val contaminated = Contamination.evalOverlap(d, isEval, k = 5)
      .select(col("doc_id"), lit(true).as("_cont"))
    val flags = scored
      .select(col("doc_id"), col("text"),
        (col("pred_lang") === "en").as("_lang_ok"),
        (col("quality_score") >= 0.65).as("_q_ok"),
        isEval.as("_eval"))
      .join(contaminated, Seq("doc_id"), "left")
      .withColumn("_cont", coalesce(col("_cont"), lit(false)))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val base = flags
      .filter(col("_lang_ok") && col("_q_ok") && !col("_eval") && !col("_cont"))
      .select(col("doc_id"), col("text"))
    val kept = Dedup.resolveComponents(base, Dedup.minhashLsh(base))
    val cnt = flags.agg(
      count(lit(1)).as("n0"),
      sum(when(col("_lang_ok"), 1L).otherwise(0L)).as("n1"),
      sum(when(col("_lang_ok") && col("_q_ok"), 1L).otherwise(0L)).as("n2"),
      sum(when(col("_lang_ok") && col("_q_ok") && !col("_eval"), 1L).otherwise(0L)).as("n3"),
      sum(when(col("_lang_ok") && col("_q_ok") && !col("_eval") && !col("_cont"), 1L)
        .otherwise(0L)).as("n4"))
    cnt.crossJoin(broadcast(kept.agg(count(lit(1)).as("n5"))))
      .selectExpr("stack(6, '00_total', n0, '01_lang', n1, '02_quality', n2, " +
        "'03_holdout', n3, '04_decontaminated', n4, '05_deduped', n5) as (stage, n_docs)")
      .orderBy(col("stage"))
  }

  /** Perceptual-hash near-dup pairs over REAL decoded images — image
    * dedup as a training pipeline runs it: javax.imageio pixel decode
    * → 8×8 area-average downsample → average-hash → the simhash
    * hamming-band machinery. Mirrored by make_expected
    * gen_mm_phash_dedup (the synthetic-PNG pixel spec is integer-only
    * and PNG is lossless, so the Python oracle derives every pixel
    * without a codec).
    */
  def mm_phash_dedup(spark: SparkSession, dir: String): DataFrame = {
    val base = Multimodal.withSyntheticImages(docs(spark, dir))
      .select(col("doc_id"), col("media"))
    // the ingest scenario the op exists for: the corpus plus pixel-
    // perturbed RE-ENCODES of its first 32 blobs (ids +10^7) — exact
    // hashing misses every (original, re-encode) pair, the perceptual
    // hash links them at hamming <= 3
    val withRe = base.unionByName(
      Multimodal.reencodedCopies(spark, base, n = 32, idOffset = 10_000_000L))
    Multimodal.phashDedup(spark, withRe).orderBy(col("doc_a"), col("doc_b"))
  }

  /** REAL image-header decode (width/height/format via javax.imageio,
    * header-only — no raster decompression) over the per-doc synthetic
    * PNG column.
    */
  def mm_decode_meta(spark: SparkSession, dir: String): DataFrame =
    Multimodal.decodeMeta(spark, Multimodal.withSyntheticImages(docs(spark, dir)))
      .toDF().orderBy(col("doc_id"))

  def mm_frame_sample(spark: SparkSession, dir: String): DataFrame =
    Multimodal.sampleFrames(spark, Multimodal.withFakeMedia(docs(spark, dir)))
      .toDF().orderBy(col("doc_id"), col("frame_idx"))

  /** Fit-in-box resize plan from REAL decoded dims; box = 24 so the
    * shrink path actually exercises on the 16..32-px synthetic images
    * (224 would never bind).
    */
  def mm_resize_meta(spark: SparkSession, dir: String): DataFrame =
    Multimodal.resizeMeta(spark, Multimodal.withSyntheticImages(docs(spark, dir)),
      box = 24)
      .toDF().orderBy(col("doc_id"))

  /** REAL audio-container decode (encoding/rate/channels/bits/frames
    * via javax.sound.sampled, header-only) over the per-doc synthetic
    * WAV column — the oracle states the generation spec; the engine
    * must recover it from the actual RIFF header.
    */
  def mm_audio_meta(spark: SparkSession, dir: String): DataFrame =
    Audio.decodeMeta(spark, Audio.withSyntheticAudio(docs(spark, dir)))
      .toDF().orderBy(col("doc_id"))

  /** REAL PCM frame sampling through the JDK decoder: 4 evenly spaced
    * decoded amplitudes per clip (mm_frame_sample keeps the
    * byte-offset stub for GENERAL video containers; animated GIF gets
    * real frame decode in mm_video_frame_sample).
    */
  def mm_audio_frame_sample(spark: SparkSession, dir: String): DataFrame =
    Audio.sampleFrames(spark, Audio.withSyntheticAudio(docs(spark, dir)))
      .toDF().orderBy(col("doc_id"), col("frame_idx"))

  /** Perceptual audio dedup over REAL decoded PCM — envelope-profile
    * average hash + hamming banding, against gain-scaled re-encodes
    * of the first 32 clips (ids +10^7): exact hashing misses every
    * (original, re-upload) pair, the envelope hash links them.
    * Mirrored by make_expected gen_mm_audio_dedup (integer-only spec,
    * WAV PCM lossless — the Python oracle needs no codec).
    */
  def mm_audio_dedup(spark: SparkSession, dir: String): DataFrame = {
    val base = Audio.withSyntheticAudio(docs(spark, dir))
      .select(col("doc_id"), col("media"))
    val withRe = base.unionByName(
      Audio.reencodedCopies(spark, base, n = 32, idOffset = 10_000_000L))
    Audio.audioDedup(spark, withRe).orderBy(col("doc_a"), col("doc_b"))
  }

  /** REAL multi-frame container decode over the per-doc synthetic
    * animated GIF: frame count via a genuine stream scan, dims from
    * the first frame header, per-frame delay and total duration from
    * each frame's GraphicControlExtension — the oracle states the
    * generation spec; the engine must recover every field from the
    * actual container (operators/Video.scala).
    */
  def mm_video_meta(spark: SparkSession, dir: String): DataFrame =
    Video.decodeMeta(spark, Video.withSyntheticVideos(docs(spark, dir)))
      .toDF().orderBy(col("doc_id"))

  /** REAL video frame sampling through the JDK's GIF LZW decoder: 2
    * evenly spaced frames per clip, each decoded to pixels and
    * reduced to its integer mean luma. Mirrored by make_expected
    * gen_mm_video_frame_sample (integer-only spec, GIF LZW lossless —
    * the Python oracle needs no codec).
    */
  def mm_video_frame_sample(spark: SparkSession, dir: String): DataFrame =
    Video.sampleFrames(spark, Video.withSyntheticVideos(docs(spark, dir)))
      .toDF().orderBy(col("doc_id"), col("frame_idx"))

  /** Perceptual video dedup over REAL decoded frames — temporal-
    * average 8×8 profile + average hash + hamming banding, against
    * per-frame pixel-perturbed GIF re-encodes of the first 32 clips
    * (ids +10^7). Mirrored by make_expected gen_mm_video_dedup.
    */
  def mm_video_dedup(spark: SparkSession, dir: String): DataFrame = {
    val base = Video.withSyntheticVideos(docs(spark, dir))
      .select(col("doc_id"), col("media"))
    val withRe = base.unionByName(
      Video.reencodedCopies(spark, base, n = 32, idOffset = 10_000_000L))
    Video.videoDedup(spark, withRe).orderBy(col("doc_a"), col("doc_b"))
  }

  /** Top PMI bigram collocations (Church & Hanks) — see
    * TextAnalysis.pmiCollocations for the fingerprint-keyed shape.
    */
  def text_pmi(spark: SparkSession, dir: String): DataFrame =
    TextAnalysis.pmiCollocations(docs(spark, dir), col("text"))

  /** Zipf rank-frequency report with fitted log-log slope — see
    * TextAnalysis.zipfReport.
    */
  def text_zipf(spark: SparkSession, dir: String): DataFrame =
    TextAnalysis.zipfReport(docs(spark, dir), col("text"))

  val queries: Map[String, Q] = Map(
    "text_pmi" -> (text_pmi _),
    "text_zipf" -> (text_zipf _),
    "pipeline_report" -> (pipeline_report _),
    "emb_kmeans" -> (emb_kmeans _),
    "text_token_count" -> (text_token_count _),
    "text_quality" -> (text_quality _),
    "text_entropy" -> (text_entropy _),
    "text_langid" -> (text_langid _),
    "text_fingerprint" -> (text_fingerprint _),
    "text_redact" -> (text_redact _),
    "data_split" -> (data_split _),
    "data_mix" -> (data_mix _),
    "data_temperature" -> (data_temperature _),
    "text_heavy_hitters_stream" -> (text_heavy_hitters_stream _),
    "dedup_exact_stream" -> (dedup_exact_stream _),
    "search_rrf" -> (search_rrf _),
    "sample_stratified" -> (sample_stratified _),
    "text_surprisal" -> (text_surprisal _),
    "text_bigram_surprisal" -> (text_bigram_surprisal _),
    "text_kn_surprisal" -> (text_kn_surprisal _),
    "text_boilerplate" -> (text_boilerplate _),
    "text_repetition" -> (text_repetition _),
    "text_ccnet_bucket" -> (text_ccnet_bucket _),
    "text_gopher" -> (text_gopher _),
    "text_tfidf" -> (text_tfidf _),
    "corpus_stats" -> (corpus_stats _),
    "stats_ks_drift" -> (stats_ks_drift _),
    "stats_chi2_drift" -> (stats_chi2_drift _),
    "stats_psi_drift" -> (stats_psi_drift _),
    "stats_profile" -> (stats_profile _),
    "dedup_lsh_tuning" -> (dedup_lsh_tuning _),
    "data_shuffle" -> (data_shuffle _),
    "dedup_span_exact" -> (dedup_span_exact _),
    "dedup_span_removal" -> (dedup_span_removal _),
    "contamination_check" -> (contamination_check _),
    "contamination_stream" -> (contamination_stream _),
    "contamination_bloom" -> (contamination_bloom _),
    "dedup_containment" -> (dedup_containment _),
    "quality_classifier" -> (quality_classifier _),
    "dedup_span_chars" -> (dedup_span_chars _),
    "text_normalize" -> (text_normalize _),
    "dedup_keep_best" -> (dedup_keep_best _),
    "dedup_cross_corpus" -> (dedup_cross_corpus _),
    "corpus_delta" -> (corpus_delta _),
    "corpus_delta_stream" -> (corpus_delta_stream _),
    "data_pack" -> (data_pack _),
    "data_budget_select" -> (data_budget_select _),
    "quality_floor" -> (quality_floor _),
    "pipeline_curate" -> (pipeline_curate _),
    "dedup_exact" -> (dedup_exact _),
    "dedup_minhash_lsh" -> (dedup_minhash_lsh _),
    "dedup_simhash" -> (dedup_simhash _),
    "dedup_ngram_jaccard" -> (dedup_ngram_jaccard _),
    "dedup_stream_minhash" -> (dedup_stream_minhash _),
    "dedup_embed_cosine" -> (dedup_embed_cosine _),
    "dedup_embed_cosine_mt" -> (dedup_embed_cosine_mt _),
    "dedup_semantic" -> (dedup_semantic _),
    "data_prune_prototypes" -> (data_prune_prototypes _),
    "bpe_train" -> (bpe_train _),
    "bpe_token_count" -> (bpe_token_count _),
    "bpe_pack_ids" -> (bpe_pack_ids _),
    "dsir_importance" -> (dsir_importance _),
    "dedup_resolve" -> (dedup_resolve _),
    "dedup_families" -> (dedup_families _),
    "dedup_weights" -> (dedup_weights _),
    "quality_quantiles" -> (quality_quantiles _),
    "quality_quantiles_approx" -> (quality_quantiles_approx _),
    "sim_topk_bruteforce" -> (sim_topk_bruteforce _),
    "sim_topk_lsh" -> (sim_topk_lsh _),
    "sim_topk_pq" -> (sim_topk_pq _),
    "sim_topk_sq8" -> (sim_topk_sq8 _),
    "sim_topk_opq" -> (sim_topk_opq _),
    "sim_topk_ivfpq" -> (sim_topk_ivfpq _),
    "sim_topk_ivf" -> (sim_topk_ivf _),
    "text_heavy_hitters" -> (text_heavy_hitters _),
    "sim_recall_report" -> (sim_recall_report _),
    "mm_decode_meta" -> (mm_decode_meta _),
    "mm_phash_dedup" -> (mm_phash_dedup _),
    "mm_frame_sample" -> (mm_frame_sample _),
    "mm_resize_meta" -> (mm_resize_meta _),
    "mm_audio_meta" -> (mm_audio_meta _),
    "mm_audio_frame_sample" -> (mm_audio_frame_sample _),
    "mm_audio_dedup" -> (mm_audio_dedup _),
    "mm_video_meta" -> (mm_video_meta _),
    "mm_video_frame_sample" -> (mm_video_frame_sample _),
    "mm_video_dedup" -> (mm_video_dedup _),
    "search_bm25" -> (search_bm25 _),
    "graph_pagerank" -> (graph_pagerank _),
    "emb_pca" -> (emb_pca _),
    "pipeline_clean" -> (pipeline_clean _))

  /** Derived from the single source of truth so an edit to the
    * engine's stopword profile can never silently desync the oracles.
    */
  private val stopList =
    TextAnalysis.StopWords.map(s => s"'$s'").mkString(", ")

  /** Shared by the batch and streaming decontamination entries. */
  /** Shared by corpus_delta and its streaming twin (same drained
    * rows): statuses from the modular old/new snapshot definitions,
    * added_near_dup from exact all-pairs Jaccard between added and
    * retained docs (Spark compares md5 digests, the oracle compares
    * texts — identical up to a 2^-128 collision).
    */
  private[queries] lazy val corpusDeltaOracle =
    s"""WITH oldd AS (
       |  SELECT doc_id, text FROM documents WHERE doc_id % 17 <> 3),
       |newd AS (
       |  SELECT doc_id,
       |         CASE WHEN doc_id % 13 = 2 THEN text || ' rev7' ELSE text END AS text
       |  FROM documents WHERE doc_id % 19 <> 5),
       |cls AS (
       |  SELECT coalesce(o.doc_id, n.doc_id) AS doc_id,
       |         CASE WHEN o.doc_id IS NULL THEN 'added'
       |              WHEN n.doc_id IS NULL THEN 'removed'
       |              WHEN o.text <> n.text THEN 'changed'
       |              ELSE 'unchanged' END AS status
       |  FROM oldd o FULL OUTER JOIN newd n ON o.doc_id = n.doc_id),
       |sh AS (
       |  SELECT doc_id, ${shingleListSql(3)} AS s
       |  FROM (SELECT n.doc_id, n.text,
       |               string_split(rtrim(n.text), ' ') AS w FROM newd n)),
       |sz AS (SELECT doc_id, len(s) AS n FROM sh),
       |e AS (SELECT doc_id, unnest(s) AS g FROM sh),
       |inter AS (
       |  SELECT a.doc_id AS retained_doc, b.doc_id AS added_doc, count(*) AS i
       |  FROM e a JOIN e b ON a.g = b.g
       |  WHERE a.doc_id IN (SELECT doc_id FROM oldd) AND a.doc_id IN (SELECT doc_id FROM newd)
       |    AND b.doc_id NOT IN (SELECT doc_id FROM oldd) AND b.doc_id IN (SELECT doc_id FROM newd)
       |  GROUP BY 1, 2),
       |nd AS (
       |  SELECT added_doc, min(retained_doc) AS near_dup_of
       |  FROM inter JOIN sz sa ON sa.doc_id = retained_doc JOIN sz sb ON sb.doc_id = added_doc
       |  WHERE i::double / (sa.n + sb.n - i) >= 0.8
       |  GROUP BY added_doc)
       |SELECT cls.doc_id,
       |       CASE WHEN nd.near_dup_of IS NOT NULL THEN 'added_near_dup'
       |            ELSE cls.status END AS status,
       |       nd.near_dup_of
       |FROM cls LEFT JOIN nd ON cls.doc_id = nd.added_doc
       |ORDER BY cls.doc_id""".stripMargin

  private lazy val contaminationOracle =
    s"""WITH g AS (
      |  SELECT doc_id,
      |         mod(('0x' || substr(md5(cast(doc_id as varchar)), 1, 8))::bigint, 100) >= 98 AS is_eval,
      |         unnest(${shingleListSql(5)}) AS gram
      |  FROM (SELECT doc_id, string_split(rtrim(text), ' ') AS w FROM documents)),
      |e AS (SELECT DISTINCT gram FROM g WHERE is_eval)
      |SELECT g.doc_id, count(*) AS n_shared_ngrams
      |FROM g JOIN e USING (gram)
      |WHERE NOT g.is_eval
      |GROUP BY g.doc_id ORDER BY g.doc_id""".stripMargin

  /** WITH RECURSIVE transitive closure of the J>=0.8 near-dup graph —
    * the shared prefix of the dedup_resolve / dedup_families oracles
    * (built on the same jaccard-pair construction as jaccardPairsSql).
    */
  private def componentClosureSql: String =
    s"""WITH RECURSIVE sh AS (
       |  SELECT doc_id, ${shingleListSql(3)} AS s
       |  FROM (SELECT doc_id, string_split(rtrim(text), ' ') AS w FROM documents)
       |),
       |_sz AS (SELECT doc_id, len(s) AS n FROM sh),
       |_ex AS (SELECT doc_id, unnest(s) AS g FROM sh),
       |_in AS (
       |  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS i
       |  FROM _ex a JOIN _ex b ON a.g = b.g AND a.doc_id < b.doc_id
       |  GROUP BY 1, 2),
       |p AS (
       |  SELECT doc_a, doc_b
       |  FROM _in JOIN _sz sa ON sa.doc_id = doc_a JOIN _sz sb ON sb.doc_id = doc_b
       |  WHERE i::double / (sa.n + sb.n - i) >= 0.8
       |),
       |edges AS (SELECT doc_a AS a, doc_b AS b FROM p UNION SELECT doc_b, doc_a FROM p),
       |reach AS (
       |  SELECT a AS node, b AS r FROM edges
       |  UNION
       |  SELECT reach.node, edges.b FROM reach JOIN edges ON reach.r = edges.a
       |)""".stripMargin

  /** DuckDB mirror of TextHashes.shingles over a word list `w`:
    * distinct word-k-grams, EXCEPT docs with ≤ k words, which yield
    * the whole text as a single shingle (the kernel's short-doc rule —
    * without the CASE the SQL yields an empty set and diverges).
    */
  private def shingleListSql(k: Int): String =
    s"CASE WHEN len(w) <= $k THEN [array_to_string(w, ' ')] " +
      s"ELSE list_distinct(list_transform(range(1, len(w)-${k - 2}), i -> array_to_string(w[i:i+${k - 1}], ' '))) END"

  /** DuckDB mirror of TextHashes.shingles (word k=3 grams, distinct) +
    * exact all-pairs Jaccard — an INDEPENDENT implementation of the
    * near-dup ground truth. Computed as the standard exploded
    * equality-join: unnest distinct shingles, count co-occurrences per
    * (a, b) pair, J = i/(|A|+|B|−i). Pairs sharing NO shingle have
    * J = 0 and can never pass any positive threshold, so enumerating
    * only co-shingle pairs is exact — and ~70× faster than pairwise
    * list_intersect over the quadratic pair space (224 s → 2 s at
    * sf0.1, result verified identical).
    * Valid as the LSH/blocked operators' oracle because the test
    * corpora's near-dup pairs all sit at J >= 0.9, where both the
    * 16x4 banding and single-min-hash blocking have recall 1 (verified
    * sf0.001/0.01/0.1); the operators themselves remain probabilistic.
    */
  private def jaccardPairsSql(threshold: Double): String =
    s"""WITH sh AS (
       |  SELECT doc_id, ${shingleListSql(3)} AS s
       |  FROM (SELECT doc_id, string_split(rtrim(text), ' ') AS w FROM documents)
       |),
       |_sz AS (SELECT doc_id, len(s) AS n FROM sh),
       |_ex AS (SELECT doc_id, unnest(s) AS g FROM sh),
       |_in AS (
       |  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS i
       |  FROM _ex a JOIN _ex b ON a.g = b.g AND a.doc_id < b.doc_id
       |  GROUP BY 1, 2),
       |pairs AS (
       |  SELECT doc_a, doc_b, i::double / (sa.n + sb.n - i) AS j
       |  FROM _in JOIN _sz sa ON sa.doc_id = doc_a JOIN _sz sb ON sb.doc_id = doc_b
       |)""".stripMargin

  /** Pick the committed expected-result fixture matching the sfDir the
    * driver is actually running (content-discriminated, not just row
    * count — sf0.001 and sf0.01 both have 500 docs). Fixtures are
    * generated by tools/make_expected.py, an independent pure-Python
    * reimplementation of the hash kernels (see expected/README.md).
    */
  private[queries] def fixtureSql(name: String, table: String): String = {
    val (gate, keys) = table match {
      case "documents" =>
        ("(SELECT count(*) || '-' || sum(n_chars) FROM documents)",
          Seq("0.001" -> "500-153156", "0.01" -> "500-149174", "0.1" -> "5000-1485576"))
      case "embeddings" =>
        ("(SELECT count(*) || '-' || sum(label) FROM embeddings)",
          Seq("0.001" -> "500-2268", "0.01" -> "500-2270", "0.1" -> "2000-9063"))
    }
    keys.map { case (sf, disc) =>
      s"SELECT * FROM read_parquet('/root/repo/expected/sf$sf/$name.parquet') WHERE $gate = '$disc'"
    }.mkString("\nUNION ALL\n")
  }

  val oracles: Map[String, String] = Map(
    // identical double tree over exact integer counts; the survivor
    // set is fixed by the top-20 distinct ROUNDED pmi levels (the
    // boilerplate convention), so no hash-order tie-break exists
    "text_pmi" ->
      """WITH w AS (SELECT string_split(rtrim(text), ' ') AS ws FROM documents),
        |u AS (SELECT unnest(ws) AS word FROM w),
        |cu AS (SELECT word, count(*) AS c FROM u GROUP BY 1),
        |n AS (SELECT cast(sum(c) as bigint) AS n FROM cu),
        |bg AS (SELECT ws[u.i] AS a, ws[u.i+1] AS b
        |       FROM w, unnest(range(1, len(ws))) AS u(i)),
        |c2a AS (SELECT a, b, count(*) AS c2 FROM bg GROUP BY 1, 2),
        |wt AS (SELECT cast(sum(c2) as bigint) AS w FROM c2a),
        |p AS (SELECT a, b, c2,
        |  round(ln(c2::double * n.n::double * n.n::double /
        |           (wt.w::double * ca.c::double * cb.c::double)), 6) AS pmi
        |  FROM c2a JOIN cu ca ON ca.word = c2a.a JOIN cu cb ON cb.word = c2a.b
        |  CROSS JOIN n CROSS JOIN wt
        |  WHERE c2 >= 5),
        |thr AS (SELECT min(v) AS t
        |        FROM (SELECT DISTINCT pmi AS v FROM p ORDER BY v DESC LIMIT 20))
        |SELECT a AS word_a, b AS word_b, c2 AS n_pair, pmi
        |FROM p, thr WHERE pmi >= thr.t
        |ORDER BY pmi DESC, word_a, word_b""".stripMargin,
    // decimal-summed least-squares terms -> the slope double is
    // partition-order independent and identical cross-engine
    "text_zipf" ->
      """WITH u AS (
        |  SELECT unnest(string_split(rtrim(text), ' ')) AS word FROM documents),
        |cu AS (SELECT word, count(*) AS cnt FROM u GROUP BY 1),
        |t AS (SELECT word, cnt,
        |        cast(row_number() OVER (ORDER BY cnt DESC, word) as int) AS rank
        |      FROM cu ORDER BY cnt DESC, word LIMIT 100),
        |pt AS (SELECT rank, word, cnt,
        |         ln(rank::double) AS x, ln(cnt::double) AS y FROM t),
        |s AS (SELECT count(*) AS k,
        |        sum(cast(x as decimal(28,12))) AS sx,
        |        sum(cast(y as decimal(28,12))) AS sy,
        |        sum(cast(x * x as decimal(28,12))) AS sxx,
        |        sum(cast(x * y as decimal(28,12))) AS sxy
        |      FROM pt)
        |SELECT rank, word, cnt,
        |  round((k::double * cast(sxy as double) - cast(sx as double) * cast(sy as double)) /
        |        (k::double * cast(sxx as double) - cast(sx as double) * cast(sx as double)), 6)
        |    AS zipf_slope
        |FROM pt CROSS JOIN s ORDER BY rank""".stripMargin,
    "stats_profile" -> Seq("doc_id", "lang", "source", "n_chars").map { c =>
      s"""SELECT '$c' AS col_name, count(*)::bigint AS n_rows,
         | cast(sum(CASE WHEN $c IS NULL THEN 1 ELSE 0 END) as bigint) AS n_null,
         | count(DISTINCT $c) AS n_distinct,
         | min($c)::varchar AS min_value, max($c)::varchar AS max_value
         |FROM documents""".stripMargin
    }.mkString("", "\nUNION ALL\n", "\nORDER BY col_name"),
    // identical double tree: add-1/2 smoothed proportions, (p-q)*ln(p/q)
    // terms decimal-summed, round 6 — zero cells (empty length bands)
    // included via the groups x buckets grid
    "stats_psi_drift" ->
      """WITH cells AS (
        |  SELECT source AS grp, least(9, n_chars // 100) AS b, count(*)::bigint AS o
        |  FROM documents GROUP BY 1, 2),
        |r AS (SELECT grp, cast(sum(o) as bigint) AS n FROM cells GROUP BY 1),
        |gl AS (SELECT b, cast(sum(o) as bigint) AS gb FROM cells GROUP BY 1),
        |g AS (SELECT cast(sum(o) as bigint) AS g FROM cells),
        |nb AS (SELECT count(*)::double / 2.0 AS half, count(*) AS nb FROM gl),
        |grid AS (
        |  SELECT r.grp, r.n, gl.b, gl.gb, coalesce(cells.o, 0)::bigint AS o
        |  FROM r CROSS JOIN gl
        |  LEFT JOIN cells ON cells.grp = r.grp AND cells.b = gl.b)
        |SELECT grid.grp AS source, grid.n AS n, nb.nb AS n_buckets,
        |  round(cast(sum(cast(
        |    ((grid.o::double + 0.5) / (grid.n::double + nb.half)
        |      - (grid.gb::double + 0.5) / (g.g::double + nb.half))
        |    * ln(((grid.o::double + 0.5) / (grid.n::double + nb.half))
        |         / ((grid.gb::double + 0.5) / (g.g::double + nb.half)))
        |    as decimal(28,12))) as double), 6) AS psi
        |FROM grid CROSS JOIN g CROSS JOIN nb
        |GROUP BY 1, 2, 3 ORDER BY 1""".stripMargin,
    // expected cell e materialized once; zero cells included; decimal
    // term sums -> identical doubles, rounded 6 on both engines
    "stats_chi2_drift" ->
      """WITH cells AS (
        |  SELECT source AS grp, lang AS cat, count(*)::bigint AS o
        |  FROM documents GROUP BY 1, 2),
        |r AS (SELECT grp, cast(sum(o) as bigint) AS rt FROM cells GROUP BY 1),
        |c AS (SELECT cat, cast(sum(o) as bigint) AS ct FROM cells GROUP BY 1),
        |g AS (SELECT cast(sum(o) as bigint) AS g FROM cells),
        |nc AS (SELECT count(*) AS nc FROM c),
        |grid AS (
        |  SELECT r.grp, c.cat, r.rt, c.ct, coalesce(cells.o, 0) AS o,
        |         r.rt::double * c.ct::double / g.g::double AS e
        |  FROM r CROSS JOIN c
        |  LEFT JOIN cells ON cells.grp = r.grp AND cells.cat = c.cat
        |  CROSS JOIN g)
        |SELECT grid.grp AS source, grid.rt AS n, nc.nc - 1 AS df,
        |  round(cast(sum(cast((grid.o::double - grid.e) * (grid.o::double - grid.e) / grid.e
        |    as decimal(28,12))) as double), 6) AS chi2
        |FROM grid CROSS JOIN nc
        |GROUP BY 1, 2, 3 ORDER BY 1""".stripMargin,
    // span strings order the rows; the survivor SET is fixed by the
    // top-20 distinct count levels, so no hash-order tie-break exists
    "text_boilerplate" ->
      s"""WITH sh AS (
         |  SELECT doc_id, ${shingleListSql(5)} AS s
         |  FROM (SELECT doc_id, string_split(rtrim(text), ' ') AS w FROM documents)),
         |sp AS (SELECT doc_id, u.sp AS sp FROM sh, unnest(s) AS u(sp)),
         |c AS (SELECT sp, count(*) AS n_docs FROM sp GROUP BY sp HAVING count(*) >= 2),
         |thr AS (SELECT min(n) AS t
         |        FROM (SELECT DISTINCT n_docs AS n FROM c ORDER BY n DESC LIMIT 20))
         |SELECT c.sp AS span, c.n_docs FROM c, thr WHERE c.n_docs >= thr.t
         |ORDER BY n_docs DESC, span""".stripMargin,
    // interpolated Kneser-Ney, identical double expression tree; the
    // continuation counts come from the same bigram histogram
    "text_kn_surprisal" ->
      """WITH w AS (SELECT doc_id, string_split(rtrim(text), ' ') AS w FROM documents),
        |bg AS (
        |  SELECT doc_id, w[u.i] AS prev, w[u.i+1] AS cur
        |  FROM w, unnest(range(1, len(w))) AS u(i)),
        |c2 AS (SELECT prev, cur, count(*) AS c2 FROM bg GROUP BY prev, cur),
        |c1 AS (SELECT prev, cast(sum(c2) as bigint) AS c1, count(*) AS n1prev
        |       FROM c2 GROUP BY prev),
        |cont AS (SELECT cur, count(*) AS n1cur FROM c2 GROUP BY cur),
        |bt AS (SELECT count(*) AS b FROM c2)
        |SELECT doc_id,
        |  round(cast(sum(cast(-ln(
        |    (c2.c2::double - 0.75) / c1.c1::double
        |    + (0.75 * c1.n1prev::double / c1.c1::double) * (cont.n1cur::double / bt.b::double)
        |  ) as decimal(28,12))) as double) / count(*), 4) AS mean_kn_surprisal,
        |  count(*) AS n_scored
        |FROM bg JOIN c2 USING (prev, cur) JOIN c1 USING (prev)
        |     JOIN cont USING (cur) CROSS JOIN bt
        |GROUP BY doc_id ORDER BY doc_id""".stripMargin,
    // same edge relation as the dedup_minhash_lsh oracle (exact
    // all-pairs Jaccard >= 0.8), then 10 unrolled PageRank iterations
    // mirroring the Spark expression tree step for step
    "graph_pagerank" -> graft.operators.Graph.pageRankOracleSql(
      s"""${jaccardPairsSql(0.8).replace("pairs AS (", "pairs AS MATERIALIZED (")},
         |ed AS MATERIALIZED (
         |       SELECT doc_a AS src, doc_b AS dst FROM pairs WHERE j >= 0.8
         |       UNION ALL
         |       SELECT doc_b AS src, doc_a AS dst FROM pairs WHERE j >= 0.8)""".stripMargin),
    // identical expression tree as the Spark side (same literals, same
    // associativity): every per-term score is the same IEEE double;
    // the per-doc sum runs in decimal on both engines
    "search_bm25" ->
      s"""WITH d AS (SELECT doc_id, string_split(rtrim(text), ' ') AS ws FROM documents),
         |dl AS (SELECT doc_id, len(ws) AS dl FROM d),
         |st AS (SELECT count(*) AS n, cast(sum(dl) AS bigint) AS sdl FROM dl),
         |w AS (SELECT doc_id, unnest(ws) AS w FROM d),
         |q(query_id, w) AS (VALUES ${graft.operators.Bm25.oracleValues(graft.operators.Bm25.defaultQueries)}),
         |tf AS (SELECT doc_id, w, count(*) AS tf FROM w
         |       WHERE w IN (SELECT w FROM q) GROUP BY 1, 2),
         |dfr AS (SELECT w, count(*) AS df FROM tf GROUP BY 1),
         |sc AS (SELECT q.query_id, tf.doc_id,
         |  cast(ln(1.0 + (st.n - dfr.df + 0.5) / (dfr.df + 0.5)) * (tf.tf * 2.2)
         |       / (tf.tf + 1.2 * (0.25 + 0.75 * dl.dl / (st.sdl / st.n)))
         |    AS decimal(28,12)) AS s
         |  FROM tf JOIN dfr USING (w) JOIN q USING (w) JOIN dl USING (doc_id) CROSS JOIN st),
         |agg AS (SELECT query_id, doc_id, cast(sum(s) AS double) AS score FROM sc GROUP BY 1, 2),
         |rk AS (SELECT query_id, doc_id, score,
         |       row_number() OVER (PARTITION BY query_id ORDER BY score DESC, doc_id) AS rnk
         |       FROM agg)
         |SELECT query_id, cast(rnk AS integer) AS rank, doc_id, score
         |FROM rk WHERE rnk <= 10 ORDER BY query_id, rnk""".stripMargin,
    // both arms mirrored term for term; fusion = two correctly-rounded
    // 1/(60+rank) divisions in fixed coalesce order; ties by doc_id
    "search_rrf" ->
      s"""WITH d AS (SELECT doc_id, string_split(rtrim(text), ' ') AS ws FROM documents),
         |dl AS (SELECT doc_id, len(ws) AS dl FROM d),
         |st AS (SELECT count(*) AS n, cast(sum(dl) AS bigint) AS sdl FROM dl),
         |w AS (SELECT doc_id, unnest(ws) AS w FROM d),
         |q(query_id, w) AS (VALUES ${graft.operators.Bm25.oracleValues(graft.operators.Bm25.defaultQueries)}),
         |tf AS (SELECT doc_id, w, count(*) AS tf FROM w
         |       WHERE w IN (SELECT w FROM q) GROUP BY 1, 2),
         |dfr AS (SELECT w, count(*) AS df FROM tf GROUP BY 1),
         |sc AS (SELECT q.query_id, tf.doc_id,
         |  cast(ln(1.0 + (st.n - dfr.df + 0.5) / (dfr.df + 0.5)) * (tf.tf * 2.2)
         |       / (tf.tf + 1.2 * (0.25 + 0.75 * dl.dl / (st.sdl / st.n)))
         |    AS decimal(28,12)) AS s
         |  FROM tf JOIN dfr USING (w) JOIN q USING (w) JOIN dl USING (doc_id) CROSS JOIN st),
         |agg AS (SELECT query_id, doc_id, cast(sum(s) AS double) AS score FROM sc GROUP BY 1, 2),
         |brk AS (SELECT query_id, doc_id,
         |        row_number() OVER (PARTITION BY query_id ORDER BY score DESC, doc_id) AS r1
         |        FROM agg),
         |b20 AS (SELECT * FROM brk WHERE r1 <= 20),
         |lex AS (SELECT q.query_id, tf.doc_id, count(*) AS nmatch,
         |        cast(sum(tf.tf) AS bigint) AS tfsum
         |        FROM tf JOIN q USING (w) GROUP BY 1, 2),
         |lrk AS (SELECT query_id, doc_id,
         |        row_number() OVER (PARTITION BY query_id
         |          ORDER BY nmatch * 1000000 + tfsum DESC, doc_id) AS r2
         |        FROM lex),
         |l20 AS (SELECT * FROM lrk WHERE r2 <= 20),
         |fu AS (SELECT coalesce(b.query_id, l.query_id) AS query_id,
         |       coalesce(b.doc_id, l.doc_id) AS doc_id,
         |       coalesce(1.0::double / (60 + b.r1), 0.0)
         |         + coalesce(1.0::double / (60 + l.r2), 0.0) AS rrf
         |       FROM b20 b FULL OUTER JOIN l20 l
         |         ON b.query_id = l.query_id AND b.doc_id = l.doc_id),
         |rk AS (SELECT query_id, doc_id, rrf,
         |       row_number() OVER (PARTITION BY query_id ORDER BY rrf DESC, doc_id) AS rnk
         |       FROM fu)
         |SELECT query_id, cast(rnk AS integer) AS rank, doc_id, round(rrf, 6) AS rrf_score
         |FROM rk WHERE rnk <= 10 ORDER BY query_id, rnk""".stripMargin,
    // same arithmetic as the Spark side: float division throughout
    // (DuckDB int/int is float division, matching Spark's Divide), and
    // the rule flags test the ROUNDED metrics
    "text_gopher" ->
      s"""WITH b AS (
         |  SELECT doc_id,
         |    cast(len(string_split(text, ' ')) as int) AS n_words,
         |    round((length(text) - len(string_split(text, ' ')) + 1)::double / len(string_split(text, ' ')), 4) AS mean_word_len,
         |    round(len(list_filter(string_split(text, ' '), w -> regexp_matches(w, '[A-Za-z]')))::double / len(string_split(text, ' ')), 4) AS alpha_word_frac,
         |    cast(len(list_filter(string_split(text, ' '), w -> w IN ($stopList))) as int) AS n_stopwords,
         |    round(((length(text) - length(replace(text, '#', ''))) + (length(text) - length(replace(text, '...', '')))/3)::double / len(string_split(text, ' ')), 4) AS symbol_word_ratio
         |  FROM documents)
         |SELECT doc_id, n_words, mean_word_len, alpha_word_frac, n_stopwords, symbol_word_ratio,
         |  n_words BETWEEN 50 AND 100000 AS pass_word_count,
         |  mean_word_len BETWEEN 3.0 AND 10.0 AS pass_mean_word_len,
         |  alpha_word_frac >= 0.8 AS pass_alpha_frac,
         |  n_stopwords >= 2 AS pass_stopwords,
         |  symbol_word_ratio <= 0.1 AS pass_symbol_ratio,
         |  (n_words BETWEEN 50 AND 100000) AND (mean_word_len BETWEEN 3.0 AND 10.0)
         |    AND alpha_word_frac >= 0.8 AND n_stopwords >= 2
         |    AND symbol_word_ratio <= 0.1 AS gopher_pass
         |FROM b ORDER BY doc_id""".stripMargin,
    // integer sums only (deterministic under any partial-agg order);
    // DuckDB sum() widens to hugeint -> cast back; vocabulary counted
    // on words here vs 8-byte fingerprints in Spark (2^-64 collision
    // trade, same as every fingerprint oracle in this file)
    "corpus_stats" ->
      """WITH t AS (
        |  SELECT lang, source, length(text) AS nc,
        |         len(string_split(rtrim(text), ' ')) AS nw,
        |         string_split(rtrim(text), ' ') AS w
        |  FROM documents),
        |tot AS (
        |  SELECT lang, source, count(*) AS n_docs,
        |         cast(sum(nc) as bigint) AS total_chars,
        |         cast(sum(nw) as bigint) AS total_words
        |  FROM t GROUP BY lang, source),
        |v AS (
        |  SELECT lang, source, count(DISTINCT u.word) AS distinct_words
        |  FROM t, unnest(w) AS u(word) GROUP BY lang, source)
        |SELECT tot.lang, tot.source, n_docs, total_chars, total_words,
        |       round(total_words::double / n_docs, 4) AS avg_doc_words,
        |       distinct_words
        |FROM tot JOIN v USING (lang, source) ORDER BY tot.lang, tot.source""".stripMargin,
    // exact KS: all cumulative counts are integers, each quotient one
    // correctly-rounded IEEE division -> bit-identical doubles, no
    // rounding step needed on either side
    "stats_ks_drift" ->
      """WITH per AS (
        |  SELECT source AS grp, n_chars AS v, count(*)::bigint AS c
        |  FROM documents GROUP BY 1, 2),
        |tot AS (SELECT grp, sum(c)::bigint AS n FROM per GROUP BY grp),
        |gv AS (SELECT v, sum(c)::bigint AS gc FROM per GROUP BY v),
        |gcum AS (SELECT v, sum(gc) OVER (ORDER BY v)::bigint AS gcum FROM gv),
        |gtot AS (SELECT sum(c)::bigint AS g FROM per),
        |grid AS (SELECT t.grp, gc.v, gc.gcum
        |         FROM (SELECT DISTINCT grp FROM per) t CROSS JOIN gcum gc),
        |ecdf AS (
        |  SELECT grid.grp, grid.v, grid.gcum,
        |         sum(coalesce(per.c, 0)) OVER (PARTITION BY grid.grp ORDER BY grid.v)::bigint AS cs
        |  FROM grid LEFT JOIN per ON per.grp = grid.grp AND per.v = grid.v)
        |SELECT ecdf.grp AS source, tot.n AS n,
        |       max(abs(ecdf.cs::double / tot.n::double - ecdf.gcum::double / gtot.g::double)) AS ks
        |FROM ecdf, gtot, tot WHERE tot.grp = ecdf.grp
        |GROUP BY 1, 2 ORDER BY 1""".stripMargin,
    // shard = portable md5 bucket; within-shard order = full md5 hex
    // (lowercase-hex string compare agrees between engines)
    "data_shuffle" ->
      """SELECT doc_id, shard,
        |  cast(row_number() OVER (PARTITION BY shard ORDER BY md5(cast(doc_id as varchar))) - 1 as bigint) AS shard_pos
        |FROM (SELECT doc_id,
        |        mod(('0x' || substr(md5(cast(doc_id as varchar)), 1, 8))::bigint, 16) AS shard
        |      FROM documents)
        |ORDER BY doc_id""".stripMargin,
    // positional windows (0-based; whole-text window for docs <= 5
    // words, the kernel's short-doc rule); dup counts ALL occurrences
    // (within-doc repeats included); covered word positions beyond the
    // doc end are harmless (they match no word row)
    "dedup_span_removal" ->
      """WITH w AS (SELECT doc_id, string_split(rtrim(text), ' ') AS w FROM documents),
        |win AS (
        |  SELECT doc_id, 0 AS pos, array_to_string(w, ' ') AS gram FROM w WHERE len(w) <= 5
        |  UNION ALL
        |  SELECT doc_id, u.i - 1 AS pos, array_to_string(w[u.i:u.i+4], ' ') AS gram
        |  FROM w, unnest(range(1, len(w) - 3)) AS u(i) WHERE len(w) > 5),
        |dup AS (SELECT gram FROM win GROUP BY gram HAVING count(*) > 1),
        |cov AS (SELECT DISTINCT win.doc_id, c.p
        |        FROM win JOIN dup USING (gram), unnest(range(win.pos, win.pos + 5)) AS c(p)),
        |words AS (SELECT doc_id, u.i - 1 AS wp, w[u.i] AS word
        |          FROM w, unnest(range(1, len(w) + 1)) AS u(i)),
        |kept AS (SELECT words.* FROM words
        |         WHERE NOT EXISTS (SELECT 1 FROM cov WHERE cov.doc_id = words.doc_id AND cov.p = words.wp)),
        |agg AS (SELECT doc_id, count(*) AS n_kept,
        |               md5(string_agg(word, ' ' ORDER BY wp)) AS cleaned_md5
        |        FROM kept GROUP BY doc_id)
        |SELECT w.doc_id, cast(len(w.w) as int) AS n_words,
        |       cast(len(w.w) - coalesce(agg.n_kept, 0) as int) AS n_removed,
        |       coalesce(agg.cleaned_md5, md5('')) AS cleaned_md5
        |FROM w LEFT JOIN agg USING (doc_id) ORDER BY w.doc_id""".stripMargin,
    // the three verified stages chained: normalized token counts,
    // per-lang p10 floor, budget prefix
    "pipeline_curate" ->
      s"""WITH n AS (
         |  SELECT doc_id, lang, text,
         |         trim(regexp_replace(regexp_replace(lower(text), '[.,!?;:]', '', 'g'), '\\s+', ' ', 'g')) AS norm
         |  FROM documents),
         |q AS (
         |  SELECT doc_id, lang, round(least(1.0,
         |    len(list_distinct(string_split(text, ' ')))::double / len(string_split(text, ' ')) * 0.5 +
         |    CASE WHEN len(string_split(text, ' ')) BETWEEN 20 AND 1000 THEN 0.3 ELSE 0.0 END +
         |    CASE WHEN len(list_filter(string_split(text, ' '), w -> w IN ($stopList)))::double / len(string_split(text, ' ')) > 0.02 THEN 0.2 ELSE 0.0 END), 4) AS quality_score,
         |    len(string_split(norm, ' ')) AS ntok
         |  FROM n),
         |t AS (SELECT lang, round(quantile_cont(quality_score, 0.1), 4) AS p10
         |      FROM q GROUP BY lang),
         |f AS (SELECT q.* FROM q JOIN t USING (lang) WHERE q.quality_score >= t.p10),
         |c AS (SELECT *, sum(ntok) OVER (ORDER BY quality_score DESC, doc_id) AS cum FROM f)
         |SELECT doc_id, quality_score, cast(ntok as bigint) AS n_tokens,
         |       cast(cum as bigint) AS cum_tokens
         |FROM c WHERE cum <= 15000 ORDER BY doc_id""".stripMargin,
    // Spark percentile() and DuckDB quantile_cont share the p*(n-1)
    // interpolation (established by quality_quantiles)
    "quality_floor" ->
      s"""WITH q AS (
         |  SELECT doc_id, lang, round(least(1.0,
         |    len(list_distinct(string_split(text, ' ')))::double / len(string_split(text, ' ')) * 0.5 +
         |    CASE WHEN len(string_split(text, ' ')) BETWEEN 20 AND 1000 THEN 0.3 ELSE 0.0 END +
         |    CASE WHEN len(list_filter(string_split(text, ' '), w -> w IN ($stopList)))::double / len(string_split(text, ' ')) > 0.02 THEN 0.2 ELSE 0.0 END), 4) AS quality_score
         |  FROM documents),
         |t AS (SELECT lang, round(quantile_cont(quality_score, 0.1), 4) AS p10_quality
         |      FROM q GROUP BY lang)
         |SELECT q.doc_id, q.lang, q.quality_score, t.p10_quality
         |FROM q JOIN t USING (lang)
         |WHERE q.quality_score >= t.p10_quality
         |ORDER BY q.doc_id""".stripMargin,
    "text_normalize" ->
      """WITH n AS (
        |  SELECT doc_id, text,
        |         trim(regexp_replace(regexp_replace(lower(text), '[.,!?;:]', '', 'g'), '\s+', ' ', 'g')) AS norm
        |  FROM documents)
        |SELECT doc_id, cast(length(text) as int) AS n_chars_raw,
        |       cast(length(norm) as int) AS n_chars_norm, md5(norm) AS norm_md5
        |FROM n ORDER BY doc_id""".stripMargin,
    // char-granularity ExactSubstr: duplicated 20-char windows (the
    // oracle groups RAW substrings — the Spark side's rolling hashes
    // must be collision-free on the corpus to match, which 64 bits are)
    "dedup_span_chars" ->
      """WITH base AS (SELECT doc_id, rtrim(text) AS t FROM documents),
        |win AS (SELECT doc_id, u.i AS pos, substr(t, u.i + 1, 20) AS w
        |        FROM base, unnest(range(0, length(t) - 19)) AS u(i)),
        |dup AS (SELECT w FROM win GROUP BY w HAVING count(*) > 1),
        |cov AS (SELECT DISTINCT win.doc_id, c.p
        |        FROM win JOIN dup USING (w), unnest(range(win.pos, win.pos + 20)) AS c(p)),
        |chars AS (SELECT doc_id, u.i AS cp, substr(t, u.i + 1, 1) AS ch
        |          FROM base, unnest(range(0, length(t))) AS u(i)),
        |kept AS (SELECT chars.* FROM chars
        |         WHERE NOT EXISTS (SELECT 1 FROM cov WHERE cov.doc_id = chars.doc_id AND cov.p = chars.cp)),
        |agg AS (SELECT doc_id, count(*) AS n_kept,
        |               md5(string_agg(ch, '' ORDER BY cp)) AS cleaned_md5
        |        FROM kept GROUP BY doc_id)
        |SELECT b.doc_id, cast(length(b.t) as int) AS n_chars,
        |       cast(length(b.t) - coalesce(agg.n_kept, 0) as int) AS n_chars_removed,
        |       coalesce(agg.cleaned_md5, md5('')) AS cleaned_md5
        |FROM base b LEFT JOIN agg USING (doc_id) ORDER BY b.doc_id""".stripMargin,
    // corpus-wide duplicated word-5-gram windows; per-doc-distinct by
    // the shingle construction, so count(*) > 1 == "in >1 document"
    "dedup_span_exact" ->
      s"""WITH sh AS (
         |  SELECT doc_id, ${shingleListSql(5)} AS s
         |  FROM (SELECT doc_id, string_split(rtrim(text), ' ') AS w FROM documents)),
         |g AS (SELECT doc_id, unnest(s) AS gram FROM sh),
         |dup AS (SELECT gram FROM g GROUP BY gram HAVING count(*) > 1),
         |pd AS (SELECT doc_id, count(*) AS n_dup FROM g JOIN dup USING (gram) GROUP BY doc_id)
         |SELECT sh.doc_id, cast(len(sh.s) as int) AS n_spans,
         |       cast(coalesce(pd.n_dup, 0) as bigint) AS n_dup_spans,
         |       round(coalesce(pd.n_dup, 0)::double / len(sh.s), 4) AS dup_span_frac
         |FROM sh LEFT JOIN pd USING (doc_id) ORDER BY sh.doc_id""".stripMargin,
    // mixture resampling: epochs from range(ceil(rate)); the fractional
    // copy keeps iff md5(id#epoch) bucket < frac*granularity — BOTH
    // engines compute the identical double threshold from the same
    // literals, so binary-fraction artifacts (0.4*10000) cancel
    "data_mix" ->
      """WITH r AS (
        |  SELECT doc_id, source,
        |    CASE WHEN source IN ('src0', 'src1') THEN 2.5
        |         WHEN source IN ('src2', 'src3') THEN 1.0
        |         ELSE 0.4 END AS rate
        |  FROM documents),
        |e AS (SELECT doc_id, source, rate, u.e AS epoch
        |      FROM r, unnest(range(0, greatest(cast(ceil(rate) as bigint), 1))) AS u(e))
        |SELECT doc_id, source, epoch FROM e
        |WHERE epoch < floor(rate)
        |   OR mod(('0x' || substr(md5(doc_id::varchar || '#' || epoch::varchar), 1, 8))::bigint, 10000) < (rate - floor(rate)) * 10000
        |ORDER BY doc_id, epoch""".stripMargin,
    // portable md5-hex bucketing — DuckDB mirrors Spark's conv() with
    // ('0x' || hex)::bigint; mod == pmod here (buckets are positive)
    "data_split" ->
      """SELECT doc_id,
        | CASE WHEN mod(('0x' || substr(md5(cast(doc_id as varchar)), 1, 8))::bigint, 100) < 80 THEN 'train'
        |      WHEN mod(('0x' || substr(md5(cast(doc_id as varchar)), 1, 8))::bigint, 100) < 90 THEN 'val'
        |      ELSE 'test' END AS split
        |FROM documents ORDER BY doc_id""".stripMargin,
    "sample_stratified" ->
      """SELECT lang, doc_id FROM (
        |  SELECT lang, doc_id,
        |         row_number() OVER (PARTITION BY lang ORDER BY md5(cast(doc_id as varchar))) AS r,
        |         count(*) OVER (PARTITION BY lang) AS n
        |  FROM documents)
        |WHERE r <= ceil(n * 0.2) ORDER BY lang, doc_id""".stripMargin,
    // the verified text_surprisal arithmetic + a deterministic ntile
    // (doc_id tie-break); head = lowest mean surprisal per language
    "text_ccnet_bucket" ->
      """WITH w AS (
        |  SELECT doc_id, u.word AS word
        |  FROM documents, unnest(string_split(rtrim(text), ' ')) AS u(word)),
        |c AS (SELECT word, count(*) AS c FROM w GROUP BY word),
        |n AS (SELECT count(*) AS n FROM w),
        |s AS (
        |  SELECT doc_id,
        |    round(cast(sum(cast(-ln(c.c::double / n.n) as decimal(28,12))) as double) / count(*), 4) AS mean_surprisal
        |  FROM w JOIN c USING (word) CROSS JOIN n
        |  GROUP BY doc_id),
        |t AS (
        |  SELECT s.doc_id, d.lang, s.mean_surprisal,
        |         ntile(3) OVER (PARTITION BY d.lang ORDER BY s.mean_surprisal, s.doc_id) AS t
        |  FROM s JOIN documents d USING (doc_id))
        |SELECT doc_id, lang, mean_surprisal,
        |       CASE t WHEN 1 THEN 'head' WHEN 2 THEN 'middle' ELSE 'tail' END AS ccnet_bucket
        |FROM t ORDER BY doc_id""".stripMargin,
    // decimal-summed so partial-agg order can't move the 4th decimal;
    // ln() per distinct (word,corpus) value is deterministic
    "text_surprisal" ->
      """WITH w AS (
        |  SELECT doc_id, u.word AS word
        |  FROM documents, unnest(string_split(rtrim(text), ' ')) AS u(word)),
        |c AS (SELECT word, count(*) AS c FROM w GROUP BY word),
        |n AS (SELECT count(*) AS n FROM w)
        |SELECT doc_id,
        |  round(cast(sum(cast(-ln(c.c::double / n.n) as decimal(28,12))) as double) / count(*), 4) AS mean_surprisal,
        |  count(*) AS n_scored
        |FROM w JOIN c USING (word) CROSS JOIN n
        |GROUP BY doc_id ORDER BY doc_id""".stripMargin,
    // P(cur|prev) = c(prev,cur)/c(prev·); prefix counts derive from
    // the bigram histogram on both sides; decimal-summed like
    // text_surprisal
    "text_bigram_surprisal" ->
      """WITH w AS (SELECT doc_id, string_split(rtrim(text), ' ') AS w FROM documents),
        |bg AS (
        |  SELECT doc_id, w[u.i] AS prev, w[u.i+1] AS cur
        |  FROM w, unnest(range(1, len(w))) AS u(i)),
        |c2 AS (SELECT prev, cur, count(*) AS c2 FROM bg GROUP BY prev, cur),
        |c1 AS (SELECT prev, cast(sum(c2) as bigint) AS c1 FROM c2 GROUP BY prev)
        |SELECT doc_id,
        |  round(cast(sum(cast(-ln(c2.c2::double / c1.c1) as decimal(28,12))) as double) / count(*), 4) AS mean_bigram_surprisal,
        |  count(*) AS n_scored
        |FROM bg JOIN c2 USING (prev, cur) JOIN c1 USING (prev)
        |GROUP BY doc_id ORDER BY doc_id""".stripMargin,
    // same shingle construction as jaccardPairsSql, k=2/3; top-word
    // coverage from a per-(doc,word) histogram
    "text_repetition" ->
      s"""WITH arr AS (
        |  SELECT doc_id,
        |    round(1.0 - len(${shingleListSql(2)})::double / (len(w) - 1), 4) AS dup_bigram_frac,
        |    round(1.0 - len(${shingleListSql(3)})::double / (len(w) - 2), 4) AS dup_trigram_frac
        |  FROM (SELECT doc_id, string_split(rtrim(text), ' ') AS w FROM documents)),
        |tw AS (
        |  SELECT doc_id, round(max(c)::double / cast(sum(c) as bigint), 4) AS top_word_frac
        |  FROM (SELECT doc_id, u.word AS word, count(*) AS c
        |        FROM documents, unnest(string_split(rtrim(text), ' ')) AS u(word)
        |        GROUP BY doc_id, u.word)
        |  GROUP BY doc_id)
        |SELECT arr.doc_id, dup_bigram_frac, dup_trigram_frac, top_word_frac,
        |       (dup_bigram_frac > 0.2 OR dup_trigram_frac > 0.15 OR top_word_frac > 0.2) AS repetition_flag
        |FROM arr JOIN tw USING (doc_id) ORDER BY arr.doc_id""".stripMargin,
    // word-5-grams (distinct per doc, same construction as the k=3
    // shingles above); eval set = md5 bucket >= 98
    "contamination_check" -> contaminationOracle,
    // drained stream ≡ batch: the SAME oracle gates both entries
    "contamination_stream" -> contaminationOracle,
    // concatenate-and-chop packing: 8 hash streams, 512-token windows
    "data_pack" ->
      """SELECT doc_id, bucket AS pack_bucket,
        |       start // 512 AS pack_bin,
        |       start % 512 AS pack_offset
        |FROM (
        |  SELECT doc_id, bucket,
        |         cast(coalesce(sum(t) OVER (PARTITION BY bucket ORDER BY doc_id
        |           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) as bigint) AS start
        |  FROM (SELECT doc_id,
        |          mod(('0x' || substr(md5(cast(doc_id as varchar)), 1, 8))::bigint, 8) AS bucket,
        |          len(string_split_regex(text, '\s+')) AS t
        |        FROM documents))
        |ORDER BY doc_id""".stripMargin,
    "dedup_minhash_lsh" ->
      s"""${jaccardPairsSql(0.8)}
         |SELECT doc_a, doc_b, round(j, 4) AS jaccard FROM pairs WHERE j >= 0.8 ORDER BY doc_a, doc_b""".stripMargin,
    // curve: integer powers as explicit multiplication chains (pow()
    // is not exactly rounded); observed mass buckets the 4-dp exact
    // Jaccard with the identical double ops on both engines
    "dedup_lsh_tuning" ->
      s"""${jaccardPairsSql(0.5).replace(
            "FROM (SELECT doc_id, string_split(rtrim(text), ' ') AS w FROM documents)\n),",
            "FROM (SELECT doc_id, string_split(rtrim(text), ' ') AS w FROM documents)\n" +
              "  WHERE mod(('0x' || substr(list_aggregate(list_transform(" +
              shingleListSql(3) +
              ", x -> md5(x)), 'min'), 1, 8))::bigint, 10) < 2\n),")},
         |obs AS (
         |  SELECT least(floor(round(j, 4) * 20) / 20, 0.95::double) AS j_lo,
         |         count(*) AS n_pairs
         |  FROM pairs WHERE j >= 0.5 GROUP BY 1),
         |curve AS (
         |  SELECT cast(j_lo as double) AS j_lo FROM (VALUES (0.50),(0.55),(0.60),
         |    (0.65),(0.70),(0.75),(0.80),(0.85),(0.90),(0.95)) v(j_lo)),
         |c2 AS (SELECT j_lo, j_lo*j_lo*j_lo*j_lo AS pb FROM curve),
         |c3 AS (SELECT j_lo, pb, (1.0 - pb) * (1.0 - pb) AS y2 FROM c2),
         |c4 AS (SELECT j_lo, pb, y2*y2 AS y4 FROM c3),
         |c5 AS (SELECT j_lo, pb, y4*y4 AS y8 FROM c4)
         |SELECT c5.j_lo, round(pb, 6) AS p_band, round(1.0 - y8*y8, 6) AS p_detect_16x4,
         |       coalesce(obs.n_pairs, 0) AS n_pairs
         |FROM c5 LEFT JOIN obs ON obs.j_lo = c5.j_lo
         |ORDER BY c5.j_lo""".stripMargin,
    "dedup_ngram_jaccard" ->
      s"""${jaccardPairsSql(0.7)}
         |SELECT doc_a, doc_b, round(j, 4) AS jaccard FROM pairs WHERE j >= 0.7 ORDER BY doc_a, doc_b""".stripMargin,
    // the drained incremental stream must equal the batch operator
    "dedup_stream_minhash" ->
      s"""${jaccardPairsSql(0.8)}
         |SELECT doc_a, doc_b, round(j, 4) AS jaccard FROM pairs WHERE j >= 0.8 ORDER BY doc_a, doc_b""".stripMargin,
    // Connected components of the J>=0.8 near-dup graph via transitive
    // closure (recursive CTE), keep the min id per component: an
    // independent re-derivation of resolveComponents' fixpoint.
    "dedup_resolve" ->
      s"""$componentClosureSql
         |SELECT doc_id FROM documents
         |WHERE doc_id NOT IN (
         |  SELECT node FROM reach GROUP BY node HAVING min(r) < node)
         |ORDER BY doc_id""".stripMargin,
    // same closure as dedup_resolve, but emitting the component map:
    // family = min id reachable (including self)
    "dedup_families" ->
      s"""$componentClosureSql
         |SELECT node AS doc_id, least(node, min(r)) AS family_id
         |FROM reach GROUP BY node ORDER BY doc_id""".stripMargin,
    // soft-dedup weights on the same closure: 1/|family|, singletons 1.0;
    // the raw double division is bit-identical on both engines
    "dedup_weights" ->
      s"""$componentClosureSql,
         |fam AS (SELECT node AS doc_id, least(node, min(r)) AS family_id
         |        FROM reach GROUP BY node),
         |sizes AS (SELECT family_id, count(*) AS fs FROM fam GROUP BY 1)
         |SELECT d.doc_id, coalesce(f.family_id, d.doc_id) AS family_id,
         |       coalesce(s.fs, 1)::bigint AS family_size,
         |       1.0::double / coalesce(s.fs, 1) AS train_weight
         |FROM documents d LEFT JOIN fam f USING (doc_id)
         |LEFT JOIN sizes s ON f.family_id = s.family_id
         |ORDER BY d.doc_id""".stripMargin,
    // survivor = argmax(quality, tie -> min id) per family; the family
    // closure and the quality formula are the already-verified oracles
    "dedup_keep_best" ->
      s"""$componentClosureSql,
         |fam AS (SELECT node AS doc_id, least(node, min(r)) AS family_id
         |        FROM reach GROUP BY node),
         |q AS (
         |  SELECT doc_id, round(least(1.0,
         |    len(list_distinct(string_split(text, ' ')))::double / len(string_split(text, ' ')) * 0.5 +
         |    CASE WHEN len(string_split(text, ' ')) BETWEEN 20 AND 1000 THEN 0.3 ELSE 0.0 END +
         |    CASE WHEN len(list_filter(string_split(text, ' '), w -> w IN ($stopList)))::double / len(string_split(text, ' ')) > 0.02 THEN 0.2 ELSE 0.0 END), 4) AS qs
         |  FROM documents),
         |j AS (SELECT fam.family_id, fam.doc_id, q.qs FROM fam JOIN q USING (doc_id)),
         |rk AS (SELECT family_id, doc_id, qs,
         |              row_number() OVER (PARTITION BY family_id ORDER BY qs DESC, doc_id) AS rn
         |       FROM j),
         |cnt AS (SELECT family_id, count(*) AS n_members FROM j GROUP BY family_id)
         |SELECT r.family_id, cnt.n_members, r.doc_id AS kept_doc, r.qs AS best_quality
         |FROM rk r JOIN cnt USING (family_id)
         |WHERE r.rn = 1 ORDER BY r.family_id""".stripMargin,
    // exact (quality desc, doc_id) running-total prefix at 20k tokens;
    // the naive window here IS the ground truth the bucketed Spark
    // two-phase must reproduce exactly
    "data_budget_select" ->
      s"""WITH t AS (
         |  SELECT doc_id, round(least(1.0,
         |    len(list_distinct(string_split(text, ' ')))::double / len(string_split(text, ' ')) * 0.5 +
         |    CASE WHEN len(string_split(text, ' ')) BETWEEN 20 AND 1000 THEN 0.3 ELSE 0.0 END +
         |    CASE WHEN len(list_filter(string_split(text, ' '), w -> w IN ($stopList)))::double / len(string_split(text, ' ')) > 0.02 THEN 0.2 ELSE 0.0 END), 4) AS quality_score,
         |    len(string_split(text, ' ')) AS n_tokens
         |  FROM documents),
         |c AS (SELECT *, sum(n_tokens) OVER (ORDER BY quality_score DESC, doc_id) AS cum FROM t)
         |SELECT doc_id, quality_score, cast(n_tokens as bigint) AS n_tokens,
         |       cast(cum as bigint) AS cum_tokens
         |FROM c WHERE cum <= 20000 ORDER BY doc_id""".stripMargin,
    // cross-side pairs only: corpus (bucket < 90) x incoming (>= 90);
    // same exact-Jaccard ground truth as dedup_minhash_lsh
    "dedup_cross_corpus" ->
      s"""WITH sh AS (
         |  SELECT doc_id,
         |         mod(('0x' || substr(md5(cast(doc_id as varchar)), 1, 8))::bigint, 100) >= 90 AS is_new,
         |         ${shingleListSql(3)} AS s
         |  FROM (SELECT doc_id, string_split(rtrim(text), ' ') AS w FROM documents)),
         |sz AS (SELECT doc_id, is_new, len(s) AS n FROM sh),
         |e AS (SELECT doc_id, is_new, unnest(s) AS g FROM sh),
         |inter AS (
         |  SELECT a.doc_id AS corpus_doc, b.doc_id AS new_doc, count(*) AS i
         |  FROM e a JOIN e b ON a.g = b.g AND NOT a.is_new AND b.is_new
         |  GROUP BY 1, 2)
         |SELECT corpus_doc, new_doc,
         |       round(i::double / (sa.n + sb.n - i), 4) AS jaccard
         |FROM inter JOIN sz sa ON sa.doc_id = corpus_doc JOIN sz sb ON sb.doc_id = new_doc
         |WHERE i::double / (sa.n + sb.n - i) >= 0.8
         |ORDER BY corpus_doc, new_doc""".stripMargin,
    // snapshot diff: statuses from the modular old/new definitions;
    // the added_near_dup arm's ground truth is exact all-pairs Jaccard
    // between added and retained docs (same convention as
    // dedup_cross_corpus — Spark compares md5 digests, the oracle
    // compares texts; identical up to a 2^-128 collision). The
    // streaming twin drains to the SAME rows — one oracle for both.
    "corpus_delta" -> corpusDeltaOracle,
    "corpus_delta_stream" -> corpusDeltaOracle,
    // exact linear-interpolation percentiles: Spark percentile() and
    // DuckDB quantile_cont share the p*(n-1) interpolation definition;
    // the interpolated score quantiles run over the ROUNDED 4-decimal
    // scores on both sides
    "quality_quantiles" ->
      s"""WITH q AS (
         |  SELECT lang, len(string_split(text, ' ')) AS nw,
         |    round(least(1.0,
         |      len(list_distinct(string_split(text, ' ')))::double / len(string_split(text, ' ')) * 0.5 +
         |      CASE WHEN len(string_split(text, ' ')) BETWEEN 20 AND 1000 THEN 0.3 ELSE 0.0 END +
         |      CASE WHEN len(list_filter(string_split(text, ' '), w -> w IN ($stopList)))::double / len(string_split(text, ' ')) > 0.02 THEN 0.2 ELSE 0.0 END), 4) AS qs
         |  FROM documents)
         |SELECT lang, count(*) AS n_docs,
         |  round(quantile_cont(nw, 0.25), 4) AS p25_words,
         |  round(quantile_cont(nw, 0.5), 4) AS p50_words,
         |  round(quantile_cont(nw, 0.75), 4) AS p75_words,
         |  round(quantile_cont(nw, 0.9), 4) AS p90_words,
         |  round(quantile_cont(qs, 0.5), 4) AS p50_quality,
         |  round(quantile_cont(qs, 0.9), 4) AS p90_quality
         |FROM q GROUP BY lang ORDER BY lang""".stripMargin,
    // exact percentiles hash-checked as in quality_quantiles; the
    // sketch-within-tolerance assertion is computed Spark-side and
    // pinned to `true` here — an out-of-tolerance sketch hash-fails
    "quality_quantiles_approx" ->
      s"""WITH q AS (
         |  SELECT lang, len(string_split(text, ' ')) AS nw,
         |    round(least(1.0,
         |      len(list_distinct(string_split(text, ' ')))::double / len(string_split(text, ' ')) * 0.5 +
         |      CASE WHEN len(string_split(text, ' ')) BETWEEN 20 AND 1000 THEN 0.3 ELSE 0.0 END +
         |      CASE WHEN len(list_filter(string_split(text, ' '), w -> w IN ($stopList)))::double / len(string_split(text, ' ')) > 0.02 THEN 0.2 ELSE 0.0 END), 4) AS qs
         |  FROM documents)
         |SELECT lang, count(*) AS n_docs,
         |  round(quantile_cont(nw, 0.5), 4) AS p50_words,
         |  round(quantile_cont(nw, 0.9), 4) AS p90_words,
         |  round(quantile_cont(qs, 0.5), 4) AS p50_quality,
         |  round(quantile_cont(qs, 0.9), 4) AS p90_quality,
         |  true AS approx_ok
         |FROM q GROUP BY lang ORDER BY lang""".stripMargin,
    "dedup_simhash" -> fixtureSql("dedup_simhash", "documents"),
    "text_langid" -> fixtureSql("text_langid", "documents"),
    "text_fingerprint" -> fixtureSql("text_fingerprint", "documents"),
    "text_entropy" -> fixtureSql("text_entropy", "documents"),
    "mm_phash_dedup" -> fixtureSql("mm_phash_dedup", "documents"),
    "mm_audio_dedup" -> fixtureSql("mm_audio_dedup", "documents"),
    "mm_video_dedup" -> fixtureSql("mm_video_dedup", "documents"),
    "mm_video_frame_sample" -> fixtureSql("mm_video_frame_sample", "documents"),
    "text_tfidf" -> fixtureSql("text_tfidf", "documents"),
    "sim_topk_bruteforce" -> fixtureSql("sim_topk_bruteforce", "embeddings"),
    "emb_pca" -> fixtureSql("emb_pca", "embeddings"),
    "sim_topk_lsh" -> fixtureSql("sim_topk_lsh", "embeddings"),
    "sim_topk_ivf" -> fixtureSql("sim_topk_ivf", "embeddings"),
    "sim_topk_pq" -> fixtureSql("sim_topk_pq", "embeddings"),
    "sim_topk_sq8" -> fixtureSql("sim_topk_sq8", "embeddings"),
    "sim_topk_opq" -> fixtureSql("sim_topk_opq", "embeddings"),
    "sim_topk_ivfpq" -> fixtureSql("sim_topk_ivfpq", "embeddings"),
    "dedup_embed_cosine" -> fixtureSql("dedup_embed_cosine", "embeddings"),
    "dedup_embed_cosine_mt" -> fixtureSql("dedup_embed_cosine_mt", "embeddings"),
    "dedup_semantic" -> fixtureSql("dedup_semantic", "embeddings"),
    "emb_kmeans" -> fixtureSql("emb_kmeans", "embeddings"),
    "data_prune_prototypes" -> fixtureSql("data_prune_prototypes", "embeddings"),
    "bpe_train" -> fixtureSql("bpe_train", "documents"),
    "bpe_token_count" -> fixtureSql("bpe_token_count", "documents"),
    "bpe_pack_ids" -> fixtureSql("bpe_pack_ids", "documents"),
    "dsir_importance" -> fixtureSql("dsir_importance", "documents"),
    "contamination_bloom" -> fixtureSql("contamination_bloom", "documents"),
    "quality_classifier" -> fixtureSql("quality_classifier", "documents"),
    // exact all-ordered-pairs containment — an INDEPENDENT ground
    // truth (the op's prefix blocking has provably exact recall, so
    // the sets must match bit-for-bit). Exploded equality-join form:
    // a zero-intersection pair has containment 0 and can never pass
    // the 0.9 threshold, so co-shingle pairs are exhaustive; the
    // |B| >= 0.9|A| filter is the same necessary condition as before.
    "dedup_containment" ->
      s"""WITH sh AS (
         |  SELECT doc_id, ${shingleListSql(3)} AS s
         |  FROM (SELECT doc_id, string_split(rtrim(text), ' ') AS w FROM documents)
         |),
         |sz AS (SELECT doc_id, len(s) AS n FROM sh),
         |e AS (SELECT doc_id, unnest(s) AS g FROM sh),
         |inter AS (
         |  SELECT a.doc_id AS doc_src, b.doc_id AS doc_dst, count(*) AS i
         |  FROM e a JOIN e b ON a.g = b.g AND a.doc_id != b.doc_id
         |  GROUP BY 1, 2)
         |SELECT doc_src, doc_dst,
         |       round(i::double / sa.n, 4) AS containment
         |FROM inter JOIN sz sa ON sa.doc_id = doc_src JOIN sz sb ON sb.doc_id = doc_dst
         |WHERE sb.n::double >= 0.9 * sa.n AND i::double / sa.n >= 0.9
         |ORDER BY doc_src, doc_dst""".stripMargin,
    "text_token_count" ->
      """SELECT doc_id,
        | cast(len(string_split_regex(text, '\s+')) as int) AS n_ws_tokens,
        | cast(len(regexp_extract_all(text, '[A-Za-z0-9_]+|[^A-Za-z0-9_\s]')) as int) AS n_bpe_tokens
        |FROM documents ORDER BY doc_id""".stripMargin,
    "text_quality" ->
      s"""SELECT doc_id,
         | cast(length(text) as int) AS n_chars,
         | cast(len(string_split(text, ' ')) as int) AS n_words,
         | round((length(text) - len(string_split(text, ' ')) + 1)::double / len(string_split(text, ' ')), 4) AS mean_word_len,
         | round((length(text) - length(regexp_replace(text, '[.,!?;:]', '', 'g')))::double / length(text), 4) AS punct_ratio,
         | round(len(list_filter(string_split(text, ' '), w -> w IN ($stopList)))::double / len(string_split(text, ' ')), 4) AS stop_ratio,
         | round(len(list_distinct(string_split(text, ' ')))::double / len(string_split(text, ' ')), 4) AS distinct_ratio,
         | round(least(1.0,
         |   len(list_distinct(string_split(text, ' ')))::double / len(string_split(text, ' ')) * 0.5 +
         |   CASE WHEN len(string_split(text, ' ')) BETWEEN 20 AND 1000 THEN 0.3 ELSE 0.0 END +
         |   CASE WHEN len(list_filter(string_split(text, ' '), w -> w IN ($stopList)))::double / len(string_split(text, ' ')) > 0.02 THEN 0.2 ELSE 0.0 END), 4) AS quality_score
         |FROM documents ORDER BY doc_id""".stripMargin,
    "text_redact" ->
      """WITH s0 AS (SELECT doc_id, text AS t0 FROM documents),
        |s1 AS (SELECT doc_id, t0,
        |  regexp_replace(t0, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}', '<EMAIL>', 'g') AS t1 FROM s0),
        |s2 AS (SELECT doc_id, t0, t1,
        |  regexp_replace(t1, 'https?://[^ ]+', '<URL>', 'g') AS t2 FROM s1),
        |s3 AS (SELECT doc_id, t0, t1, t2,
        |  regexp_replace(t2, '([0-9]{1,3}\.){3}[0-9]{1,3}', '<IP>', 'g') AS t3 FROM s2)
        |SELECT doc_id,
        | md5(regexp_replace(t3, '\+?[0-9][0-9()\- ]{7,}[0-9]', '<PHONE>', 'g')) AS redacted_md5,
        | cast(len(regexp_extract_all(t0, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}')) as int) AS n_email,
        | cast(len(regexp_extract_all(t1, 'https?://[^ ]+')) as int) AS n_url,
        | cast(len(regexp_extract_all(t2, '([0-9]{1,3}\.){3}[0-9]{1,3}')) as int) AS n_ipv4,
        | cast(len(regexp_extract_all(t3, '\+?[0-9][0-9()\- ]{7,}[0-9]')) as int) AS n_phone
        |FROM s3 ORDER BY doc_id""".stripMargin,
    "text_heavy_hitters" ->
      """SELECT u.word, count(*) AS cnt
        |FROM documents, unnest(string_split(text, ' ')) AS u(word)
        |GROUP BY u.word ORDER BY cnt DESC, u.word LIMIT 15""".stripMargin,
    // the streamed sketch drains to the identical exact top-15
    "text_heavy_hitters_stream" ->
      """SELECT u.word, count(*) AS cnt
        |FROM documents, unnest(string_split(text, ' ')) AS u(word)
        |GROUP BY u.word ORDER BY cnt DESC, u.word LIMIT 15""".stripMargin,
    // sqrt weights (correctly-rounded IEEE), decimal weight sum, rate
    // round 6; copy assignment = the data_mix md5 gate keyed by lang rate
    "data_temperature" ->
      """WITH c AS (SELECT lang, count(*)::bigint AS nl FROM documents GROUP BY 1),
        |w AS (SELECT lang, nl, cast(sqrt(nl::double) as decimal(28,12)) AS wl FROM c),
        |s AS (SELECT cast(sum(wl) as double) AS sw, cast(sum(nl) as bigint) AS n FROM w),
        |r AS (SELECT lang, round(s.n::double * (wl::double / s.sw) / nl::double, 6) AS rate
        |      FROM w CROSS JOIN s),
        |e AS (SELECT doc_id, d.lang, rate, u.e AS epoch
        |      FROM documents d JOIN r USING (lang),
        |           unnest(range(0, greatest(cast(ceil(rate) as bigint), 1))) AS u(e))
        |SELECT doc_id, lang, rate, epoch FROM e
        |WHERE epoch < floor(rate)
        |   OR mod(('0x' || substr(md5(doc_id::varchar || '#' || epoch::varchar), 1, 8))::bigint, 10000) < (rate - floor(rate)) * 10000
        |ORDER BY doc_id, epoch""".stripMargin,
    "dedup_exact" ->
      """SELECT md5(text) AS text_md5, min(doc_id) AS keep_id, count(*) AS n_dupes
        |FROM documents GROUP BY 1 ORDER BY keep_id""".stripMargin,
    // drained changelog state must converge to the batch relation
    "dedup_exact_stream" ->
      """SELECT md5(text) AS text_md5, min(doc_id) AS keep_id, count(*) AS n_dupes
        |FROM documents GROUP BY 1 ORDER BY keep_id""".stripMargin,
    // the cleaning pipeline's oracle composes the already-verified
    // pieces: the langid fixture, text_quality's arithmetic, the
    // contamination CTE, and dedup_resolve's recursive closure — over
    // the FILTERED doc set
    // same CTE chain as pipeline_clean, aggregated to funnel counts
    "pipeline_report" ->
      raw"""WITH RECURSIVE
        |lang AS (${fixtureSql("text_langid", "documents")}),
        |quality AS (
        |  SELECT doc_id, round(least(1.0,
        |    len(list_distinct(string_split(text, ' ')))::double / len(string_split(text, ' ')) * 0.5 +
        |    CASE WHEN len(string_split(text, ' ')) BETWEEN 20 AND 1000 THEN 0.3 ELSE 0.0 END +
        |    CASE WHEN len(list_filter(string_split(text, ' '), w -> w IN ($stopList)))::double / len(string_split(text, ' ')) > 0.02 THEN 0.2 ELSE 0.0 END), 4) AS q
        |  FROM documents),
        |g AS (
        |  SELECT doc_id,
        |         mod(('0x' || substr(md5(cast(doc_id as varchar)), 1, 8))::bigint, 100) >= 98 AS is_eval,
        |         unnest(${shingleListSql(5)}) AS gram
        |  FROM (SELECT doc_id, string_split(rtrim(text), ' ') AS w FROM documents)),
        |e AS (SELECT DISTINCT gram FROM g WHERE is_eval),
        |contaminated AS (SELECT DISTINCT doc_id FROM g JOIN e USING (gram) WHERE NOT is_eval),
        |flags AS (
        |  SELECT d.doc_id, d.text,
        |    (l.pred_lang = 'en') AS lang_ok, (qs.q >= 0.65) AS q_ok,
        |    mod(('0x' || substr(md5(cast(d.doc_id as varchar)), 1, 8))::bigint, 100) >= 98 AS is_eval,
        |    d.doc_id IN (SELECT doc_id FROM contaminated) AS cont
        |  FROM documents d JOIN lang l USING (doc_id) JOIN quality qs USING (doc_id)),
        |base AS (
        |  SELECT doc_id, text FROM flags
        |  WHERE lang_ok AND q_ok AND NOT is_eval AND NOT cont),
        |sh AS (
        |  SELECT doc_id, ${shingleListSql(3)} AS s
        |  FROM (SELECT doc_id, string_split(rtrim(text), ' ') AS w FROM base)),
        |_sz AS (SELECT doc_id, len(s) AS n FROM sh),
        |_ex AS (SELECT doc_id, unnest(s) AS g FROM sh),
        |_in AS (
        |  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS i
        |  FROM _ex a JOIN _ex b ON a.g = b.g AND a.doc_id < b.doc_id
        |  GROUP BY 1, 2),
        |p AS (
        |  SELECT doc_a, doc_b
        |  FROM _in JOIN _sz sa ON sa.doc_id = doc_a JOIN _sz sb ON sb.doc_id = doc_b
        |  WHERE i::double / (sa.n + sb.n - i) >= 0.8),
        |edges AS (SELECT doc_a AS a, doc_b AS b FROM p UNION SELECT doc_b, doc_a FROM p),
        |reach AS (
        |  SELECT a AS node, b AS r FROM edges
        |  UNION
        |  SELECT reach.node, edges.b FROM reach JOIN edges ON reach.r = edges.a),
        |kept AS (
        |  SELECT doc_id FROM base
        |  WHERE doc_id NOT IN (SELECT node FROM reach GROUP BY node HAVING min(r) < node))
        |SELECT '00_total' AS stage, count(*) AS n_docs FROM flags
        |UNION ALL SELECT '01_lang', count(*) FROM flags WHERE lang_ok
        |UNION ALL SELECT '02_quality', count(*) FROM flags WHERE lang_ok AND q_ok
        |UNION ALL SELECT '03_holdout', count(*) FROM flags WHERE lang_ok AND q_ok AND NOT is_eval
        |UNION ALL SELECT '04_decontaminated', count(*) FROM base
        |UNION ALL SELECT '05_deduped', count(*) FROM kept
        |ORDER BY stage""".stripMargin,
    "pipeline_clean" ->
      raw"""WITH RECURSIVE
        |lang AS (${fixtureSql("text_langid", "documents")}),
        |quality AS (
        |  SELECT doc_id, round(least(1.0,
        |    len(list_distinct(string_split(text, ' ')))::double / len(string_split(text, ' ')) * 0.5 +
        |    CASE WHEN len(string_split(text, ' ')) BETWEEN 20 AND 1000 THEN 0.3 ELSE 0.0 END +
        |    CASE WHEN len(list_filter(string_split(text, ' '), w -> w IN ($stopList)))::double / len(string_split(text, ' ')) > 0.02 THEN 0.2 ELSE 0.0 END), 4) AS q
        |  FROM documents),
        |g AS (
        |  SELECT doc_id,
        |         mod(('0x' || substr(md5(cast(doc_id as varchar)), 1, 8))::bigint, 100) >= 98 AS is_eval,
        |         unnest(${shingleListSql(5)}) AS gram
        |  FROM (SELECT doc_id, string_split(rtrim(text), ' ') AS w FROM documents)),
        |e AS (SELECT DISTINCT gram FROM g WHERE is_eval),
        |contaminated AS (SELECT DISTINCT doc_id FROM g JOIN e USING (gram) WHERE NOT is_eval),
        |base AS (
        |  SELECT d.doc_id, d.text FROM documents d
        |  JOIN lang l USING (doc_id) JOIN quality qs USING (doc_id)
        |  WHERE l.pred_lang = 'en' AND qs.q >= 0.65
        |    AND mod(('0x' || substr(md5(cast(d.doc_id as varchar)), 1, 8))::bigint, 100) < 98
        |    AND d.doc_id NOT IN (SELECT doc_id FROM contaminated)),
        |sh AS (
        |  SELECT doc_id, ${shingleListSql(3)} AS s
        |  FROM (SELECT doc_id, string_split(rtrim(text), ' ') AS w FROM base)),
        |_sz AS (SELECT doc_id, len(s) AS n FROM sh),
        |_ex AS (SELECT doc_id, unnest(s) AS g FROM sh),
        |_in AS (
        |  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS i
        |  FROM _ex a JOIN _ex b ON a.g = b.g AND a.doc_id < b.doc_id
        |  GROUP BY 1, 2),
        |p AS (
        |  SELECT doc_a, doc_b
        |  FROM _in JOIN _sz sa ON sa.doc_id = doc_a JOIN _sz sb ON sb.doc_id = doc_b
        |  WHERE i::double / (sa.n + sb.n - i) >= 0.8),
        |edges AS (SELECT doc_a AS a, doc_b AS b FROM p UNION SELECT doc_b, doc_a FROM p),
        |reach AS (
        |  SELECT a AS node, b AS r FROM edges
        |  UNION
        |  SELECT reach.node, edges.b FROM reach JOIN edges ON reach.r = edges.a),
        |kept AS (
        |  SELECT doc_id FROM base
        |  WHERE doc_id NOT IN (SELECT node FROM reach GROUP BY node HAVING min(r) < node))
        |SELECT k.doc_id,
        |  cast(len(regexp_extract_all(d.text, '[A-Za-z0-9_]+|[^A-Za-z0-9_\s]')) as int) AS n_bpe_tokens
        |FROM kept k JOIN documents d USING (doc_id) ORDER BY k.doc_id""".stripMargin,
    // frame i sits at byte offset floor(i*n/4). DuckDB strlen is BYTE
    // length but ord(substr(..)) indexes CHARACTERS — equal only
    // because the driver corpora are pure ASCII (verified). A
    // non-ASCII corpus needs a blob-indexing oracle instead.
    "mm_frame_sample" ->
      """SELECT doc_id, cast(u.i as int) AS frame_idx,
        | (u.i * strlen(text)) // 4 AS byte_offset,
        | cast(ord(substr(text, cast((u.i * strlen(text)) // 4 as int) + 1, 1)) as int) AS frame_byte
        |FROM documents, unnest(range(4)) AS u(i)
        |WHERE strlen(text) > 0
        |ORDER BY doc_id, frame_idx""".stripMargin,
    // the synthetic-WAV generation spec (Audio.scala): the Spark side
    // must read every field back from the REAL RIFF header written by
    // the JDK's WAV encoder; duration floors to whole ms
    "mm_audio_meta" ->
      """SELECT doc_id, 'PCM_UNSIGNED' AS encoding, 8000 AS sample_rate,
        | 1 AS channels, 8 AS bits,
        | cast(64 + doc_id % 97 as bigint) AS n_frames,
        | (64 + doc_id % 97) * 1000 // 8000 AS duration_ms
        |FROM documents ORDER BY doc_id""".stripMargin,
    // the synthetic-GIF generation spec (Video.scala): the Spark side
    // must recover every field from the REAL container — frame count
    // needs a stream scan, delay lives in each frame's
    // GraphicControlExtension, duration = n_frames * delay * 10 ms
    "mm_video_meta" ->
      """SELECT doc_id, cast(2 + doc_id % 4 as int) AS n_frames,
        | cast(16 + doc_id % 17 as int) AS width,
        | cast(16 + doc_id % 13 as int) AS height,
        | cast(4 + doc_id % 7 as int) AS delay_cs,
        | (2 + doc_id % 4) * (4 + doc_id % 7) * 10 AS duration_ms,
        | 'gif' AS format
        |FROM documents ORDER BY doc_id""".stripMargin,
    // frame i sits at PCM offset floor(i*n/4); amplitude is the spec's
    // sample value — the engine reads it back through the real decoder
    "mm_audio_frame_sample" ->
      """SELECT doc_id, cast(u.i as int) AS frame_idx,
        | (u.i * (64 + doc_id % 97)) // 4 AS frame_offset,
        | cast((doc_id * 131 + ((u.i * (64 + doc_id % 97)) // 4) * 31) % 256 as int) AS amplitude
        |FROM documents, unnest(range(4)) AS u(i)
        |ORDER BY doc_id, frame_idx""".stripMargin,
    // fit-in-24-box, aspect preserved, never upscale; dims mirror the
    // synthetic-PNG generation spec — the Spark side READS them back
    // from the real PNG header (lossless round trip, so the spec IS
    // the decode result); box 24 so the shrink branch exercises on
    // the 16..32-px images
    "mm_resize_meta" ->
      """WITH d AS (
        |  SELECT doc_id,
        |         cast(16 + doc_id % 17 as int) AS width,
        |         cast(16 + doc_id % 13 as int) AS height
        |  FROM documents)
        |SELECT doc_id, width, height,
        |  CASE WHEN least(24.0/width, 24.0/height) >= 1.0 THEN width
        |       ELSE cast(floor(width * least(24.0/width, 24.0/height)) as int) END AS out_w,
        |  CASE WHEN least(24.0/width, 24.0/height) >= 1.0 THEN height
        |       ELSE cast(floor(height * least(24.0/width, 24.0/height)) as int) END AS out_h
        |FROM d ORDER BY doc_id""".stripMargin,
    // real javax.imageio header decode of the synthetic PNGs: width/
    // height/format come from the codec; the oracle predicts them from
    // the generation spec
    "mm_decode_meta" ->
      """SELECT doc_id, 'image/png' AS media_type,
        | cast(16 + doc_id % 17 as int) AS width,
        | cast(16 + doc_id % 13 as int) AS height,
        | (16 + doc_id % 17) * (16 + doc_id % 13) AS n_pixels,
        | 'png' AS format
        |FROM documents ORDER BY doc_id""".stripMargin)
}
