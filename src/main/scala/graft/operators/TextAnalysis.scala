package graft.operators

import graft.functions.GraftFunctions
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Text-analysis operators for LLM-data pipelines (SURVEY.md §2D).
  *
  * Everything here is pure `functions._` / lambda higher-order
  * expressions (codegen'd, no Scala UDFs in the row loop) except the
  * fingerprint, which uses the custom codegen'd Fnv1a64/SimHash64
  * Catalyst expressions. All operators are embarrassingly parallel
  * scans — no shuffle — so they scale linearly with input splits.
  */
object TextAnalysis {

  /** The expr()-based metrics need a named column; project the caller's
    * text expression to a private name so any source column works.
    */
  private def withTextCol(df: DataFrame, text: Column)(
      f: DataFrame => DataFrame): DataFrame =
    f(df.withColumn("__graft_text", text)).drop("__graft_text")

  /** Canonical text normalization — the standard pre-dedup/pre-hash
    * pass: lowercase, strip sentence punctuation ([.,!?;:]), collapse
    * whitespace runs, trim. A pure shuffle-free scan; `normalized`
    * feeds hashing/fingerprinting so near-dups differing only in case,
    * punctuation, or spacing collapse (the normalization CCNet/C4
    * apply before dedup).
    */
  def withNormalized(df: DataFrame, text: Column): DataFrame =
    withTextCol(df, text) { d =>
      d.withColumn("normalized",
        trim(regexp_replace(
          regexp_replace(lower(col("__graft_text")), "[.,!?;:]", ""),
          "\\s+", " ")))
    }

  /** Whitespace tokens + a BPE-ish `\w+|[^\w\s]` regex tokenization. */
  def withTokenCounts(df: DataFrame, text: Column): DataFrame =
    withTextCol(df, text) { d =>
      d.withColumn("n_ws_tokens", size(split(col("__graft_text"), "\\s+")))
        .withColumn("n_bpe_tokens", size(expr(
          s"regexp_extract_all(__graft_text, '[A-Za-z0-9_]+|[^A-Za-z0-9_\\\\s]', 0)")))
    }

  /** The engine's stopword profile — shared by the quality score, the
    * Gopher rules, and the DuckDB oracles (LlmOps derives its SQL
    * stopList from this value).
    */
  private[graft] val StopWords =
    Seq("the", "a", "an", "of", "and", "to", "in", "is", "on", "for")

  /** Heuristic quality signals: char/word counts, mean word length,
    * punctuation & stopword & repetition ratios. The formulas are
    * deliberately SQL-parity-friendly (DuckDB oracle runs the same
    * arithmetic).
    */
  def withQuality(df: DataFrame, text: Column): DataFrame = withTextCol(df, text) { d =>
    val t = col("__graft_text")
    val words = split(t, " ")
    val stopList = StopWords.map(s => s"'$s'").mkString(", ")
    d.withColumn("n_chars", length(t))
      .withColumn("n_words", size(words))
      .withColumn("mean_word_len",
        (length(t) - size(words) + 1).cast("double") / size(words))
      .withColumn("punct_ratio",
        (length(t) - length(regexp_replace(t, "[.,!?;:]", ""))).cast("double") / length(t))
      .withColumn("stop_ratio",
        expr(s"size(filter(split(__graft_text, ' '), w -> w IN ($stopList)))").cast("double") / size(words))
      .withColumn("distinct_ratio",
        size(array_distinct(words)).cast("double") / size(words))
      .withColumn("quality_score",
        round(least(lit(1.0),
          col("distinct_ratio") * 0.5 +
            when(col("n_words") >= 20 && col("n_words") <= 1000, 0.3).otherwise(0.0) +
            when(col("stop_ratio") > 0.02, 0.2).otherwise(0.0)), 4))
  }

  /** The Gopher quality-rule battery (Rae et al. 2021 §A1.1, the
    * subset that is meaningful for single-line corpora): word-count
    * bounds, mean-word-length bounds, alphabetic-word fraction,
    * stopword presence, and symbol-to-word ratio ('#' and '...'),
    * each as its own flag plus the conjunction `gopher_pass`.
    *
    * Shuffle-free scan. The two word-level predicates (has-a-letter,
    * is-a-stopword) use SQL lambda HOFs, which Spark evaluates
    * interpreted per element — acceptable here because the filter runs
    * once per corpus pass, but a corpus-dominating hot loop should get
    * a codegen'd kernel like TextHashes (see memory: HOFs ~1000x vs
    * codegen on tight loops). Symbol counts use length-difference
    * arithmetic (codegen'd) instead of regex.
    */
  def withGopherRules(df: DataFrame, text: Column): DataFrame = withTextCol(df, text) { d =>
    val t = col("__graft_text")
    val words = split(t, " ")
    val nw = size(words)
    val stopList = StopWords.map(s => s"'$s'").mkString(", ")
    d.withColumn("n_words", nw)
      .withColumn("mean_word_len",
        round((length(t) - nw + 1).cast("double") / nw, 4))
      .withColumn("alpha_word_frac", round(
        expr("size(filter(split(__graft_text, ' '), w -> w rlike '[A-Za-z]'))")
          .cast("double") / nw, 4))
      .withColumn("n_stopwords",
        expr(s"size(filter(split(__graft_text, ' '), w -> w IN ($stopList)))"))
      .withColumn("symbol_word_ratio", round(
        ((length(t) - length(replace(t, lit("#"), lit("")))) +
          (length(t) - length(replace(t, lit("..."), lit("")))) / 3)
          .cast("double") / nw, 4))
      .withColumn("pass_word_count", col("n_words").between(50, 100000))
      .withColumn("pass_mean_word_len", col("mean_word_len").between(3.0, 10.0))
      .withColumn("pass_alpha_frac", col("alpha_word_frac") >= 0.8)
      .withColumn("pass_stopwords", col("n_stopwords") >= 2)
      .withColumn("pass_symbol_ratio", col("symbol_word_ratio") <= 0.1)
      .withColumn("gopher_pass",
        col("pass_word_count") && col("pass_mean_word_len") &&
          col("pass_alpha_frac") && col("pass_stopwords") && col("pass_symbol_ratio"))
  }

  /** Per-(lang, source) corpus report: doc/char/word totals plus the
    * exact distinct-word count — the summary table a curation run
    * publishes per shard.
    *
    * Shape: one map-side-combinable aggregate for the totals (all
    * integer sums — deterministic under any partial-agg order, no
    * decimal staging needed), and one distinct-then-count aggregate
    * for the vocabulary, keyed on (lang, source, word-fingerprint) so
    * the distinct exchange carries 8-byte hashes, never words. At
    * 100 TB swap the exact vocabulary for approx_count_distinct and
    * the second shuffle disappears into the first.
    */
  def corpusStats(docs: DataFrame, lang: Column, source: Column, text: Column): DataFrame = {
    val t = rtrim(text)
    val totals = docs
      .select(lang.as("lang"), source.as("source"),
        size(split(t, " ")).as("_nw"), length(text).as("_nc"))
      .groupBy(col("lang"), col("source"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("_nc")).as("total_chars"),
        sum(col("_nw")).as("total_words"))
      .withColumn("avg_doc_words",
        round(col("total_words").cast("double") / col("n_docs"), 4))
    val vocab = docs
      .select(lang.as("lang"), source.as("source"),
        explode(split(t, " ")).as("_word"))
      .select(col("lang"), col("source"), GraftFunctions.fnv1a64(col("_word")).as("_w"))
      .distinct()
      .groupBy(col("lang"), col("source"))
      .agg(count(lit(1)).as("distinct_words"))
    totals.join(vocab, Seq("lang", "source"))
  }

  /** n-gram-profile language ID: score = fraction of tokens in each
    * language's tiny stopword profile; argmax wins, 'und' if nothing
    * scores. Cheap, shuffle-free, and the standard first-pass filter
    * in web-scale corpus cleaning.
    */
  def withLangId(df: DataFrame, text: Column): DataFrame = {
    val profiles: Seq[(String, Seq[String])] = Seq(
      "en" -> Seq("the", "and", "of", "to", "is", "in", "that", "it"),
      "de" -> Seq("der", "die", "das", "und", "ist", "nicht", "ein", "zu"),
      "fr" -> Seq("le", "la", "et", "est", "les", "des", "un", "une"),
      "es" -> Seq("el", "la", "que", "de", "y", "es", "un", "una"),
      "zh" -> Seq("的", "是", "了", "在", "我", "有", "和", "不"))
    val scored = profiles.foldLeft(
      df.withColumn("_lower", lower(text))
        .withColumn("_words", split(col("_lower"), "\\s+"))) {
      case (acc, ("zh", chars)) =>
        // Chinese is unsegmented — token matching can never fire; score
        // by the fraction of characters from the zh profile instead
        val charset = chars.mkString
        acc.withColumn("_score_zh",
          (length(col("_lower")) - length(translate(col("_lower"), charset, "")))
            .cast("double") / length(col("_lower")))
      case (acc, (lang, words)) =>
        val list = words.map(w => s"'$w'").mkString(", ")
        acc.withColumn(s"_score_$lang",
          expr(s"size(filter(_words, w -> w IN ($list)))").cast("double") / size(col("_words")))
    }
    val scores = array(profiles.map { case (l, _) =>
      struct(col(s"_score_$l").as("score"), lit(l).as("lang"))
    }: _*)
    scored
      .withColumn("_best", array_max(scores))
      .withColumn("pred_lang",
        when(col("_best.score") > 0.0, col("_best.lang")).otherwise(lit("und")))
      .withColumn("lang_score", round(col("_best.score"), 4))
      .drop((Seq("_lower", "_words", "_best") ++ profiles.map(p => s"_score_${p._1}")): _*)
  }

  /** PII scrubbing: regex-redact emails, phone-like sequences, IPv4
    * addresses and URLs, with per-category match counts — the standard
    * pre-training hygiene pass. Patterns deliberately use RE2-safe
    * syntax so the DuckDB oracle applies the same semantics.
    */
  private val piiPatterns: Seq[(String, String, String)] = Seq(
    ("email", "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}", "<EMAIL>"),
    ("url", "https?://[^ ]+", "<URL>"),
    ("ipv4", "([0-9]{1,3}\\.){3}[0-9]{1,3}", "<IP>"),
    ("phone", "\\+?[0-9][0-9()\\- ]{7,}[0-9]", "<PHONE>"))

  /** Counts are computed SEQUENTIALLY on the progressively-redacted
    * text, so each n_* reports redactions actually performed by that
    * stage — an IP inside an already-redacted URL is not double-counted.
    */
  def withRedaction(df: DataFrame, text: Column): DataFrame = withTextCol(df, text) { d =>
    val (out, fullyRedacted) = piiPatterns.foldLeft((d, col("__graft_text"))) {
      case ((acc, current), (name, pat, repl)) =>
        val staged = acc.withColumn(s"_pre_$name", current)
        val counted = staged.withColumn(s"n_$name",
          size(expr(s"regexp_extract_all(_pre_$name, '${pat.replace("\\", "\\\\")}', 0)")))
        (counted, regexp_replace(col(s"_pre_$name"), pat, repl))
    }
    out.withColumn("redacted", fullyRedacted)
      .drop(piiPatterns.map(p => s"_pre_${p._1}"): _*)
  }

  /** Gopher-style repetition signals: duplicate word-n-gram fractions
    * and the single most frequent word's coverage — the standard
    * filters for boilerplate / degenerate repetition in web corpora.
    *
    * The n-gram fractions come from the distinct-shingle counts
    * (shuffle-free scan); the top-word fraction needs a per-(doc,word)
    * histogram, expressed as two map-side-combinable hash aggregates
    * over the exploded words. Both relations are doc_id + a few
    * doubles, so the final metric join shuffles bytes per doc, never
    * text. Docs shorter than 3 words yield null n-gram fractions
    * (division by zero) — filter them upstream.
    */
  def repetition(docs: DataFrame, id: Column, text: Column): DataFrame = {
    // rtrim: the shingles kernel uses Java split semantics (trailing
    // empty words dropped) while Spark's split keeps them — stripping
    // trailing spaces makes word counts agree between the kernel, this
    // split, and the DuckDB oracle's string_split
    val t = rtrim(text)
    val nw = size(split(t, " "))
    // shingleFps length equals the string form's ALWAYS (string-exact
    // dedup; fnv collisions kept as duplicates), so the distinct-gram
    // counts are identical with no string materialization
    val arrayMetrics = docs.select(
      id.as("doc_id"),
      round(lit(1.0) -
        size(GraftFunctions.shingleFps(t, 2)).cast("double") / (nw - 1), 4)
        .as("dup_bigram_frac"),
      round(lit(1.0) -
        size(GraftFunctions.shingleFps(t, 3)).cast("double") / (nw - 2), 4)
        .as("dup_trigram_frac"))
    // histogram keys are 64-bit word fingerprints, not the words —
    // the (doc,word) exchange carries 8-byte keys (measured ~2x less
    // at 50 k docs); only counts survive, so the fingerprint's 2^-64
    // collision odds are the usual trade
    val topWord = docs
      .select(id.as("doc_id"), explode(split(t, " ")).as("_word"))
      .select(col("doc_id"), GraftFunctions.fnv1a64(col("_word")).as("_w"))
      .groupBy(col("doc_id"), col("_w")).agg(count(lit(1)).as("_c"))
      .groupBy(col("doc_id"))
      .agg(round(max(col("_c")).cast("double") / sum(col("_c")), 4)
        .as("top_word_frac"))
    arrayMetrics.join(topWord, "doc_id")
      .withColumn("repetition_flag",
        col("dup_bigram_frac") > 0.2 || col("dup_trigram_frac") > 0.15 ||
          col("top_word_frac") > 0.2)
  }

  /** Unigram-surprisal quality proxy — the cheap stand-in for LM
    * perplexity filtering (score docs by mean -ln p(word) under the
    * corpus's OWN unigram distribution; degenerate/boilerplate docs
    * score low, rare-token noise scores high).
    *
    * Shape: one global word histogram (map-side-combinable hash agg on
    * 8-byte word fingerprints), one co-partitioned join of the word
    * stream against it, one per-doc aggregate. The corpus-total scalar
    * rides a broadcast. Per-word surprisals are cast to exact decimal
    * before the per-doc sum so the result is independent of partial-
    * aggregation order (double sums are not associative; decimal sums
    * are exact).
    */
  def surprisal(docs: DataFrame, id: Column, text: Column): DataFrame = {
    // only the vocab-sized histogram is persisted — the exploded word
    // stream is corpus-sized and is re-scanned (twice) instead of
    // cached; the corpus total derives from the histogram, not a
    // third pass
    // shinglesPos(text, 1) is fnv1a64 of each word in one fused scan
    // — same tokenization and bytes as the composed
    // split(rtrim)/explode/fnv1a64 chain, with no per-word UTF8String
    val words = docs
      .select(id.as("doc_id"),
        explode(GraftFunctions.shinglesPos(text, 1)).as("_w"))
    val counts = words.groupBy(col("_w")).agg(count(lit(1)).as("_c"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val total = counts.agg(sum(col("_c")).as("_n"))
    words.join(counts, "_w")
      .crossJoin(broadcast(total))
      .withColumn("_s",
        (-log(col("_c").cast("double") / col("_n"))).cast("decimal(28,12)"))
      .groupBy(col("doc_id"))
      .agg(
        round(sum(col("_s")).cast("double") / count(lit(1)), 4).as("mean_surprisal"),
        count(lit(1)).as("n_scored"))
  }

  /** Bigram (conditional) surprisal — the KenLM-style step up from
    * [[surprisal]]: mean -ln P(w_i | w_{i-1}) per doc, with
    * P(cur|prev) = c(prev,cur) / c(prev·) estimated from the corpus
    * itself. Bigram extraction is `arrays_zip`+`slice` (codegen'd
    * collection functions, no interpreted lambda HOFs); the prefix
    * counts derive from the bigram histogram, so only that one
    * vocab²-bounded relation is aggregated and persisted. Docs with a
    * single word produce no bigrams and are absent from the output.
    */
  def bigramSurprisal(docs: DataFrame, id: Column, text: Column): DataFrame = {
    // per-word fps from ONE fused kernel scan (shinglesPos k=1 ≡
    // fnv1a64 per word); the bigram zip then rides primitive longs —
    // the old form materialized a struct of two word STRINGS per
    // bigram and hashed every word twice (once as prev, once as cur)
    val w = GraftFunctions.shinglesPos(text, 1)
    val bg = docs
      .select(id.as("doc_id"),
        explode(arrays_zip(
          slice(w, lit(1), size(w) - 1), slice(w, lit(2), size(w) - 1))).as("_bg"))
      .select(col("doc_id"),
        col("_bg").getField("0").as("_prev"),
        col("_bg").getField("1").as("_cur"))
    val c2 = bg.groupBy(col("_prev"), col("_cur")).agg(count(lit(1)).as("_c2"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val c1 = c2.groupBy(col("_prev")).agg(sum(col("_c2")).as("_c1"))
    bg.join(c2, Seq("_prev", "_cur")).join(c1, Seq("_prev"))
      .withColumn("_s",
        (-log(col("_c2").cast("double") / col("_c1"))).cast("decimal(28,12)"))
      .groupBy(col("doc_id"))
      .agg(
        round(sum(col("_s")).cast("double") / count(lit(1)), 4).as("mean_bigram_surprisal"),
        count(lit(1)).as("n_scored"))
  }

  /** Interpolated Kneser-Ney bigram surprisal (Kneser & Ney 1995;
    * Chen & Goodman 1999's interpolated form with a fixed absolute
    * discount d) — the standard n-gram smoothing, expressed as four
    * count relations over the one bigram histogram:
    *
    *   P(cur|prev) = (c(prev,cur) − d)/c(prev·)
    *               + d·N₁₊(prev,·)/c(prev·) · N₁₊(·,cur)/B
    *
    * where N₁₊(prev,·) = distinct successors, N₁₊(·,cur) = distinct
    * predecessors (the continuation count — how many CONTEXTS a word
    * completes, not how often it occurs), B = distinct bigrams. Self-
    * trained, so every doc bigram has c ≥ 1 > d and the max(·,0)
    * clamp never binds. Same shuffle shape as [[bigramSurprisal]]:
    * everything derives from the vocab²-bounded bigram histogram; the
    * continuation relations are vocab-bounded; B is a 1-row
    * broadcast. All probability arithmetic is double with the same
    * expression tree as the DuckDB oracle; per-doc sums in decimal.
    */
  def knSurprisal(docs: DataFrame, id: Column, text: Column, d: Double = 0.75): DataFrame = {
    // same fused per-word-fp bigram extraction as [[bigramSurprisal]]
    val w = GraftFunctions.shinglesPos(text, 1)
    val bg = docs
      .select(id.as("doc_id"),
        explode(arrays_zip(
          slice(w, lit(1), size(w) - 1), slice(w, lit(2), size(w) - 1))).as("_bg"))
      .select(col("doc_id"),
        col("_bg").getField("0").as("_prev"),
        col("_bg").getField("1").as("_cur"))
    val c2 = bg.groupBy(col("_prev"), col("_cur")).agg(count(lit(1)).as("_c2"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val c1 = c2.groupBy(col("_prev"))
      .agg(sum(col("_c2")).as("_c1"), count(lit(1)).as("_n1prev"))
    val cont = c2.groupBy(col("_cur")).agg(count(lit(1)).as("_n1cur"))
    val btot = c2.agg(count(lit(1)).as("_b"))
    val p =
      (col("_c2").cast("double") - lit(d)) / col("_c1").cast("double") +
        (lit(d) * col("_n1prev").cast("double") / col("_c1").cast("double")) *
          (col("_n1cur").cast("double") / col("_b").cast("double"))
    bg.join(c2, Seq("_prev", "_cur")).join(c1, Seq("_prev"))
      .join(cont, Seq("_cur")).crossJoin(broadcast(btot))
      .withColumn("_s", (-log(p)).cast("decimal(28,12)"))
      .groupBy(col("doc_id"))
      .agg(
        round(sum(col("_s")).cast("double") / count(lit(1)), 4).as("mean_kn_surprisal"),
        count(lit(1)).as("n_scored"))
  }

  /** Corpus boilerplate report: the most-duplicated word-k-gram spans
    * (how many DOCS contain each span — the C4/CCNet "same line in
    * many pages" diagnostic that motivates line-level dedup).
    *
    * Shape: the corpus-sized exchange is (8-byte span fp, doc) pairs
    * from the distinct-shingle kernel, combined map-side into per-fp
    * doc counts; the report threshold is the `top`-th distinct count
    * level (a 1-row broadcast — no tie-breaking through the fp order,
    * so the output SET is engine-independent and strings order the
    * final rows); span STRINGS are fetched on a second scan for the
    * surviving fps only (broadcast semi-join).
    */
  def boilerplateSpans(docs: DataFrame, id: Column, text: Column,
      k: Int = 5, top: Int = 20, minDocs: Int = 2): DataFrame = {
    // counting scan rides the fused fp kernel (no span strings); the
    // string fetch below is the only scan that materializes shingles
    val counts = docs
      .select(id.as("doc_id"), explode(GraftFunctions.shingleFps(text, k)).as("_fp"))
      .groupBy(col("_fp")).agg(count(lit(1)).as("n_docs"))
      .filter(col("n_docs") >= minDocs)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val thr = counts.select(col("n_docs")).distinct()
      .orderBy(col("n_docs").desc).limit(top)
      .agg(min(col("n_docs")).as("_thr"))
    val survivors = counts.crossJoin(broadcast(thr))
      .filter(col("n_docs") >= col("_thr"))
      .select(col("_fp"), col("n_docs"))
    docs.select(explode(GraftFunctions.shingles(text, k)).as("_sp"))
      .select(GraftFunctions.fnv1a64(col("_sp")).as("_fp"), col("_sp"))
      .join(broadcast(survivors), "_fp")
      .groupBy(col("_fp"), col("n_docs")).agg(min(col("_sp")).as("span"))
      .select(col("span"), col("n_docs"))
      .orderBy(col("n_docs").desc, col("span"))
  }

  /** Per-document TF-IDF keyword extraction: the top-k corpus-weighted
    * terms per doc (tf · ln(N/df)) — the classic summarization /
    * topic-labeling pass of a curation pipeline.
    *
    * Shape: the corpus-sized exchanges — the (doc, word) term
    * histogram and the doc-frequency aggregate — are keyed by 8-byte
    * word fingerprints, never strings (same convention as repetition/
    * surprisal); the per-doc top-k runs through the bounded-heap
    * TopKAgg (no Window sort), and word STRINGS only appear in two
    * narrow relations: the vocab dictionary (fp → min word, one
    * vocab-sized aggregate) and the final top-k×docs fetch-join. Ties
    * at equal score (common: same tf and df) break on the signed
    * fingerprint — deterministic, mirrored by the fixture oracle.
    */
  def tfidfKeywords(docs: DataFrame, id: Column, text: Column, k: Int = 5): DataFrame = {
    val words = docs.select(id.as("doc_id"),
      explode(split(rtrim(text), " ")).as("_word"))
      .withColumn("_fp", GraftFunctions.fnv1a64(col("_word")))
    // min() keeps the dictionary deterministic even under a (2^-64)
    // fingerprint collision
    val dict = words.groupBy(col("_fp")).agg(min(col("_word")).as("keyword"))
    val tf = words.groupBy(col("doc_id"), col("_fp")).agg(count(lit(1)).as("_tf"))
    // rows of `tf` are per-doc distinct, so counting them counts docs
    val dfreq = tf.groupBy(col("_fp")).agg(count(lit(1)).as("_df"))
    val n = docs.agg(count(lit(1)).as("_n"))
    // dfreq is vocab-sized (8-byte fp + count) while tf is corpus-sized:
    // broadcasting it keeps the corpus-side histogram un-shuffled (the
    // AQE-left-alone plan shuffled both sides — measured 2x the bytes)
    val scored = tf.join(broadcast(dfreq), "_fp")
      .crossJoin(broadcast(n))
      .withColumn("_score", col("_tf") * log(col("_n").cast("double") / col("_df")))
    scored.groupBy(col("doc_id"))
      .agg(GraftFunctions.topKAgg(col("_score"), col("_fp"), k).as("_top"))
      .select(col("doc_id"), posexplode(col("_top")).as(Seq("_pos", "_t")))
      .select(col("doc_id"), (col("_pos") + 1).as("rank"),
        col("_t.id").as("_fp"), round(col("_t.score"), 4).as("tfidf"))
      .join(dict, "_fp")
      .select(col("doc_id"), col("rank"), col("keyword"), col("tfidf"))
  }

  /** Top PMI bigram collocations — pointwise mutual information
    * ln(p(a,b) / (p(a)·p(b))) over adjacent word pairs, the classic
    * collocation-extraction pass (Church & Hanks 1990) a corpus report
    * runs to surface multi-word terms worth protecting from
    * normalization/tokenization.
    *
    * Shape: both histograms are keyed by 8-byte word fingerprints
    * (vocab- and vocab²-bounded — the corpus word stream is scanned,
    * partially aggregated map-side, and never re-shuffled); the
    * unigram relation and the dictionary are vocab-sized broadcasts.
    * The survivor SET is fixed by the top-`topLevels` distinct rounded
    * PMI levels (the [[boilerplateSpans]] convention), so no
    * hash-order tie-break exists at the cut; word strings are fetched
    * for survivors only. PMI doubles are bit-identical cross-engine:
    * one multiplication/division tree over exact integer counts.
    */
  def pmiCollocations(docs: DataFrame, text: Column,
      minPair: Int = 5, topLevels: Int = 20): DataFrame = {
    val w = split(rtrim(text), " ")
    val words = docs.select(explode(w).as("_word"))
      .select(col("_word"), GraftFunctions.fnv1a64(col("_word")).as("_fp"))
    val cu = words.groupBy(col("_fp")).agg(count(lit(1)).as("_c"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val n = cu.agg(sum(col("_c")).as("_n"))
    // bigram fps from the fused per-word-fp kernel (longs through the
    // zip, no word-string structs) — the unigram scan above keeps
    // strings because survivors fetch their words from it
    val u = GraftFunctions.shinglesPos(text, 1)
    val bg = docs.select(
        explode(arrays_zip(
          slice(u, lit(1), size(u) - 1), slice(u, lit(2), size(u) - 1))).as("_bg"))
      .select(col("_bg").getField("0").as("_fa"),
        col("_bg").getField("1").as("_fb"))
    val c2 = bg.groupBy(col("_fa"), col("_fb")).agg(count(lit(1)).as("_c2"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val wTot = c2.agg(sum(col("_c2")).as("_w"))
    val scored = c2.filter(col("_c2") >= minPair)
      .join(broadcast(cu.select(col("_fp").as("_fa"), col("_c").as("_ca"))), "_fa")
      .join(broadcast(cu.select(col("_fp").as("_fb"), col("_c").as("_cb"))), "_fb")
      .crossJoin(broadcast(n)).crossJoin(broadcast(wTot))
      .withColumn("pmi", round(
        log(col("_c2").cast("double") * col("_n").cast("double") * col("_n").cast("double") /
          (col("_w").cast("double") * col("_ca").cast("double") * col("_cb").cast("double"))), 6))
    val thr = scored.select(col("pmi")).distinct()
      .orderBy(col("pmi").desc).limit(topLevels)
      .agg(min(col("pmi")).as("_thr"))
    val dict = words.groupBy(col("_fp")).agg(min(col("_word")).as("_wd"))
    scored.crossJoin(broadcast(thr)).filter(col("pmi") >= col("_thr"))
      .join(broadcast(dict.select(col("_fp").as("_fa"), col("_wd").as("word_a"))), "_fa")
      .join(broadcast(dict.select(col("_fp").as("_fb"), col("_wd").as("word_b"))), "_fb")
      .select(col("word_a"), col("word_b"), col("_c2").as("n_pair"), col("pmi"))
      .orderBy(col("pmi").desc, col("word_a"), col("word_b"))
  }

  /** Zipf rank-frequency report: the top-`top` words by corpus
    * frequency with their rank, plus the fitted log-log slope (least
    * squares over (ln rank, ln count)) — the standard sanity check
    * that a corpus looks like natural language (slope ≈ −1) rather
    * than templated/machine output. Counts are fingerprint-keyed
    * (vocab-bounded aggregate; word strings only in the vocab-sized
    * dictionary); the regression runs over `top` points with
    * decimal-summed terms, so the slope is partition-order
    * independent and bit-identical cross-engine.
    */
  def zipfReport(docs: DataFrame, text: Column, top: Int = 100): DataFrame = {
    val words = docs.select(explode(split(rtrim(text), " ")).as("_word"))
      .select(col("_word"), GraftFunctions.fnv1a64(col("_word")).as("_fp"))
    val cu = words.groupBy(col("_fp"))
      .agg(count(lit(1)).as("cnt"), min(col("_word")).as("word"))
    val topW = cu.orderBy(col("cnt").desc, col("word")).limit(top)
      .withColumn("rank", row_number().over(
        org.apache.spark.sql.expressions.Window.orderBy(col("cnt").desc, col("word"))))
      .withColumn("_x", log(col("rank").cast("double")))
      .withColumn("_y", log(col("cnt").cast("double")))
    val sums = topW.agg(count(lit(1)).as("_k"),
      sum(col("_x").cast("decimal(28,12)")).as("_sx"),
      sum(col("_y").cast("decimal(28,12)")).as("_sy"),
      sum((col("_x") * col("_x")).cast("decimal(28,12)")).as("_sxx"),
      sum((col("_x") * col("_y")).cast("decimal(28,12)")).as("_sxy"))
    val kd = col("_k").cast("double")
    val (sx, sy) = (col("_sx").cast("double"), col("_sy").cast("double"))
    val (sxx, sxy) = (col("_sxx").cast("double"), col("_sxy").cast("double"))
    topW.crossJoin(broadcast(sums))
      .select(col("rank"), col("word"), col("cnt"),
        round((kd * sxy - sx * sy) / (kd * sxx - sx * sx), 6).as("zipf_slope"))
      .orderBy(col("rank"))
  }

  /** Document fingerprints: full-text FNV-1a plus a winnowed rolling
    * fingerprint (min/max over word-5-gram hashes) robust to small
    * edits. Uses the codegen'd fnv1a64 SQL function.
    */
  def withFingerprint(df: DataFrame, text: Column): DataFrame =
    df.withColumn("fp_exact", GraftFunctions.fnv1a64(text))
      .withColumn("_mm", GraftFunctions.winnowMinMax(text, 5))
      .withColumn("fp_min", element_at(col("_mm"), 1))
      .withColumn("fp_max", element_at(col("_mm"), 2))
      .withColumn("fp_sim", GraftFunctions.simhash64(text))
      .drop("_mm")
}
