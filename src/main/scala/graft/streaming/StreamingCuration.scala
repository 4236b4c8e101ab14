package graft.streaming

import graft.operators.TextAnalysis
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Streaming corpus curation: the stateless quality gates (language ID
  * + the Gopher rule battery) applied to a document STREAM. Because
  * every one of those operators is a pure scan (no shuffle, no state),
  * the exact same Column expressions compose with `readStream`
  * unchanged, and per-micro-batch output equals the batch operator on
  * that batch's rows — the property StreamingSpec pins. This is the
  * ingest-time filter of a training pipeline: documents are scored and
  * gated as they land, upstream of the (stateful) incremental dedup in
  * [[StreamingDedup]].
  */
object StreamingCuration {

  /** Keep English docs passing every Gopher rule; emit the doc id with
    * the signals a downstream audit wants.
    */
  def qualityGate(docs: DataFrame): DataFrame =
    TextAnalysis.withGopherRules(
      TextAnalysis.withLangId(docs, col("text")), col("text"))
      .filter(col("pred_lang") === "en" && col("gopher_pass"))
      .select(col("doc_id"), col("pred_lang"), col("lang_score"),
        col("n_words"), col("mean_word_len"))
}
