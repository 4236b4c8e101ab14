package graft.streaming

import graft.functions.GraftFunctions
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Sketch aggregates over streams. A mergeable TypedImperativeAggregate
  * (SpaceSavingTopK) is stateful-streaming-ready for free: each
  * micro-batch computes partial sketches, the state store keeps the
  * serialized merged sketch, and Complete mode re-emits the current
  * merge — the same partial/merge contract batch aggregation uses.
  */
object StreamingSketch {

  /** Corpus-wide heavy-hitter words over a document stream — drained
    * Complete-mode output ≡ the batch `text_heavy_hitters` aggregate,
    * same DuckDB oracle. State is ONE bounded sketch (capacity
    * entries), not the vocabulary.
    */
  def runHeavyHitters(spark: SparkSession, docs: DataFrame, k: Int = 15,
      capacity: Int = 256, batches: Int = 3): DataFrame = {
    val prepared = docs.select(col("doc_id"), col("text"))
    val drained = StreamingEvents.drain(spark, prepared, batches, "doc_id",
      "heavy-hitters") { stream =>
      stream
        .select(explode(split(col("text"), " ")).as("word"))
        .agg(GraftFunctions.spaceSavingTopK(col("word"), k, capacity).as("top"))
    }
    drained
      .select(explode(col("top")).as("t"))
      .select(col("t.item").as("word"), col("t.cnt").as("cnt"))
  }
}
