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

  /** Per-group exact-dup state: the running keeper (min id) and copy
    * count for one text hash.
    */
  case class ExactDupState(keepId: Long, n: Long)

  /** INGEST-TIME exact dedup: documents stream in, state per text-md5
    * group holds (min doc_id, count), and every change emits a
    * changelog pair (retract the old row at −1, assert the new at +1)
    * so the result converges to the batch `dedup_exact` relation under
    * ANY arrival order — a late-arriving lower doc_id re-seats the
    * keeper. Drained ≡ batch, same DuckDB oracle. At scale, state is
    * one 16-byte entry per DISTINCT text (the dedup map itself), keyed
    * and sharded by the hash — exactly the relation a batch job
    * materializes, kept incrementally.
    */
  def runExactDedup(spark: SparkSession, docs: DataFrame,
      batches: Int = 3): DataFrame = {
    import spark.implicits._
    import org.apache.spark.sql.streaming.{GroupStateTimeout, OutputMode}
    val prepared = docs.select(md5(col("text")).as("text_md5"), col("doc_id"))
    val drained = StreamingEvents.drain(spark, prepared, batches, "doc_id",
      "exact-dedup") { stream =>
      stream.as[(String, Long)]
        .groupByKey(_._1)
        .flatMapGroupsWithState(OutputMode.Append(), GroupStateTimeout.NoTimeout())(
          exactDedupUpdate)
        .toDF("text_md5", "keep_id", "n_dupes", "weight")
        .groupBy(col("text_md5"), col("keep_id"), col("n_dupes"))
        .agg(sum(col("weight")).as("w"))
        .filter(col("w") > 0)
        .select(col("text_md5"), col("keep_id"), col("n_dupes"))
    }
    drained
  }

  private[graft] def exactDedupUpdate(
      textMd5: String,
      rows: Iterator[(String, Long)],
      state: org.apache.spark.sql.streaming.GroupState[ExactDupState])
      : Iterator[(String, Long, Long, Long)] = {
    val ids = rows.map(_._2).toSeq
    val prev = state.getOption
    val next = ExactDupState(
      prev.map(p => math.min(p.keepId, ids.min)).getOrElse(ids.min),
      prev.map(_.n).getOrElse(0L) + ids.size)
    state.update(next)
    val retract = prev.iterator.map(p => (textMd5, p.keepId, p.n, -1L))
    retract ++ Iterator((textMd5, next.keepId, next.n, 1L))
  }

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
