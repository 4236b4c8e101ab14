package graft

import graft.operators.Dedup
import graft.streaming.StreamingDedup
import org.scalatest.funsuite.AnyFunSuite

class StreamingDedupSpec extends AnyFunSuite {
  import SparkTestSession._

  private def pairSet(rows: Array[org.apache.spark.sql.Row]): Set[(Long, Long, Double)] =
    rows.map(r => (r.getLong(r.fieldIndex("doc_a")), r.getLong(r.fieldIndex("doc_b")),
      r.getDouble(r.fieldIndex("jaccard")))).toSet

  test("drained incremental stream equals batch minhashLsh pair set") {
    val docs = Tables(spark, sfDir, "documents")
    val batch = pairSet(Dedup.minhashLsh(docs).collect())
    val streamed = pairSet(StreamingDedup.runIncremental(spark, docs, batches = 4).collect())
    assert(batch.nonEmpty, "fixture corpus must contain near-dup pairs")
    assert(streamed == batch,
      s"stream-batch diff: only-stream=${streamed -- batch}, only-batch=${batch -- streamed}")
  }

  test("state TTL: timed-out bucket state drops; live state emits and re-arms") {
    // unit-level via TestGroupState — an end-to-end ProcessingTimeTimeout
    // run cannot use Trigger.AvailableNow (the query would idle until
    // the wall-clock timeout fires), which is exactly why the TTL is
    // opt-in production config, not the oracle-gated test path.
    import org.apache.spark.api.java.Optional
    import org.apache.spark.sql.streaming.TestGroupState
    import graft.streaming.StreamingDedup.{emitPairs, BucketState}
    val ttl = Some("10 minutes")
    // live state: new arrival pairs with the remembered member and re-arms the clock
    val live = TestGroupState.create[BucketState](
      Optional.of(BucketState(List(1L))),
      org.apache.spark.sql.streaming.GroupStateTimeout.ProcessingTimeTimeout,
      1000L, Optional.empty[Long](), hasTimedOut = false)
    val out = emitPairs(ttl)((0, 7L), Iterator((0, 7L, 2L)), live).toList
    assert(out == List((1L, 2L)))
    assert(live.get.ids.toSet == Set(1L, 2L))
    assert(live.getTimeoutTimestampMs.isPresent, "TTL must re-arm on arrival")
    // timed-out state: removed, nothing emitted
    val expired = TestGroupState.create[BucketState](
      Optional.of(BucketState(List(1L, 2L))),
      org.apache.spark.sql.streaming.GroupStateTimeout.ProcessingTimeTimeout,
      1000L, Optional.empty[Long](), hasTimedOut = true)
    assert(emitPairs(ttl)((0, 7L), Iterator.empty, expired).isEmpty)
    assert(expired.isRemoved, "expired bucket state must be dropped")
  }

  test("pairs split across micro-batches are still found, exactly once") {
    import spark.implicits._
    // near-dup family {10, 20, 30} + a singleton; family members arrive
    // in three DIFFERENT micro-batches, so every cross-batch pair relies
    // on bucket state surviving between triggers
    val base = (1 to 40).map(i => s"tok$i").mkString(" ")
    val docs = Seq(
      (10L, base), (20L, base + " tailA"), (30L, base + " tailB"),
      (99L, (1 to 40).map(i => s"other$i").mkString(" "))
    ).toDF("doc_id", "text")
    val out = StreamingDedup.runIncremental(spark, docs, batches = 4).collect()
    val pairs = out.map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs == Set((10L, 20L), (10L, 30L), (20L, 30L)))
    assert(out.length == 3, s"each pair exactly once, got ${out.toList}")
  }
}
