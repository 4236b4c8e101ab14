package graft

import org.apache.spark.api.java.Optional
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, TestGroupState}
import org.scalatest.funsuite.AnyFunSuite

import graft.streaming.{Events, StreamingEvents}

/** Property-based arrival-order robustness for the stateful streaming
  * twins (round-4 verdict task #7): the drained changelog must equal
  * the single-batch derivation under ANY arrival order, not just the
  * specific late-event scenarios the pointwise specs exercise.
  *
  * Two layers:
  *  - 20 seeded random permutations of the real sf0.001 event stream,
  *    split into 5 micro-batches, driven through each of the five
  *    changelog update functions (and the LSH bucket pairer) at the
  *    unit level — the netted weights must match the one-batch run
  *    exactly (the one-batch run is what the DuckDB oracles gate).
  *  - End-to-end salted drains (the runners' arrivalSalt hook cuts
  *    micro-batches by a seeded hash of event time, i.e. maximally
  *    late-heavy arrival) for the sessionize and retention twins,
  *    compared against their batch operators.
  */
class StreamingAdversarialSpec extends AnyFunSuite {
  import SparkTestSession._

  private val seeds = 1L to 20L
  private val nBatches = 5

  /** Drive `update` over seeded-shuffled micro-batches with per-key
    * state carried across batches (fresh TestGroupState per call,
    * seeded from the previous call's value — the contract
    * flatMapGroupsWithState provides between triggers).
    */
  private def driveShuffled[K, R, O, S](rows: Seq[R], keyOf: R => K, seed: Long,
      update: (K, Iterator[R], GroupState[S]) => Iterator[O]): Seq[O] = {
    val rng = new scala.util.Random(seed)
    val shuffled = rng.shuffle(rows)
    val per = math.max(1, math.ceil(shuffled.size / nBatches.toDouble).toInt)
    val states = scala.collection.mutable.Map.empty[K, S]
    val out = scala.collection.mutable.ArrayBuffer.empty[O]
    shuffled.grouped(per).foreach { chunk =>
      chunk.groupBy(keyOf).foreach { case (k, rs) =>
        val st = TestGroupState.create[S](
          states.get(k).fold(Optional.empty[S]())(Optional.of),
          GroupStateTimeout.NoTimeout, 0L, Optional.empty[Long](),
          hasTimedOut = false)
        out ++= update(k, rs.iterator, st)
        if (st.exists) states(k) = st.get else states.remove(k)
      }
    }
    out.toSeq
  }

  /** Net a weighted changelog: sum weights per key, drop zeros. */
  private def net[T](rows: Seq[(T, Long)]): Map[T, Long] =
    rows.groupBy(_._1).view.mapValues(_.map(_._2).sum).filter(_._2 != 0L).toMap

  test("five changelog updates drain identically under 20 seeded arrival orders") {
    val stages = Seq("view", "click", "purchase")
    val raw = Tables(spark, sfDir, "events")
      .select(col("user_id"), unix_micros(col("ts")).as("tsu"),
        col("event_id"), col("event_type"),
        date_format(date_trunc("hour", col("ts")), "yyyy-MM-dd HH").as("hour"),
        floor(unix_timestamp(col("ts")) / lit(7L * 24 * 3600)).cast("long").as("week"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3),
        r.getString(4), r.getLong(5)))
      .toSeq

    // per-op input rows, mirroring each runner's `prepared` projection
    val funnelRows = raw.collect {
      case (u, t, _, et, _, _) if stages.contains(et) => (u, stages.indexOf(et), t)
    }
    val retRows = raw.map { case (u, _, _, et, _, w) => (u, w, et == "signup") }
    val sessRows = raw.map { case (u, t, _, _, _, _) => (u, t) }
    val pathRows = raw.map { case (u, t, id, et, _, _) => (u, t, id, et) }
    val anomRows = raw.map { case (_, _, _, et, h, _) => (et, h) }

    def oneBatch[K, R, O, S](rows: Seq[R], keyOf: R => K,
        update: (K, Iterator[R], GroupState[S]) => Iterator[O]): Seq[O] =
      rows.groupBy(keyOf).toSeq.flatMap { case (k, rs) =>
        val st = TestGroupState.create[S](Optional.empty[S](),
          GroupStateTimeout.NoTimeout, 0L, Optional.empty[Long](),
          hasTimedOut = false)
        update(k, rs.iterator, st)
      }

    val fuB = net(oneBatch(funnelRows, (r: (Long, Int, Long)) => r._1,
      StreamingEvents.funnelUpdate(stages)))
    val reB = net(oneBatch(retRows, (r: (Long, Long, Boolean)) => r._1,
      StreamingEvents.retentionUpdate(4)).map(t => ((t._1, t._2), t._3)))
    val seB = net(oneBatch(sessRows, (r: (Long, Long)) => r._1,
      StreamingEvents.sessionizeUpdate(86400000000L))
      .map(t => ((t._1, t._2, t._3, t._4), t._5)))
    val paB = net(oneBatch(pathRows, (r: (Long, Long, Long, String)) => r._1,
      StreamingEvents.pathsUpdate()))
    val anB = net(oneBatch(anomRows, (r: (String, String)) => r._1,
      StreamingEvents.anomalyUpdate(2.0)).map(t => ((t._1, t._2, t._3, t._4), t._5)))
    assert(fuB.nonEmpty && reB.nonEmpty && seB.nonEmpty && paB.nonEmpty && anB.nonEmpty)

    seeds.foreach { seed =>
      val fu = net(driveShuffled(funnelRows, (r: (Long, Int, Long)) => r._1, seed,
        StreamingEvents.funnelUpdate(stages)))
      assert(fu == fuB, s"funnel diverged at seed $seed")
      val re = net(driveShuffled(retRows, (r: (Long, Long, Boolean)) => r._1, seed,
        StreamingEvents.retentionUpdate(4)).map(t => ((t._1, t._2), t._3)))
      assert(re == reB, s"retention diverged at seed $seed")
      val se = net(driveShuffled(sessRows, (r: (Long, Long)) => r._1, seed,
        StreamingEvents.sessionizeUpdate(86400000000L))
        .map(t => ((t._1, t._2, t._3, t._4), t._5)))
      assert(se == seB, s"sessionize diverged at seed $seed")
      val pa = net(driveShuffled(pathRows, (r: (Long, Long, Long, String)) => r._1, seed,
        StreamingEvents.pathsUpdate()))
      assert(pa == paB, s"paths diverged at seed $seed")
      val an = net(driveShuffled(anomRows, (r: (String, String)) => r._1, seed,
        StreamingEvents.anomalyUpdate(2.0)).map(t => ((t._1, t._2, t._3, t._4), t._5)))
      assert(an == anB, s"anomaly diverged at seed $seed")
    }
  }

  test("LSH bucket pairer emits the same distinct pair set under 20 seeded arrival orders") {
    import graft.streaming.StreamingDedup.{emitPairs, BucketState}
    val docs = Tables(spark, sfDir, "documents")
    val buckets = graft.operators.Dedup.bandBuckets(docs, 3, 16, 4)
      .select(col("band"), col("bucket"), col("doc_id"))
      .collect().map(r => (r.getInt(0), r.getLong(1), r.getLong(2))).toSeq
    def pairSet(out: Seq[(Long, Long)]): Set[(Long, Long)] = out.toSet
    val base = pairSet(
      buckets.groupBy(r => (r._1, r._2)).toSeq.flatMap { case (k, rs) =>
        val st = TestGroupState.create[BucketState](Optional.empty[BucketState](),
          GroupStateTimeout.NoTimeout, 0L, Optional.empty[Long](), hasTimedOut = false)
        emitPairs(None)(k, rs.iterator, st)
      })
    assert(base.nonEmpty)
    seeds.foreach { seed =>
      val got = pairSet(driveShuffled(buckets, (r: (Int, Long, Long)) => (r._1, r._2),
        seed, emitPairs(None)))
      assert(got == base, s"bucket pairer diverged at seed $seed")
    }
  }

  test("end-to-end salted drains: late-heavy micro-batches still equal batch") {
    val events = Tables(spark, sfDir, "events")
    val sessBatch = Events.sessionStats(events).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
    val retBatch = Events.retention(events).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSet
    for (seed <- Seq(7L, 13L)) {
      val sess = StreamingEvents.runSessionize(spark, events, arrivalSalt = Some(seed))
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
      assert(sess == sessBatch, s"salted sessionize != batch at seed $seed")
      val ret = StreamingEvents.runRetention(spark, events, arrivalSalt = Some(seed))
        .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSet
      assert(ret == retBatch, s"salted retention != batch at seed $seed")
    }
  }
}
