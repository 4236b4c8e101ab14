package graft

import graft.streaming.Events
import org.scalatest.funsuite.AnyFunSuite

class StreamingSpec extends AnyFunSuite {
  import SparkTestSession._

  test("streaming hourly agg over events matches the batch result") {
    val stream = Events.stream(spark, sfDir)
    assert(stream.isStreaming)
    val q = Events.streamingHourlyAgg(stream)
      .writeStream.outputMode("append").format("memory").queryName("evt_out").start()
    try {
      q.processAllAvailable()
    } finally q.stop()
    // append mode only emits windows closed by the watermark; every emitted
    // row must match the batch aggregate exactly.
    val streamed = spark.table("evt_out").collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    val batch = Events.hourlyAgg(Tables(spark, sfDir, "events")).collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    assert(streamed.nonEmpty, "watermark should close at least one window")
    streamed.foreach { case (k, n) => assert(batch(k) == n, s"window $k mismatch") }
  }

  test("streaming quality gate: drained stream equals the batch gate") {
    val docs = Tables(spark, sfDir, "documents").select("doc_id", "text")
    val dir = java.nio.file.Files.createTempDirectory("graft-curation-stream")
    dir.toFile.deleteOnExit()
    docs.repartitionByRange(3, org.apache.spark.sql.functions.col("doc_id"))
      .write.mode("overwrite").parquet(dir.toString)
    val stream = spark.readStream.schema(docs.schema)
      .option("maxFilesPerTrigger", "1").parquet(dir.toString)
    val q = graft.streaming.StreamingCuration.qualityGate(stream)
      .writeStream.outputMode("append").format("memory")
      .queryName("curation_out").start()
    try q.processAllAvailable() finally q.stop()
    val streamed = spark.table("curation_out").collect()
      .map(r => (r.getLong(0), r.getInt(3))).toSet
    val batch = graft.streaming.StreamingCuration.qualityGate(docs).collect()
      .map(r => (r.getLong(0), r.getInt(3))).toSet
    assert(batch.nonEmpty, "gate should keep some docs")
    assert(streamed == batch)
  }

  test("streaming decontamination: drained stream equals batch evalOverlap") {
    import org.apache.spark.sql.functions.col
    val docs = Tables(spark, sfDir, "documents")
    val evalPred = graft.operators.Sampling.bucket(col("doc_id"), 100) >= 98
    val streamed = graft.streaming.StreamingCuration
      .runDecontamination(spark, docs, evalPred, k = 5, batches = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val batch = graft.operators.Contamination.evalOverlap(docs, evalPred, k = 5)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(batch.nonEmpty, "the hash split should contaminate some docs")
    assert(streamed == batch)
  }

  test("streaming mixture resampling: stateless op streams unchanged") {
    import org.apache.spark.sql.functions._
    val docs = Tables(spark, sfDir, "documents").select("doc_id", "text")
    val dir = java.nio.file.Files.createTempDirectory("graft-mix-stream")
    dir.toFile.deleteOnExit()
    docs.repartitionByRange(3, col("doc_id"))
      .write.mode("overwrite").parquet(dir.toString)
    val stream = spark.readStream.schema(docs.schema)
      .option("maxFilesPerTrigger", "1").parquet(dir.toString)
    val rate = when(col("doc_id") % 2 === 0, 2.5).otherwise(0.25)
    val q = graft.operators.Sampling.mixture(stream, col("doc_id"), rate)
      .select(col("doc_id"), col("epoch"))
      .writeStream.outputMode("append").format("memory")
      .queryName("mix_out").start()
    try q.processAllAvailable() finally q.stop()
    val streamed = spark.table("mix_out").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val batch = graft.operators.Sampling.mixture(docs, col("doc_id"), rate)
      .select(col("doc_id"), col("epoch")).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(batch.nonEmpty && streamed == batch)
  }

  test("funnel: only in-order first-touch progressions count") {
    import spark.implicits._
    val ts = (off: Long) => new java.sql.Timestamp(1700000000000L + off * 1000)
    val df = Seq(
      // user 1: full in-order funnel
      (1L, "view", ts(0)), (1L, "click", ts(10)), (1L, "purchase", ts(20)),
      // user 2: click BEFORE first view — never reaches stage 2
      (2L, "click", ts(0)), (2L, "view", ts(10)), (2L, "purchase", ts(20)),
      // user 3: view then purchase without click — stops at stage 1
      (3L, "view", ts(0)), (3L, "purchase", ts(5)),
      // user 4: no view at all — not even stage 1
      (4L, "click", ts(0)), (4L, "purchase", ts(10))
    ).toDF("user_id", "event_type", "ts")
    val r = Events.funnel(df).collect()
      .map(x => x.getString(0) -> x.getLong(1)).toMap
    assert(r == Map("01_view" -> 3L, "02_click" -> 1L, "03_purchase" -> 1L), s"got $r")
  }

  test("retention: cohort anchored on first signup, offsets windowed") {
    import spark.implicits._
    val wk = 7L * 24 * 3600 * 1000
    val ts = (w: Long, off: Long) => new java.sql.Timestamp(w * wk + off)
    val df = Seq(
      // user 1 signs up week 100, active weeks 100, 101, 103
      (1L, "signup", ts(100, 1000)), (1L, "view", ts(101, 5)), (1L, "click", ts(103, 9)),
      // user 2 signs up week 100, never returns
      (2L, "signup", ts(100, 2000)),
      // user 3: events BEFORE its signup week don't count (offset < 0)
      (3L, "view", ts(99, 0)), (3L, "signup", ts(101, 0)), (3L, "view", ts(102, 0))
    ).toDF("user_id", "event_type", "ts")
    val r = Events.retention(df).collect()
      .map(x => (x.getLong(0), x.getInt(1)) -> x.getLong(2)).toMap
    assert(r == Map(
      (100L, 0) -> 2L, (100L, 1) -> 1L, (100L, 3) -> 1L,
      (101L, 0) -> 1L, (101L, 1) -> 1L), s"got $r")
  }

  test("streaming funnel: drained changelog equals the batch funnel") {
    val events = Tables(spark, sfDir, "events")
    val streamed = graft.streaming.StreamingEvents.runFunnel(spark, events)
      .collect().map(r => r.getString(r.fieldIndex("stage")) -> r.getLong(r.fieldIndex("n_users"))).toMap
    val batch = Events.funnel(events).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(streamed == batch, s"streamed $streamed != batch $batch")
  }

  test("streaming retention: drained changelog equals the batch cohorts") {
    val events = Tables(spark, sfDir, "events")
    val streamed = graft.streaming.StreamingEvents.runRetention(spark, events)
      .collect().map(r => (r.getLong(r.fieldIndex("cohort_week")),
        r.getInt(r.fieldIndex("week_offset"))) -> r.getLong(r.fieldIndex("n_users"))).toMap
    val batch = Events.retention(events).collect()
      .map(r => (r.getLong(0), r.getInt(1)) -> r.getLong(2)).toMap
    assert(streamed == batch, s"streamed $streamed != batch $batch")
  }

  test("topPaths: per-user trigram paths, never crossing users, count-desc ties by path") {
    import spark.implicits._
    val t0 = java.sql.Timestamp.valueOf("2024-01-01 00:00:00")
    def ts(m: Int) = new java.sql.Timestamp(t0.getTime + m * 60000L)
    // user 1: v c p v c p  -> v>c>p x2, c>p>v, p>v>c
    // user 2: v c p        -> v>c>p
    val ev = (Seq(("view", 0), ("click", 1), ("purchase", 2), ("view", 3),
        ("click", 4), ("purchase", 5)).map { case (e, m) => (1L, e, ts(m)) } ++
      Seq(("view", 0), ("click", 1), ("purchase", 2)).map { case (e, m) => (2L, e, ts(m)) })
      .zipWithIndex.map { case ((u, e, t), i) => (i.toLong, u, e, t) }
      .toDF("event_id", "user_id", "event_type", "ts")
    val got = Events.topPaths(ev).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got == Map("view>click>purchase" -> 3L,
      "click>purchase>view" -> 1L, "purchase>view>click" -> 1L), s"got $got")
  }

  test("stream-stream attribution join: drained pairs equal the batch interval join") {
    val events = Tables(spark, sfDir, "events")
    def key(r: org.apache.spark.sql.Row) =
      (r.getLong(r.fieldIndex("click_id")), r.getLong(r.fieldIndex("view_id")),
        r.getLong(r.fieldIndex("lag_us")))
    val batch = Events.attribution(events).collect().map(key).toSet
    assert(batch.nonEmpty, "corpus should contain attributable pairs")
    // multi-trigger: matches must survive ACROSS micro-batches via
    // buffered join state (watermark evicts only unjoinable state)
    val streamed = graft.streaming.StreamingEvents
      .runAttribution(spark, events, batches = 3).collect().map(key).toSet
    assert(streamed == batch,
      s"missing ${batch -- streamed}, spurious ${streamed -- batch}")
  }

  test("salted attribution drain: hot key fans out, pairs identical") {
    import spark.implicits._
    // one hot user (the planted-crawler shape): 40 clicks and 40 views
    // interleaved within the window, plus a normal user — the salted
    // drain must emit EXACTLY the unsalted/batch pair set (each pair
    // matches once, in its click's salt bucket)
    val base = java.sql.Timestamp.valueOf("2024-01-01 00:00:00")
    def ts(m: Int) = new java.sql.Timestamp(base.getTime + m * 60000L)
    val rows = (0 until 40).flatMap { i =>
      Seq((4242L, 1000L + i, "click", ts(2 * i + 1)),
        (4242L, 2000L + i, "view", ts(2 * i)))
    } ++ Seq((7L, 3000L, "view", ts(0)), (7L, 3001L, "click", ts(5)))
    val events = rows.toDF("user_id", "event_id", "event_type", "ts")
      .withColumn("value", org.apache.spark.sql.functions.lit(1.0))
    def key(r: org.apache.spark.sql.Row) =
      (r.getLong(r.fieldIndex("click_id")), r.getLong(r.fieldIndex("view_id")))
    val batch = Events.attribution(events).collect().map(key).toSet
    val plain = graft.streaming.StreamingEvents
      .runAttribution(spark, events, batches = 2, saltBuckets = 1)
      .collect().map(key).toSet
    val salted = graft.streaming.StreamingEvents
      .runAttribution(spark, events, batches = 2, saltBuckets = 8)
      .collect().map(key).toSet
    // AUTO (the default): the sketch pass must DETECT the planted hot
    // user (80 of 82 events), salt only that key, and still drain the
    // exact batch pair set — the skew-safe default end to end
    val auto = graft.streaming.StreamingEvents
      .runAttribution(spark, events, batches = 2).collect().map(key).toSet
    // and RocksDB state store serves the same drain bit-identically
    val rocks = graft.streaming.StreamingEvents
      .runAttribution(spark, events, batches = 2, rocksDbState = true)
      .collect().map(key).toSet
    assert(plain == batch, s"unsalted drift: ${plain -- batch} / ${batch -- plain}")
    assert(salted == batch,
      s"salted drift: spurious ${salted -- batch}, missing ${batch -- salted}")
    assert(auto == batch,
      s"auto-salted drift: spurious ${auto -- batch}, missing ${batch -- auto}")
    assert(rocks == batch,
      s"rocksdb drift: spurious ${rocks -- batch}, missing ${batch -- rocks}")
  }

  test("streaming sessionize: drained changelog equals batch; late event merges sessions") {
    val events = Tables(spark, sfDir, "events")
    def key(r: org.apache.spark.sql.Row) = (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))
    val batch = Events.sessionStats(events).collect().map(key).toSet
    val streamed = graft.streaming.StreamingEvents.runSessionize(spark, events)
      .collect().map(key).toSet
    assert(streamed == batch, s"missing ${batch -- streamed}, spurious ${streamed -- batch}")

    // unit: a late event BRIDGING two sessions retracts the 2-session
    // row and emits the merged 1-session row
    import org.apache.spark.sql.streaming.TestGroupState
    import graft.streaming.StreamingEvents.{sessionizeUpdate, SessionState}
    val day = 86400000000L
    def step(rows: Seq[Long], st: TestGroupState[SessionState]) =
      sessionizeUpdate(day)(1L, rows.iterator.map(t => (1L, t)), st).toList
    val st = TestGroupState.create[SessionState](
      org.apache.spark.api.java.Optional.empty(),
      org.apache.spark.sql.streaming.GroupStateTimeout.NoTimeout(), 0L,
      org.apache.spark.api.java.Optional.empty(), hasTimedOut = false)
    // two events 1.5 days apart: 2 sessions of 1 event each
    val e1 = step(Seq(0L, day * 3 / 2), st)
    assert(e1.toSet == Set((1L, 2L, 2L, 1L, 1L)), s"e1 $e1")
    // a late event at 0.75 day bridges them: one 3-event session
    val e2 = step(Seq(day * 3 / 4), st)
    assert(e2.toSet == Set((1L, 2L, 2L, 1L, -1L), (1L, 1L, 3L, 3L, 1L)), s"e2 $e2")
  }

  test("retention changelog: late signup revises the cohort with -1/+1 weights") {
    import org.apache.spark.sql.streaming.TestGroupState
    import graft.streaming.StreamingEvents.{retentionUpdate, RetentionState}
    def step(rows: Seq[(Long, Long, Boolean)], st: TestGroupState[RetentionState]) =
      retentionUpdate(4)(1L, rows.iterator, st).toList
    val st = TestGroupState.create[RetentionState](
      org.apache.spark.api.java.Optional.empty(), // memory: java.util.Optional does NOT compile here
      org.apache.spark.sql.streaming.GroupStateTimeout.NoTimeout(), 0L,
      org.apache.spark.api.java.Optional.empty(), hasTimedOut = false)
    // batch 1: signup week 101 + activity weeks 101, 102
    val e1 = step(Seq((1L, 101L, true), (1L, 102L, false)), st)
    assert(e1.toSet == Set((101L, 0, 1L), (101L, 1, 1L)), s"e1 $e1")
    // batch 2 (late fact): an EARLIER signup in week 100 moves the
    // cohort — old rows retract at weight -1, revised rows emit at +1
    val e2 = step(Seq((1L, 100L, true)), st)
    assert(e2.toSet == Set((101L, 0, -1L), (101L, 1, -1L),
      (100L, 0, 1L), (100L, 1, 1L), (100L, 2, 1L)), s"e2 $e2")
    // net weights per (cohort, offset) row now equal the batch answer
    val net = (e1 ++ e2).groupBy(t => (t._1, t._2)).view
      .mapValues(_.map(_._3).sum).filter(_._2 != 0).toMap
    assert(net == Map((100L, 0) -> 1L, (100L, 1) -> 1L, (100L, 2) -> 1L), s"net $net")
  }

  test("changelog TTL: all five stateful updates re-arm on arrival, retract on expiry, restart at the horizon") {
    // The TTL is the production state bound (the StreamingDedup.emitPairs
    // pattern); an end-to-end ProcessingTimeTimeout can't fire under
    // Trigger.AvailableNow, so expiry is asserted at the unit level for
    // each of the five changelog update functions:
    //  (a) with ttl set, every arrival re-arms the per-key clock;
    //  (b) a timed-out key RETRACTS (-1) every row it had emitted and is
    //      removed — so an expired key nets to zero in the drained sum
    //      and a reappearance cannot double-count against stale rows;
    //  (c) post-horizon events rebuild from EMPTY state, emitting exactly
    //      what a first-time key would — drained ≡ batch restricted to
    //      the post-horizon events.
    import org.apache.spark.api.java.Optional
    import org.apache.spark.sql.streaming.{GroupStateTimeout, TestGroupState}
    import graft.streaming.StreamingEvents._
    val ttl = Some("1 hour")

    def fresh[S](prior: Option[S] = None, timedOut: Boolean = false): TestGroupState[S] =
      TestGroupState.create[S](
        prior.fold(Optional.empty[S]())(Optional.of),
        GroupStateTimeout.ProcessingTimeTimeout, 1000L,
        Optional.empty[Long](), hasTimedOut = timedOut)

    // ---- funnel
    val stages = Seq("view", "click", "purchase")
    val fLive = fresh[FunnelState]()
    val fEmitted = funnelUpdate(stages, ttl)(1L, Iterator((1L, 0, 5L)), fLive).toList
    assert(fEmitted.nonEmpty)
    assert(fLive.getTimeoutTimestampMs.isPresent, "funnel TTL must re-arm")
    val fExp = fresh[FunnelState](Some(fLive.get), timedOut = true)
    assert(funnelUpdate(stages, ttl)(1L, Iterator.empty, fExp).toList ==
      fEmitted.map { case (s, w) => (s, -w) },
      "expiry must retract exactly what the key emitted")
    assert(fExp.isRemoved, "expired funnel state must be dropped")
    // (c): after expiry the same stage-0 event re-emits as a new key would
    val fPost = fresh[FunnelState]()
    assert(funnelUpdate(stages, ttl)(1L, Iterator((1L, 0, 9L)), fPost).toList ==
      funnelUpdate(stages, ttl)(2L, Iterator((2L, 0, 9L)), fresh[FunnelState]()).toList)

    // ---- retention
    val rLive = fresh[RetentionState]()
    val rEmitted = retentionUpdate(4, ttl)(1L, Iterator((1L, 100L, true)), rLive).toList
    assert(rEmitted.nonEmpty)
    assert(rLive.getTimeoutTimestampMs.isPresent, "retention TTL must re-arm")
    val rExp = fresh[RetentionState](Some(rLive.get), timedOut = true)
    assert(retentionUpdate(4, ttl)(1L, Iterator.empty, rExp).toSet ==
      rEmitted.map { case (c, w, wt) => (c, w, -wt) }.toSet)
    assert(rExp.isRemoved)

    // ---- sessionize
    val day = 86400000000L
    val sLive = fresh[SessionState]()
    val sEmitted = sessionizeUpdate(day, ttl)(1L, Iterator((1L, 0L)), sLive).toList
    assert(sEmitted.nonEmpty)
    assert(sLive.getTimeoutTimestampMs.isPresent, "sessionize TTL must re-arm")
    val sExp = fresh[SessionState](Some(sLive.get), timedOut = true)
    assert(sessionizeUpdate(day, ttl)(1L, Iterator.empty, sExp).toSet ==
      sEmitted.map { case (u, a, b, c, w) => (u, a, b, c, -w) }.toSet)
    assert(sExp.isRemoved)
    // reappearance after expiry nets exactly a fresh key's emissions:
    // +1 (pre-expiry) -1 (retraction) +1 (fresh rebuild) sums to one row
    val sPost = fresh[SessionState]()
    assert(sessionizeUpdate(day, ttl)(1L, Iterator((1L, day * 5)), sPost).toList ==
      List((1L, 1L, 1L, 1L, 1L)))

    // ---- paths
    val pLive = fresh[PathState]()
    pathsUpdate(ttl)(1L, Iterator((1L, 1L, 1L, "a")), pLive).toList
    assert(pLive.getTimeoutTimestampMs.isPresent, "paths TTL must re-arm")
    val pExp = fresh[PathState](Some(pLive.get), timedOut = true)
    assert(pathsUpdate(ttl)(1L, Iterator.empty, pExp).isEmpty,
      "a 1-event timeline emitted no trigrams, so expiry retracts none")
    assert(pExp.isRemoved)
    // a timeline that DID emit trigrams retracts its whole multiset
    val pFull = fresh[PathState]()
    val pOut = pathsUpdate(ttl)(1L,
      Iterator((1L, 1L, 1L, "a"), (1L, 2L, 2L, "b"), (1L, 3L, 3L, "c"),
        (1L, 4L, 4L, "b"), (1L, 5L, 5L, "c")), pFull).toMap
    val pFullExp = fresh[PathState](Some(pFull.get), timedOut = true)
    assert(pathsUpdate(ttl)(1L, Iterator.empty, pFullExp).toMap ==
      pOut.map { case (p, n) => (p, -n) })
    assert(pFullExp.isRemoved)
    // (c): an expired user's timeline restarts — post-horizon trigrams
    // only, no retraction of the pre-horizon ones
    val pPost = fresh[PathState]()
    val post = pathsUpdate(ttl)(1L,
      Iterator((1L, 10L, 1L, "x"), (1L, 11L, 2L, "y"), (1L, 12L, 3L, "z")), pPost).toMap
    assert(post == Map("x>y>z" -> 1L))

    // ---- anomaly
    val aLive = fresh[AnomalyState]()
    val aEmitted = anomalyUpdate(2.0, ttl)("click", Iterator(("click", "h1")), aLive).toList
    assert(aLive.getTimeoutTimestampMs.isPresent, "anomaly TTL must re-arm")
    val aExp = fresh[AnomalyState](Some(aLive.get), timedOut = true)
    assert(anomalyUpdate(2.0, ttl)("click", Iterator.empty, aExp).toSet ==
      aEmitted.map { case (e, h, n, z, w) => (e, h, n, z, -w) }.toSet)
    assert(aExp.isRemoved)
  }

  test("changelog TTL end-to-end: ProcessingTimeTimeout fires under a real clock and the retractions land in the sink") {
    // The unit-level TTL test above drives the expiry branch through
    // TestGroupState; this one drives it through a REAL micro-batch run
    // (ProcessingTime trigger — AvailableNow never fires processing-time
    // timeouts): two users reach funnel stages, the stream idles past
    // the horizon, a third user's batch arrives, and the sink must show
    // the first two users' rows RETRACTED — drained equals batch
    // restricted to live-horizon keys.
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import org.apache.spark.sql.streaming.{GroupStateTimeout, OutputMode, Trigger}
    import org.apache.spark.sql.functions.{col, sum}
    import graft.streaming.StreamingEvents
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val stages = Seq("view", "click", "purchase")
    val ttl = Some("2 seconds")
    val partKey = "spark.sql.shuffle.partitions"
    val prevParts = spark.conf.get(partKey)
    spark.conf.set(partKey, "4")
    val input = MemoryStream[(Long, Int, Long)]
    val sink = s"graft_ttl_e2e_${System.nanoTime()}"
    val q = input.toDS()
      .groupByKey(_._1)
      .flatMapGroupsWithState(OutputMode.Append(),
        GroupStateTimeout.ProcessingTimeTimeout())(
        StreamingEvents.funnelUpdate(stages, ttl))
      .toDF("stage", "weight")
      .groupBy(col("stage")).agg(sum(col("weight")).as("n_users"))
      .filter(col("n_users") > 0)
      .writeStream.format("memory").queryName(sink)
      .outputMode(OutputMode.Complete())
      .trigger(Trigger.ProcessingTime("200 milliseconds"))
      .start()
    try {
      // processing-time timeouts keep the engine running (empty)
      // micro-batches continuously, so processAllAvailable never
      // observes quiescence — every expectation below is a
      // deadline-bounded poll of the Complete-mode sink instead
      def awaitSink(expect: Map[String, Long], what: String): Unit = {
        val deadline = System.nanoTime() + 60L * 1000 * 1000 * 1000
        var got = Map.empty[String, Long]
        while ({
          got = spark.table(sink).collect()
            .map(r => r.getString(0) -> r.getLong(1)).toMap
          got != expect && System.nanoTime() < deadline
        }) Thread.sleep(200)
        assert(got == expect, s"$what: got $got, want $expect")
      }
      // user 1 reaches view+click, user 2 reaches view
      input.addData((1L, 0, 100L), (1L, 1, 200L), (2L, 0, 150L))
      awaitSink(Map("01_view" -> 2L, "02_click" -> 1L), "pre-expiry")
      // idle past the 2 s horizon, then land a batch for a NEW user —
      // users 1 and 2 time out under the real clock and retract
      // everything they emitted: the sink must converge to batch over
      // live-horizon keys only
      Thread.sleep(2600)
      input.addData((3L, 0, 900L))
      awaitSink(Map("01_view" -> 1L), "post-expiry")
    } finally {
      q.stop()
      spark.catalog.dropTempView(sink)
      spark.conf.set(partKey, prevParts)
    }
  }

  test("checkpoint recovery: a stopped stateful drain resumes with correct state on both state-store providers") {
    // A 100 TB deployment stops and restarts streaming queries
    // constantly (deploys, preemption, failure); correctness rests on
    // the state store reloading from the checkpoint so that sessions
    // MERGE across the restart boundary. This drives it end-to-end:
    // phase 1 drains the first half of the timeline (AvailableNow, an
    // explicit checkpoint), the query terminates, the second half of
    // the same users' events lands in the source dir, and a RESTARTED
    // query (fresh memory sink, same checkpoint) must produce exactly
    // the batch sessionization of the full corpus — late events merge
    // into sessions whose state predates the restart. Run on both the
    // default provider and RocksDB.
    import org.apache.spark.sql.streaming.{GroupStateTimeout, OutputMode, Trigger}
    import org.apache.spark.sql.functions.{col, sum, unix_micros}
    import graft.streaming.StreamingEvents
    import spark.implicits._
    val events = Tables(spark, sfDir, "events")
    val prepared = events.select(col("user_id"),
      unix_micros(col("ts")).as("ts_us"))
    val med = prepared.stat.approxQuantile("ts_us", Array(0.5), 0.0).head.toLong
    val batch = Events.sessionStats(events).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet

    val provKey = "spark.sql.streaming.stateStore.providerClass"
    val prevProv = spark.conf.getOption(provKey)
    val partKey = "spark.sql.shuffle.partitions"
    val prevParts = spark.conf.get(partKey)
    spark.conf.set(partKey, "4")
    try {
      for (prov <- Seq(
          "org.apache.spark.sql.execution.streaming.state.HDFSBackedStateStoreProvider",
          "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")) {
        spark.conf.set(provKey, prov)
        val srcDir = java.nio.file.Files.createTempDirectory("graft-recov-src")
        val ckpt = java.nio.file.Files.createTempDirectory("graft-recov-ckpt")
        srcDir.toFile.deleteOnExit(); ckpt.toFile.deleteOnExit()
        prepared.filter(col("ts_us") <= med)
          .repartition(2).write.mode("append").parquet(srcDir.toString)
        def start(sink: String) = spark.readStream
          .schema(prepared.schema)
          .option("maxFilesPerTrigger", "1")
          .parquet(srcDir.toString)
          .as[(Long, Long)]
          .groupByKey(_._1)
          .flatMapGroupsWithState(OutputMode.Append(), GroupStateTimeout.NoTimeout())(
            StreamingEvents.sessionizeUpdate(86400000000L))
          .toDF("user_id", "n_sessions", "n_events", "max_session_events", "weight")
          .groupBy(col("user_id"), col("n_sessions"), col("n_events"),
            col("max_session_events"))
          .agg(sum(col("weight")).as("w"))
          .filter(col("w") > 0)
          .select(col("user_id"), col("n_sessions"), col("n_events"),
            col("max_session_events"))
          .writeStream.format("memory").queryName(sink)
          .outputMode(OutputMode.Complete())
          .option("checkpointLocation", ckpt.toString)
          .trigger(Trigger.AvailableNow())
          .start()
        val sink1 = s"graft_recov1_${System.nanoTime()}"
        val q1 = start(sink1)
        q1.awaitTermination()
        val partial = spark.table(sink1).count()
        assert(partial > 0, s"$prov: phase 1 drained nothing")
        // the rest of the SAME users' timelines arrives after the stop
        prepared.filter(col("ts_us") > med)
          .repartition(2).write.mode("append").parquet(srcDir.toString)
        val sink2 = s"graft_recov2_${System.nanoTime()}"
        val q2 = start(sink2)
        q2.awaitTermination()
        val resumed = spark.table(sink2).collect()
          .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
        assert(resumed == batch,
          s"$prov: resumed drain != batch (resumed ${resumed.size}, batch ${batch.size})")
        spark.catalog.dropTempView(sink1)
        spark.catalog.dropTempView(sink2)
      }
    } finally {
      spark.conf.set(partKey, prevParts)
      prevProv.fold(spark.conf.unset(provKey))(spark.conf.set(provKey, _))
    }
  }

  test("TTL-armed drain terminates: poll-stop ends the AvailableNow spin and matches plain") {
    // With ProcessingTimeTimeout armed, MicroBatchExecution's
    // shouldRunAnotherBatch is unconditionally true — an AvailableNow
    // query never reaches its end-of-data stop and spins empty
    // micro-batches forever (observed live: a 25x stress arm still
    // spinning after 40 minutes). drain(selfTerminating = false) must
    // stop the query once every staged row is committed, and the
    // drained table must equal the plain (NoTimeout) drain — the 7-day
    // horizon expires nothing during the run.
    val events = Tables(spark, sfDir, "events")
    val key = (r: org.apache.spark.sql.Row) => (r.getString(r.fieldIndex("stage")),
      r.getLong(r.fieldIndex("n_users")))
    val plain = graft.streaming.StreamingEvents.runFunnel(spark, events)
      .collect().map(key).toSet
    val ttl = graft.streaming.StreamingEvents.runFunnel(spark, events,
        stateTtl = Some("7 days"))
      .collect().map(key).toSet
    assert(ttl == plain, s"ttl-armed drain $ttl != plain $plain")
  }

  test("sessionization: single user with two bursts yields two sessions") {
    import spark.implicits._
    val ts = (off: Long) => new java.sql.Timestamp(1700000000000L + off)
    val df = Seq(
      (1L, ts(0)), (1L, ts(60000)), (1L, ts(120000)),      // burst 1
      (1L, ts(200000000)), (1L, ts(200060000))             // burst 2, >1day later
    ).toDF("user_id", "ts")
    val stats = Events.sessionStats(df).collect()
    assert(stats.length == 1)
    val r = stats.head
    assert(r.getLong(1) == 2, "n_sessions")
    assert(r.getLong(2) == 5, "n_events")
    assert(r.getLong(3) == 3, "max_session_events")
  }
}
