package graft.streaming

import graft.operators.Dedup
import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode, Trigger}

/** Incremental near-dup detection over a document stream (SURVEY.md
  * §8 / VERDICT round-1 item 8): the streaming counterpart of
  * [[Dedup.minhashLsh]], producing the SAME verified pair set when the
  * stream is fully drained.
  *
  * Dataflow (all stages incremental):
  *   1. per micro-batch: shingle → minhash signature → explode to
  *      (band, bucket) keys — the codegen'd kernels run unchanged on
  *      the streaming DataFrame;
  *   2. `flatMapGroupsWithState` keyed by (band, bucket) holds the doc
  *      ids previously seen in that bucket and emits a candidate pair
  *      the moment its second endpoint arrives — each pair exactly
  *      once per bucket;
  *   3. streaming `dropDuplicates` collapses the same pair surfacing
  *      from multiple bands;
  *   4. a stream-static join against the (static) document store
  *      fetches both shingle sets and verifies exact Jaccard — only
  *      candidates are ever verified, as in batch.
  *
  * Scale notes: state per bucket is just the member id list, and the
  * band/bucket key space keeps buckets tiny (near-dup families), so
  * state is O(corpus ids), never O(pairs); the pair-dedup state is
  * O(emitted candidates). A production deployment bounds both with
  * state TTL (`GroupStateTimeout`/watermark) under the standard
  * assumption that near-dups arrive within a time horizon; the test
  * path keeps state unbounded so the drained stream is byte-equal to
  * the batch operator.
  */
object StreamingDedup {

  case class BucketState(ids: List[Long])

  /** Emit (doc_a, doc_b) for every pair completed in this bucket by
    * this batch's arrivals; remember the members. With `ttl` set, the
    * bucket's member state expires `ttl` after its last arrival — the
    * production bound (near-dups arrive within a time horizon); the
    * test path leaves it unset so the drained stream equals batch.
    */
  private[graft] def emitPairs(ttl: Option[String])(
      key: (Int, Long),
      rows: Iterator[(Int, Long, Long)],
      state: GroupState[BucketState]): Iterator[(Long, Long)] = {
    if (state.hasTimedOut) {
      state.remove()
      return Iterator.empty
    }
    val prev = state.getOption.map(_.ids).getOrElse(Nil)
    val fresh = rows.map(_._3).toList.distinct.filterNot(prev.contains)
    state.update(BucketState(fresh ::: prev))
    ttl.foreach(state.setTimeoutDuration)
    // new×old plus new×new (each unordered pair once, smaller id first)
    val out = scala.collection.mutable.ListBuffer.empty[(Long, Long)]
    var remainingNew = fresh
    while (remainingNew.nonEmpty) {
      val a = remainingNew.head
      remainingNew = remainingNew.tail
      (remainingNew ::: prev).foreach { b =>
        out += ((math.min(a, b), math.max(a, b)))
      }
    }
    out.iterator
  }

  /** Candidate-pair stream from a (doc_id, text) stream. Banding comes
    * from [[Dedup.bandBuckets]] — the same expression as batch, which
    * is what makes the drained stream oracle-equal to `minhashLsh`.
    * `stateTtl` (e.g. "24 hours") bounds per-bucket state at scale.
    */
  def candidatePairs(
      spark: SparkSession,
      docs: DataFrame,
      k: Int = 3,
      bands: Int = 16,
      rowsPerBand: Int = 4,
      stateTtl: Option[String] = None): Dataset[(Long, Long)] = {
    import spark.implicits._
    val sigs = Dedup.bandBuckets(docs, k, bands, rowsPerBand)
      .select(col("band"), col("bucket"), col("doc_id"))
      .as[(Int, Long, Long)]
    val timeout =
      if (stateTtl.isDefined) GroupStateTimeout.ProcessingTimeTimeout()
      else GroupStateTimeout.NoTimeout()
    sigs
      .groupByKey(r => (r._1, r._2))
      .flatMapGroupsWithState(OutputMode.Append(), timeout)(emitPairs(stateTtl))
      .dropDuplicates("_1", "_2")
  }

  /** Exact-Jaccard verification of a candidate-pair stream against the
    * static document store (stream-static equi-joins by id — at scale
    * this is the point lookup into the corpus table, touching only
    * candidate rows).
    */
  def verifiedPairs(
      spark: SparkSession,
      pairStream: Dataset[(Long, Long)],
      staticDocs: DataFrame,
      k: Int = 3,
      threshold: Double = 0.8): DataFrame =
    Dedup.verifyJaccard(pairStream.toDF("doc_a", "doc_b"), staticDocs, k)
      .filter(col("jaccard") >= threshold)
      .select(col("doc_a"), col("doc_b"), round(col("jaccard"), 4).as("jaccard"))

  /** Drive the full incremental pipeline over the documents table in
    * `batches` micro-batches and return the drained result — the
    * driver-contract entry proving stream/batch equivalence under the
    * same hard DuckDB oracle as `dedup_minhash_lsh`.
    */
  def runIncremental(
      spark: SparkSession,
      docs: DataFrame,
      batches: Int = 3,
      threshold: Double = 0.8,
      stateTtl: Option[String] = None): DataFrame = {
    // stage the corpus as `batches` files and stream them one file per
    // trigger — genuine distributed micro-batches, no driver collect
    val dir = java.nio.file.Files.createTempDirectory("graft-dedup-stream")
    dir.toFile.deleteOnExit()
    val staged = docs.select(col("doc_id"), col("text"))
    staged.repartitionByRange(batches, col("doc_id"))
      .write.mode("overwrite").parquet(dir.toString)
    val stream = spark.readStream
      .schema(staged.schema)
      .option("maxFilesPerTrigger", "1")
      .parquet(dir.toString)
    val sinkName = s"graft_dedup_stream_${System.nanoTime()}"
    StreamingEvents.withStreamingPartitions(spark) {
      val q = verifiedPairs(spark,
        candidatePairs(spark, stream, stateTtl = stateTtl), docs, threshold = threshold)
        .writeStream.format("memory").queryName(sinkName)
        .outputMode(OutputMode.Append()).trigger(Trigger.AvailableNow())
        .start()
      try q.awaitTermination()
      finally if (q.isActive) q.stop()
    }
    // decouple the result from the memory sink and drop the temp view:
    // repeated invocations in one session must not accumulate
    // fully-materialized sink tables in driver memory
    val drained = spark.table(sinkName).localCheckpoint()
    spark.catalog.dropTempView(sinkName)
    drained
  }

  /** Per-bucket SIDE-TAGGED member state for the cross-side pair
    * emitter: a bucket remembers its added and retained arrivals
    * separately and only ever pairs ACROSS sides.
    */
  case class SideState(added: List[Long], retained: List[Long])

  /** Emit (retained_doc, added_doc) for every CROSS-side pair this
    * batch's arrivals complete in the bucket — arrival order doesn't
    * matter (an added doc pairs with retained members past AND
    * present), retained×retained and added×added never pair. Row =
    * (band, bucket, doc_id, is_added).
    */
  private[graft] def emitCrossPairs(
      key: (Int, Long),
      rows: Iterator[(Int, Long, Long, Boolean)],
      state: GroupState[SideState]): Iterator[(Long, Long)] = {
    val prev = state.getOption.getOrElse(SideState(Nil, Nil))
    val fresh = rows.map(r => (r._3, r._4)).toList.distinct
    val freshA = fresh.collect { case (id, true) => id }.filterNot(prev.added.contains)
    val freshR = fresh.collect { case (id, false) => id }.filterNot(prev.retained.contains)
    state.update(SideState(freshA ::: prev.added, freshR ::: prev.retained))
    val out = scala.collection.mutable.ListBuffer.empty[(Long, Long)]
    freshA.foreach(a => (freshR ::: prev.retained).foreach(r => out += ((r, a))))
    freshR.foreach(r => prev.added.foreach(a => out += ((r, a))))
    out.iterator
  }

  /** Streaming twin of [[graft.operators.Snapshot.delta]]'s near-dup
    * arm: the NEW snapshot streams in micro-batches against the
    * STATIC old snapshot, each arrival is side-tagged (added iff its
    * id is absent from old — a stream-static left join), bucketed
    * through the same MinHash bands, and cross-side candidate pairs
    * are emitted the moment their second endpoint arrives; exact
    * Jaccard verifies against the static new-snapshot store. The
    * drained pair set feeds Snapshot.assemble/classify, so the full
    * result equals the batch operator under the same DuckDB oracle —
    * ingest-time delta reconciliation as an actual streaming pipeline.
    *
    * Scale notes: same state bounds as [[runIncremental]] (member ids
    * per bucket, candidate set for dedup), same TTL option in
    * production; the old-snapshot side enters only as id/digest
    * relations (stream-static joins — the standing corpus is never
    * re-streamed).
    */
  def runDelta(
      spark: SparkSession,
      oldDocs: DataFrame,
      newDocs: DataFrame,
      k: Int = 3,
      bands: Int = 16,
      rowsPerBand: Int = 4,
      threshold: Double = 0.8,
      batches: Int = 3): DataFrame = {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft-delta-stream")
    dir.toFile.deleteOnExit()
    val staged = newDocs.select(col("doc_id"), col("text"))
    staged.repartitionByRange(batches, col("doc_id"))
      .write.mode("overwrite").parquet(dir.toString)
    val stream = spark.readStream
      .schema(staged.schema)
      .option("maxFilesPerTrigger", "1")
      .parquet(dir.toString)
    val oldIds = oldDocs.select(col("doc_id"), lit(true).as("_in_old"))
    val sigs = Dedup.bandBuckets(stream, k, bands, rowsPerBand)
      .select(col("band"), col("bucket"), col("doc_id"))
      .join(oldIds, Seq("doc_id"), "left")
      .select(col("band"), col("bucket"), col("doc_id"),
        col("_in_old").isNull.as("is_added"))
      .as[(Int, Long, Long, Boolean)]
    val pairs = sigs
      .groupByKey(r => (r._1, r._2))
      .flatMapGroupsWithState(OutputMode.Append(),
        GroupStateTimeout.NoTimeout())(emitCrossPairs)
      .dropDuplicates("_1", "_2")
    val verified = Dedup.verifyJaccard(
      pairs.toDF("doc_a", "doc_b"), newDocs, k)
      .filter(col("jaccard") >= threshold)
      .select(col("doc_a").as("retained_doc"), col("doc_b").as("added_doc"))
    val sinkName = s"graft_delta_stream_${System.nanoTime()}"
    StreamingEvents.withStreamingPartitions(spark) {
      val q = verified
        .writeStream.format("memory").queryName(sinkName)
        .outputMode(OutputMode.Append()).trigger(Trigger.AvailableNow())
        .start()
      try q.awaitTermination()
      finally if (q.isActive) q.stop()
    }
    val drainedPairs = spark.table(sinkName).localCheckpoint()
    spark.catalog.dropTempView(sinkName)
    // post-drain assembly over BOUNDED relations: statuses from the
    // digest classification, added_near_dup from the drained pairs
    graft.operators.Snapshot.assemble(
      graft.operators.Snapshot.classify(oldDocs, newDocs), drainedPairs)
  }
}
