package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Deterministic sampling / splitting for training-data pipelines
  * (SURVEY.md §2D): every assignment is a pure function of the row's
  * id — reproducible across runs, partitionings, and engines (the
  * DuckDB oracle mirrors the same md5 arithmetic), and stable when
  * the corpus grows (a doc keeps its split forever, the property that
  * makes hash-splits the standard for train/test hygiene).
  */
object Sampling {

  /** 0..(m-1) bucket from the first 8 md5 hex digits of the id — the
    * portable engine-agnostic hash (Spark's hash() is Murmur3 with
    * Spark-specific seeds; DuckDB can't reproduce it).
    */
  def bucket(id: Column, m: Int): Column =
    pmod(conv(substring(md5(id.cast("string")), 1, 8), 16, 10).cast("long"), lit(m))

  private def md5Bucket(id: Column): Column = bucket(id, 100)

  /** Deterministic train/val/test split by id hash: `pctTrain`% /
    * `pctVal`% / rest. Shuffle-free scan — scales embarrassingly.
    */
  def split(df: DataFrame, id: Column, pctTrain: Int = 80, pctVal: Int = 10): DataFrame =
    df.withColumn("bucket", md5Bucket(id))
      .withColumn("split",
        when(col("bucket") < pctTrain, "train")
          .when(col("bucket") < pctTrain + pctVal, "val")
          .otherwise("test"))
      .drop("bucket")

  /** Hash-rate sample: keep ~`pct`% of rows, deterministically, with
    * zero coordination — the 100 TB-scale sampling path (no count, no
    * shuffle; the kept set is stable under corpus growth).
    */
  def hashSample(df: DataFrame, id: Column, pct: Int): DataFrame =
    df.filter(md5Bucket(id) < pct)

  /** EXACT-fraction stratified sample: within each stratum keep the
    * `ceil(frac * n)` rows with the smallest md5 order (ties cannot
    * happen — ids are unique). One shuffle keyed by stratum; use
    * [[hashSample]] when approximate per-stratum rates suffice or a
    * stratum is pathologically hot.
    */
  def stratified(df: DataFrame, id: Column, stratum: Column, frac: Double): DataFrame = {
    val byStratum = Window.partitionBy(stratum)
    val w = byStratum.orderBy(md5(id.cast("string")))
    df.withColumn("_rank", row_number().over(w))
      .withColumn("_n", count(lit(1)).over(byStratum))
      .filter(col("_rank") <= ceil(col("_n") * frac))
      .drop("_rank", "_n")
  }

  /** Deterministic mixture resampling — the data-mixture op of a
    * training run: each row is replicated `rate` times, where `rate`
    * is any per-row expression (typically CASE on source/domain) and
    * may be fractional or > 1. A row emits `floor(rate)` guaranteed
    * copies (epochs 0..floor-1) plus one extra copy kept iff a
    * portable hash of (id, epoch) lands under the fractional part —
    * so rate 2.5 means "2 full epochs plus a deterministic half
    * epoch", the standard up/down-weighting of sources in a training
    * mix. Pure function of (id, rate): reproducible across runs,
    * partitionings, and engines; shuffle-free scan (the explode is
    * map-side).
    */
  def mixture(df: DataFrame, id: Column, rate: Column,
      granularity: Int = 10000): DataFrame =
    df.withColumn("_rate", rate)
      .withColumn("epoch", explode(sequence(lit(0L),
        greatest(ceil(col("_rate")).cast("long") - 1, lit(0L)))))
      .filter(col("epoch") < floor(col("_rate")) ||
        bucket(concat(id.cast("string"), lit("#"), col("epoch").cast("string")),
          granularity) < (col("_rate") - floor(col("_rate"))) * granularity)
      .drop("_rate")

  /** Token-budget corpus selection: keep docs in (quality DESC, id
    * ASC) order while the running token total stays ≤ `budget` — "fill
    * a 1T-token training budget with the best documents".
    *
    * 100 TB shape: NO global sort/window. Quality is a ROUNDED score
    * (≤ ~10⁴ distinct values), so phase 1 aggregates per-score token
    * totals (map-side combinable, tiny relation), phase 2 computes the
    * strictly-better-score prefix sum on that relation alone and
    * broadcasts it, and phase 3 ranks docs only WITHIN their score
    * bucket (bounded window partitions; near-continuous scores keep
    * buckets small). prevCum + within-bucket cumsum reproduces the
    * exact global running total of the naive single-partition window.
    */
  def budgetSelect(df: DataFrame, id: Column, quality: Column, tokens: Column,
      budget: Long): DataFrame = {
    val t = df.select(id.as("doc_id"), quality.as("quality_score"),
      tokens.cast("long").as("n_tokens"))
    val buckets = t.groupBy(col("quality_score")).agg(sum(col("n_tokens")).as("_btot"))
    // window over the score relation only — cardinality = distinct scores
    val wb = Window.orderBy(col("quality_score").desc)
      .rowsBetween(Window.unboundedPreceding, -1)
    val cumBuckets = buckets
      .withColumn("_prev", coalesce(sum(col("_btot")).over(wb), lit(0L)))
      .select(col("quality_score"), col("_prev"))
    val wdoc = Window.partitionBy(col("quality_score")).orderBy(col("doc_id"))
    t.join(broadcast(cumBuckets), "quality_score")
      .withColumn("cum_tokens", col("_prev") + sum(col("n_tokens")).over(wdoc))
      .filter(col("cum_tokens") <= budget)
      .select(col("doc_id"), col("quality_score"), col("n_tokens"), col("cum_tokens"))
  }

  /** Deterministic global shuffle for training-data export: spread
    * rows over `shards` output shards by id hash, ordered within each
    * shard by the full md5 hex string — a pseudo-random order
    * uncorrelated with the id sequence. This is the scale-correct
    * "shuffle the corpus before training" op: no global sort, one
    * exchange keyed by shard, a per-shard window sort bounded by the
    * shard size — and, like every op here, a pure function of the ids
    * (re-running on a grown corpus re-shuffles but any fixed corpus
    * always yields the same order, so data order is reproducible).
    */
  def shardShuffle(df: DataFrame, id: Column, shards: Int = 16): DataFrame = {
    val w = Window.partitionBy(col("shard")).orderBy(md5(id.cast("string")))
    df.withColumn("shard", bucket(id, shards))
      .withColumn("shard_pos", (row_number().over(w) - 1).cast("long"))
  }

  /** Deterministic sequence packing: concatenate-and-chop documents
    * into training windows of `capacity` tokens (the GPT-style packing
    * model — a doc may straddle a window boundary; it is assigned the
    * bin and offset where its first token lands). Docs are spread over
    * `buckets` independent streams by id hash and packed in id order
    * within each stream: the stream is the parallel unit — one global
    * pack order would serialize the whole corpus through a single
    * window sort, while per-stream packing shuffles each doc once and
    * sorts only within its bucket. Assignment is a pure function of
    * (id, tokens) — reproducible across runs and engines.
    */
  def pack(df: DataFrame, id: Column, tokens: Column,
      capacity: Int = 512, buckets: Int = 8): DataFrame = {
    val w = Window.partitionBy(col("pack_bucket")).orderBy(id)
      .rowsBetween(Window.unboundedPreceding, -1)
    df.withColumn("pack_bucket", bucket(id, buckets))
      .withColumn("_start", coalesce(sum(tokens).over(w), lit(0L)))
      .withColumn("pack_bin", floor(col("_start") / capacity).cast("long"))
      .withColumn("pack_offset", col("_start") % capacity)
      .drop("_start")
  }
}
