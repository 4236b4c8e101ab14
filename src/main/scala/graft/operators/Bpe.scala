package graft.operators

import scala.collection.mutable.ArrayBuffer

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel
import org.apache.spark.unsafe.types.UTF8String

import graft.functions.GraftFunctions

/** Byte-pair-encoding merge learning over a corpus (Sennrich et al.
  * 2016, arXiv:1508.07909) — the tokenizer-training pass of an LLM
  * data pipeline, restated for Spark's execution model:
  *
  * The classic algorithm iterates over the corpus; the SCALABLE
  * restatement iterates over the WORD-FREQUENCY TABLE. The only
  * corpus-sized job is one word-count aggregation (map-side-combined
  * hash agg, exactly the `surprisal` histogram shape); every merge
  * round then runs on the distinct-word relation — bounded by
  * vocabulary size (~10^7 rows at 100 TB, independent of corpus
  * bytes), each round one tiny pair-count aggregate + a driver
  * collect of a single row.
  *
  * Symbol sequences are recomputed per round by applying the merge
  * chain learned so far to the initial code-point symbols (a codegen'd
  * kernel; merges ride as codegen reference objects). Re-applying from
  * scratch is O(rounds² · vocab) symbol work but keeps every round a
  * pure function of the one persisted word relation — no iterative
  * lineage growth, no checkpointing, deterministic under any
  * partitioning. Ties in pair counts break lexicographically, so the
  * learned table is bit-reproducible (mirrored by
  * tools/make_expected.py gen_bpe_*).
  */
object Bpe {

  /** The one corpus-sized aggregation: distinct words with counts. */
  def wordCounts(docs: DataFrame, text: Column): DataFrame =
    docs.select(explode(split(rtrim(text), " ")).as("word"))
      .groupBy(col("word")).agg(count(lit(1)).as("cnt"))

  final case class Merge(rank: Int, left: String, right: String, pairCount: Long)

  /** Learn `nMerges` BPE merges: each round counts adjacent symbol
    * pairs weighted by word frequency and takes the (count desc, pair
    * asc) maximum. Stops early if no pairs remain.
    */
  def trainMerges(docs: DataFrame, text: Column, nMerges: Int): Seq[Merge] = {
    val vocab = wordCounts(docs, text).persist(StorageLevel.MEMORY_AND_DISK)
    try trainFromVocab(vocab, nMerges) finally vocab.unpersist()
  }

  /** Merge learning over an already-persisted word-frequency relation
    * (lets callers that also need the vocabulary pay the corpus-sized
    * word count only once).
    */
  def trainFromVocab(vocab: DataFrame, nMerges: Int): Seq[Merge] = {
    val merges = ArrayBuffer.empty[Merge]
    var done = false
    while (merges.length < nMerges && !done) {
      val syms = GraftFunctions.bpeApply(
        GraftFunctions.bpeInitSyms(col("word")),
        merges.toSeq.map(m => (m.left, m.right)))
      val top = vocab
        .select(syms.as("s"), col("cnt"))
        .select(explode(arrays_zip(
          slice(col("s"), lit(1), size(col("s")) - 1),
          slice(col("s"), lit(2), size(col("s")) - 1))).as("p"), col("cnt"))
        .select(col("p").getField("0").as("l"), col("p").getField("1").as("r"), col("cnt"))
        .groupBy(col("l"), col("r")).agg(sum(col("cnt")).as("c"))
        .orderBy(col("c").desc, col("l"), col("r"))
        .limit(1).collect()
      if (top.isEmpty) done = true
      else merges += Merge(merges.length + 1, top(0).getString(0),
        top(0).getString(1), top(0).getLong(2))
    }
    merges.toSeq
  }

  /** The learned merge table as a DataFrame (rank, left, right,
    * pair_count) — the committed artifact of tokenizer training.
    */
  def trainDf(spark: SparkSession, docs: DataFrame, text: Column,
      nMerges: Int): DataFrame = {
    import spark.implicits._
    trainMerges(docs, text, nMerges)
      .map(m => (m.rank, m.left, m.right, m.pairCount))
      .toDF("rank", "left", "right", "pair_count")
  }

  /** Per-document token count under a learned merge table: one
    * codegen'd kernel call per doc, shuffle-free scan.
    */
  def tokenCounts(docs: DataFrame, id: Column, text: Column,
      merges: Seq[Merge]): DataFrame =
    docs.select(id.as("doc_id"),
      GraftFunctions.bpeTokenCount(rtrim(text),
        merges.map(m => (m.left, m.right))).as("n_bpe_tokens"))

  /** Tokenize-and-pack — the final materialization of a training-data
    * pipeline: encode every document under the learned merge table and
    * a deterministic symbol vocabulary, then pack the EOS-separated
    * token stream (documents in `id` order) into fixed-`seqLen`
    * training sequences, GPT-style (a document may straddle a sequence
    * boundary; the trailing partial sequence is dropped).
    *
    * Symbol ids are a pure function of the corpus: base code-point
    * symbols in UTF-8 byte order get 0..B-1, each merge product takes
    * B+rank-1 (first producer wins on string collision), and EOS is
    * B+|merges| — so the id table needs no side file and the Python
    * oracle mirror rebuilds it exactly.
    *
    * 100 TB shape: NO global sort. Document offsets into the token
    * stream come from the same bucketed two-phase prefix sum as
    * Sampling.budgetSelect — per-bucket token totals (tiny relation,
    * one ordered window over buckets only), broadcast bucket prefixes,
    * then a within-bucket window bounded by `bucketSpan` documents.
    * Each document then emits its sequence slices map-side, and the
    * ONE data-sized exchange is keyed by seq_id and carries exactly
    * the output tokens (4 B each) — the materialization itself, not
    * overhead. The result is a pure function of (id, text) under any
    * partitioning (asserted by spec).
    */
  def packIds(spark: SparkSession, docs: DataFrame, id: Column, text: Column,
      nMerges: Int, seqLen: Int, bucketSpan: Int = 1024): DataFrame = {
    val vocabRel = wordCounts(docs, text).persist(StorageLevel.MEMORY_AND_DISK)
    val merges = trainFromVocab(vocabRel, nMerges)
    val baseSyms = vocabRel
      .select(explode(GraftFunctions.bpeInitSyms(col("word"))).as("s"))
      .distinct().collect().map(_.getString(0))
      .sortWith((a, b) =>
        UTF8String.fromString(a).compareTo(UTF8String.fromString(b)) < 0)
    vocabRel.unpersist()
    val ids = new java.util.HashMap[String, Integer]()
    baseSyms.zipWithIndex.foreach { case (s, i) => ids.put(s, i) }
    merges.foreach(m =>
      ids.putIfAbsent(m.left + m.right, baseSyms.length + m.rank - 1))
    val eosId = baseSyms.length + merges.length

    val L = seqLen.toLong
    val enc = docs.select(id.cast("long").as("doc_id"),
        GraftFunctions.bpeEncodeIds(rtrim(text),
          merges.map(m => (m.left, m.right)), ids, eosId).as("ids"))
      .withColumn("n", size(col("ids")).cast("long"))
      .withColumn("_bkt", floor(col("doc_id") / bucketSpan))
    val wb = Window.orderBy(col("_bkt")).rowsBetween(Window.unboundedPreceding, -1)
    // window over the bucket relation only — cardinality = #buckets
    val bktPrev = enc.groupBy(col("_bkt")).agg(sum(col("n")).as("_btot"))
      .withColumn("_prev", coalesce(sum(col("_btot")).over(wb), lit(0L)))
      .select(col("_bkt"), col("_prev"))
    val total = enc.agg(sum(col("n")).as("_t")) // 1-row broadcast aggregate
    val wd = Window.partitionBy(col("_bkt")).orderBy(col("doc_id"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val pieces = enc.join(broadcast(bktPrev), "_bkt")
      .withColumn("off", col("_prev") + coalesce(sum(col("n")).over(wd), lit(0L)))
      .crossJoin(broadcast(total))
      .select(col("ids"), col("off"), col("n"), col("_t"),
        explode(sequence(floor(col("off") / L),
          floor((col("off") + col("n") - 1) / L))).as("seq_id"))
      .filter((col("seq_id") + 1) * L <= col("_t")) // complete sequences only
      .withColumn("start", greatest(col("seq_id") * L, col("off")))
      .withColumn("piece", slice(col("ids"),
        (col("start") - col("off") + 1).cast("int"),
        (least((col("seq_id") + 1) * L, col("off") + col("n")) - col("start")).cast("int")))
    pieces.groupBy(col("seq_id"))
      .agg(sort_array(collect_list(struct(col("start"), col("piece")))).as("_ps"))
      .select(col("seq_id"), flatten(col("_ps").getField("piece")).as("token_ids"))
  }
}
