package graft.operators

import scala.collection.mutable.ArrayBuffer

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

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
    vocab.unpersist()
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
}
