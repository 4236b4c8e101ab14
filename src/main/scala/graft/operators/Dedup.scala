package graft.operators

import graft.functions.GraftFunctions
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deduplication operators for LLM-data pipelines (SURVEY.md §2D).
  *
  * Scale design: none of these ever materializes the O(n²) pair space.
  * Exact dedup is one hash-aggregate; the near-dup family generates
  * candidates through locality-sensitive bucketing (MinHash bands,
  * SimHash chunks, min-shingle blocks, hyperplane signs) so the
  * shuffle key space is huge and uniform, then verifies only
  * within-bucket pairs. At 100 TB the bucket join is the only
  * shuffle, and AQE's skew-join splitting covers pathological buckets.
  */
object Dedup {

  /** Exact dedup: group on content hash, keep the smallest id.
    * One map-side-combinable aggregate; no joins.
    */
  def exact(docs: DataFrame, id: Column, text: Column): DataFrame =
    docs.groupBy(md5(text).as("text_md5"))
      .agg(min(id).as("keep_id"), count(lit(1)).as("n_dupes"))

  /** Word-k-shingle set per document (distinct). */
  private def shingleCol(k: Int): Column = expr(
    s"""array_distinct(transform(
       |  sequence(0, greatest(size(split(text, ' ')) - $k, 0)),
       |  i -> concat_ws(' ', slice(split(text, ' '), i + 1, $k))))""".stripMargin)

  /** MinHash signature: for each of `numHashes` seeded hash functions,
    * the min over the shingle set. One nested higher-order expression —
    * stays inside codegen, no UDF.
    */
  private def minhashCol(numHashes: Int): Column = expr(
    s"""transform(sequence(0, ${numHashes - 1}),
       |  i -> array_min(transform(_shingles, s -> xxhash64(concat(cast(i as string), '#', s)))))""".stripMargin)

  /** MinHash + LSH near-dup pairs: k-shingles → `bands`×`rowsPerBand`
    * signature → per-band bucket join → within-bucket candidate pairs
    * → exact Jaccard verify ≥ `threshold`.
    */
  def minhashLsh(
      docs: DataFrame,
      k: Int = 3,
      bands: Int = 16,
      rowsPerBand: Int = 4,
      threshold: Double = 0.8): DataFrame = {
    val sigs = docs
      .withColumn("_shingles", shingleCol(k))
      .withColumn("_minhash", minhashCol(bands * rowsPerBand))
      .select(col("doc_id"), col("_shingles"), col("_minhash"))

    val banded = sigs.select(
      col("doc_id"), col("_shingles"),
      explode(expr(
        s"""transform(sequence(0, ${bands - 1}),
           |  b -> named_struct(
           |    'band', b,
           |    'bucket', xxhash64(concat_ws(',', transform(slice(_minhash, b * $rowsPerBand + 1, $rowsPerBand), x -> cast(x as string))))))"""
          .stripMargin)).as("bb"))
      .select(col("doc_id"), col("_shingles"), col("bb.band"), col("bb.bucket"))

    // Candidate pairs: same (band, bucket), ordered ids, deduped across bands.
    val left = banded.select(col("band"), col("bucket"),
      col("doc_id").as("doc_a"), col("_shingles").as("_sh_a"))
    val right = banded.select(col("band"), col("bucket"),
      col("doc_id").as("doc_b"), col("_shingles").as("_sh_b"))
    val candidates = left.join(right, Seq("band", "bucket"))
      .filter(col("doc_a") < col("doc_b"))
      .select(col("doc_a"), col("doc_b"), col("_sh_a"), col("_sh_b"))
      .dropDuplicates("doc_a", "doc_b")

    candidates
      .withColumn("jaccard",
        size(array_intersect(col("_sh_a"), col("_sh_b"))).cast("double") /
          size(array_union(col("_sh_a"), col("_sh_b"))))
      .filter(col("jaccard") >= threshold)
      .select(col("doc_a"), col("doc_b"), round(col("jaccard"), 4).as("jaccard"))
  }

  /** SimHash near-dup pairs: 64-bit fingerprint, candidates share at
    * least one of 4 16-bit chunks (pigeonhole: hamming ≤ 3 guarantees
    * a shared chunk; we verify up to `maxHamming`), verified with
    * bit_count(xor).
    */
  def simhash(docs: DataFrame, maxHamming: Int = 8): DataFrame = {
    val sigs = docs.select(col("doc_id"),
      GraftFunctions.simhash64(col("text")).as("sig"))
    val chunked = sigs.select(col("doc_id"), col("sig"),
      explode(expr(
        """transform(sequence(0, 3),
          |  c -> named_struct('chunk', c, 'val', shiftright(sig, c * 16) & 65535))""".stripMargin)).as("cc"))
      .select(col("doc_id"), col("sig"), col("cc.chunk"), col("cc.val"))
    val left = chunked.select(col("chunk"), col("val"), col("doc_id").as("doc_a"), col("sig").as("sig_a"))
    val right = chunked.select(col("chunk"), col("val"), col("doc_id").as("doc_b"), col("sig").as("sig_b"))
    left.join(right, Seq("chunk", "val"))
      .filter(col("doc_a") < col("doc_b"))
      .dropDuplicates("doc_a", "doc_b")
      .withColumn("hamming", bit_count(col("sig_a").bitwiseXOR(col("sig_b"))))
      .filter(col("hamming") <= maxHamming)
      .select(col("doc_a"), col("doc_b"), col("hamming"))
  }

  /** n-gram Jaccard with single-min-hash blocking: documents block on
    * the minimum shingle hash (near-dups with Jaccard j share it with
    * probability j), then exact Jaccard within blocks.
    */
  def ngramJaccard(docs: DataFrame, k: Int = 3, threshold: Double = 0.7): DataFrame = {
    val withBlock = docs
      .withColumn("_shingles", shingleCol(k))
      .withColumn("_block", expr("array_min(transform(_shingles, s -> xxhash64(s)))"))
      .select(col("doc_id"), col("_shingles"), col("_block"))
    val left = withBlock.select(col("_block"), col("doc_id").as("doc_a"), col("_shingles").as("_sh_a"))
    val right = withBlock.select(col("_block"), col("doc_id").as("doc_b"), col("_shingles").as("_sh_b"))
    left.join(right, Seq("_block"))
      .filter(col("doc_a") < col("doc_b"))
      .withColumn("jaccard",
        size(array_intersect(col("_sh_a"), col("_sh_b"))).cast("double") /
          size(array_union(col("_sh_a"), col("_sh_b"))))
      .filter(col("jaccard") >= threshold)
      .select(col("doc_a"), col("doc_b"), round(col("jaccard"), 4).as("jaccard"))
  }

  /** Embedding-cosine near-dup pairs: candidates from random-hyperplane
    * sign buckets (see [[Similarity.signature]]), cosine verified.
    */
  def embeddingCosine(embeddings: DataFrame, bits: Int = 8, threshold: Double = 0.35): DataFrame = {
    val withSig = embeddings
      .withColumn("_norm", Similarity.l2norm(col("embedding")))
      .withColumn("_sig", Similarity.signature(col("embedding"), bits))
      .select(col("vec_id"), col("embedding"), col("_norm"), col("_sig"))
    val left = withSig.select(col("_sig"), col("vec_id").as("vec_a"),
      col("embedding").as("_e_a"), col("_norm").as("_n_a"))
    val right = withSig.select(col("_sig"), col("vec_id").as("vec_b"),
      col("embedding").as("_e_b"), col("_norm").as("_n_b"))
    left.join(right, Seq("_sig"))
      .filter(col("vec_a") < col("vec_b"))
      .withColumn("cosine",
        Similarity.dot(col("_e_a"), col("_e_b")) / (col("_n_a") * col("_n_b")))
      .filter(col("cosine") >= threshold)
      .select(col("vec_a"), col("vec_b"), round(col("cosine"), 4).as("cosine"))
  }
}
