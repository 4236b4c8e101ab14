package graft.queries

import graft.Tables
import graft.catalog.Catalog
import graft.operators.{Pq, Similarity, Snapshot}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Standing (persisted) index surface — the 100 TB SERVING path the
  * per-query operators deliberately do not exercise: ANN artifacts
  * (codebooks, centroids, the PQ-coded corpus) and the incremental-
  * reconciliation band-signature index are engine-managed parquet
  * tables, built ONCE, registered in the persistent [[Catalog]] as
  * INDEX entries (listed by GET /catalog), and served from disk — so a
  * search or a snapshot ingest runs ZERO training/encoding jobs over
  * the corpus. The reference has no index notion at all (every /fetch
  * re-reads files, data_source/context.rs); at 100 TB, re-training
  * centroids or re-banding the retained corpus per query is the one
  * shape that cannot survive, so the standing artifacts are the
  * production form of the sim_topk and corpus_delta families.
  *
  * Each `*_indexed` query is gated against the SAME oracle as its
  * training twin: the persisted artifacts are bit-identical to the
  * in-session ones (fixed-point training, exact float/double parquet
  * roundtrip), so the served results hash-match the committed
  * fixtures.
  */
object IndexOps {

  type Q = (SparkSession, String) => DataFrame

  private def scratch(dir: String, leaf: String): String = {
    val key = dir.replaceAll("[^A-Za-z0-9]", "_")
    s"${sys.props("java.io.tmpdir")}/graft-scratch/$key/$leaf"
  }

  // index builds are rare and disjoint; one JVM-wide lock serializes
  // them so concurrent Verify threads can't double-build an artifact
  private val buildLock = new Object

  /** Fingerprint of the SOURCE corpus behind an artifact: a hash over
    * the sorted (relative path, size, mtime) listing of the table's
    * parquet file(s). Folded into the artifact dir name, so a corpus
    * rewrite under the same path makes every dependent artifact
    * automatically STALE — the next `ensure` rebuilds into a fresh
    * versioned dir instead of silently serving the old generation
    * (the freshness contract; the catalog's latest INDEX registration
    * always names the serving generation).
    */
  private[graft] def sourceVersion(dir: String, table: String): String = {
    val root = java.nio.file.Paths.get(dir, s"$table.parquet")
    import scala.jdk.CollectionConverters._
    val listing =
      if (!java.nio.file.Files.exists(root)) "absent"
      else java.nio.file.Files.walk(root).iterator().asScala
        .filter(java.nio.file.Files.isRegularFile(_))
        .map(p => s"${root.relativize(p)}|${java.nio.file.Files.size(p)}|" +
          s"${java.nio.file.Files.getLastModifiedTime(p).toMillis}")
        .toSeq.sorted.mkString("\n")
    Integer.toHexString(
      scala.util.hashing.MurmurHash3.stringHash(listing) & 0x7fffffff)
  }

  /** Materialize `build` at the standing location for (`dir`, `name`,
    * source fingerprint) exactly once — cross-thread via [[buildLock]],
    * cross-process via a file lock + the Hadoop `_SUCCESS` marker
    * (same convention as Engine.materializeBucketed) — registering the
    * artifact in the engine catalog (entryType INDEX) on first build.
    * Returns true iff this call built it.
    */
  private[queries] def ensure(spark: SparkSession, dir: String, name: String,
      sourceTable: String)(build: => DataFrame): Boolean = buildLock.synchronized {
    val path = versionedPath(dir, name, sourceTable)
    val p = java.nio.file.Paths.get(path)
    if (java.nio.file.Files.exists(p.resolve("_SUCCESS"))) return false
    java.nio.file.Files.createDirectories(p.getParent)
    val lockPath = p.getParent.resolve(s".$name.lock")
    val ch = java.nio.channels.FileChannel.open(lockPath,
      java.nio.file.StandardOpenOption.CREATE, java.nio.file.StandardOpenOption.WRITE)
    try {
      val lock = ch.lock()
      try {
        if (java.nio.file.Files.exists(p.resolve("_SUCCESS"))) false
        else {
          val df = build
          df.write.mode("overwrite").parquet(path)
          df.unpersist() // trained relations arrive persisted; release
          new Catalog(scratch(dir, "catalog")).register(
            s"idx_$name", path, Nil,
            Some("standing index artifact"), entryType = "INDEX")
          true
        }
      } finally lock.release()
    } finally ch.close()
  }

  private def versionedPath(dir: String, name: String, sourceTable: String): String =
    scratch(dir, s"index/$name-${sourceVersion(dir, sourceTable)}.parquet")

  private def load(spark: SparkSession, dir: String, name: String,
      sourceTable: String): DataFrame =
    spark.read.parquet(versionedPath(dir, name, sourceTable))

  /** Build-if-absent the PQ standing index for `dir`'s embeddings:
    * the seed codebooks and the coded corpus (vec_id, codes[m], vnorm,
    * rnorm — ~m+12 bytes/vector). Returns true iff anything was built.
    */
  def ensurePqIndex(spark: SparkSession, dir: String): Boolean = {
    val emb = Tables(spark, dir, "embeddings")
    val b1 = ensure(spark, dir, "ann_pq_books", "embeddings")(
      Pq.codebooks(emb, m = 8, ksub = 16, dim = 64))
    val b2 = ensure(spark, dir, "ann_pq_coded", "embeddings")(
      Pq.encode(emb, load(spark, dir, "ann_pq_books", "embeddings"), m = 8, dim = 64))
    b1 || b2
  }

  /** Build-if-absent the IVF-PQ standing index in sim_topk_ivfpq's
    * PRODUCTION configuration: seed centroids, Lloyd-trained codebooks
    * (2 iters, fixed-point — bit-reproducible), and the coded+celled
    * corpus. Returns true iff anything was built.
    */
  def ensureIvfPqIndex(spark: SparkSession, dir: String): Boolean = {
    val emb = Tables(spark, dir, "embeddings")
    val b1 = ensure(spark, dir, "ann_centroids", "embeddings")(
      Similarity.centroidsFor(emb, 16, kmeansIters = 0))
    val b2 = ensure(spark, dir, "ann_ivfpq_books", "embeddings")(
      Pq.trainCodebooks(emb, m = 8, ksub = 16, dim = 64, iters = 2))
    val b3 = ensure(spark, dir, "ann_ivfpq_coded", "embeddings")(
      Pq.ivfPqIndex(emb, load(spark, dir, "ann_centroids", "embeddings"),
        load(spark, dir, "ann_ivfpq_books", "embeddings"), m = 8, dim = 64))
    b1 || b2 || b3
  }

  /** PQ search SERVED from the standing index — same parameters and
    * oracle as sim_topk_pq, but the plan scans the persisted coded
    * corpus and codebooks: no codebook derivation, no encode jobs
    * (spec-asserted in IndexOpsSpec). Exact vectors are fetch-joined
    * only for the top-R re-rank, as in serving.
    */
  def sim_topk_pq_indexed(spark: SparkSession, dir: String): DataFrame = {
    ensurePqIndex(spark, dir)
    val emb = Tables(spark, dir, "embeddings")
    Pq.topKPqOnIndex(load(spark, dir, "ann_pq_coded", "embeddings"), emb,
      emb.filter(col("vec_id") < 64), k = 5,
      load(spark, dir, "ann_pq_books", "embeddings"), m = 8, dim = 64, rerankMult = 8)
      .orderBy(col("query_id"), col("rank"))
  }

  /** IVF-PQ search SERVED from the standing index — sim_topk_ivfpq's
    * production config (trained books, norm-corrected ADC) with zero
    * training jobs at query time: centroids, codebooks and the
    * coded+celled corpus all come from the persisted artifacts.
    */
  def sim_topk_ivfpq_indexed(spark: SparkSession, dir: String): DataFrame = {
    ensureIvfPqIndex(spark, dir)
    val emb = Tables(spark, dir, "embeddings")
    Pq.topKIvfPqOnIndex(load(spark, dir, "ann_ivfpq_coded", "embeddings"), emb,
      emb.filter(col("vec_id") < 64), k = 5,
      load(spark, dir, "ann_centroids", "embeddings"), load(spark, dir, "ann_ivfpq_books", "embeddings"),
      nProbe = 4, m = 8, dim = 64, rerankMult = 8, normCorrect = true)
      .orderBy(col("query_id"), col("rank"))
  }

  /** Incremental crawl reconciliation SERVED from a standing band-
    * signature index (same snapshot roles and oracle as corpus_delta):
    * the old corpus's band index persists once; the ingest maintains
    * it O(changed) and probes added docs against it O(added) — the
    * retained corpus is never re-banded (Snapshot.deltaOnIndex).
    */
  def corpus_delta_indexed(spark: SparkSession, dir: String): DataFrame = {
    val d = Tables(spark, dir, "documents")
    val oldSnap = d.filter(pmod(col("doc_id"), lit(17)) =!= 3)
      .select(col("doc_id"), col("text"))
    val newSnap = d.filter(pmod(col("doc_id"), lit(19)) =!= 5)
      .select(col("doc_id"),
        when(pmod(col("doc_id"), lit(13)) === 2, concat(col("text"), lit(" rev7")))
          .otherwise(col("text")).as("text"))
    ensure(spark, dir, "band_old", "documents")(Snapshot.bandIndex(oldSnap))
    Snapshot.deltaOnIndex(oldSnap, newSnap, load(spark, dir, "band_old", "documents"))
      .orderBy(col("doc_id"))
  }

  val queries: Map[String, Q] = Map(
    "sim_topk_pq_indexed" -> (sim_topk_pq_indexed _),
    "sim_topk_ivfpq_indexed" -> (sim_topk_ivfpq_indexed _),
    "corpus_delta_indexed" -> (corpus_delta_indexed _))

  val oracles: Map[String, String] = Map(
    // served results must hash-match the training twins' fixtures
    "sim_topk_pq_indexed" -> LlmOps.fixtureSql("sim_topk_pq", "embeddings"),
    "sim_topk_ivfpq_indexed" -> LlmOps.fixtureSql("sim_topk_ivfpq", "embeddings"),
    "corpus_delta_indexed" -> LlmOps.corpusDeltaOracle)
}
