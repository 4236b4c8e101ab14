package graft.queries

import graft.Tables
import graft.catalog.Catalog
import graft.operators.{Opq, Pq, Similarity, Snapshot, Sq8}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Standing (persisted) index surface — the 100 TB SERVING path the
  * per-query operators deliberately do not exercise: ANN artifacts
  * (codebooks, centroids, grids, rotations, signatures, the coded
  * corpus) and the incremental-reconciliation band-signature index are
  * engine-managed parquet tables, built ONCE, registered in the
  * persistent [[Catalog]] as INDEX entries carrying their source-corpus
  * generation (listed by GET /catalog, refreshable by POST
  * /index/refresh), and served from disk — so a search or a snapshot
  * ingest runs ZERO training/encoding jobs over the corpus. The
  * reference has no index notion at all (every /fetch re-reads files,
  * data_source/context.rs); at 100 TB, re-training centroids or
  * re-banding the retained corpus per query is the one shape that
  * cannot survive, so the standing artifacts are the production form
  * of the sim_topk and corpus_delta families.
  *
  * Each `*_indexed` query is gated against the SAME oracle as its
  * training twin: the persisted artifacts are bit-identical to the
  * in-session ones (fixed-point training, exact float/double parquet
  * roundtrip), so the served results hash-match the committed
  * fixtures.
  */
object IndexOps {

  type Q = (SparkSession, String) => DataFrame

  /** Root for engine-managed durable state (standing indexes + the
    * catalog that names them). A deployment points this at a shared
    * durable path — `spark.graft.engineDir` conf or `GRAFT_ENGINE_DIR`
    * env, e.g. a DATA_DIR-relative directory on the cluster FS; the
    * default is local tmp scratch, the only writable location in the
    * gate (the driver's testdata dirs are read-only, so artifacts
    * cannot live inside the corpus dir itself). NOTE: the catalog
    * JSONL and build locks use driver-local file IO, so the engine dir
    * must be driver-mountable (NFS/EFS-class); the artifact parquet
    * itself reads/writes through Spark and works on any Hadoop FS.
    */
  private def engineRoot(spark: SparkSession): String =
    spark.conf.getOption("spark.graft.engineDir")
      .orElse(sys.env.get("GRAFT_ENGINE_DIR"))
      .getOrElse(s"${sys.props("java.io.tmpdir")}/graft-scratch")

  private def scratch(spark: SparkSession, dir: String, leaf: String): String = {
    val key = dir.replaceAll("[^A-Za-z0-9]", "_")
    s"${engineRoot(spark)}/$key/$leaf"
  }

  private[queries] def catalogFor(spark: SparkSession, dir: String): Catalog =
    new Catalog(scratch(spark, dir, "catalog"))

  // index builds are rare and disjoint; a PER-ARTIFACT lock (keyed by
  // dir/name) lets independent artifacts build CONCURRENTLY — the
  // builds are many tiny jobs, so overlapping their driver-side
  // planning/scheduling latency is where the wall time goes (guide
  // §2.6: overlap independent jobs) — while two threads ensuring the
  // SAME artifact still serialize (no double-build). The catalog file
  // is shared across artifacts, so registrations take a global lock.
  private val buildLocks =
    new java.util.concurrent.ConcurrentHashMap[String, Object]()
  private def buildLockFor(dir: String, name: String): Object =
    buildLocks.computeIfAbsent(s"$dir/$name", _ => new Object)
  private val catalogLock = new Object

  /** Fingerprint of the SOURCE corpus behind an artifact: a hash over
    * the sorted (relative path, size, mtime) listing of the table's
    * parquet file(s), taken through Hadoop's FileSystem so it works on
    * any production FS (s3a://, hdfs://) exactly like the read path —
    * a local-only walk would silently report "absent" off-box and
    * defeat the staleness contract where it matters most. Folded into
    * the artifact dir name, so a corpus rewrite under the same path
    * makes every dependent artifact automatically STALE — the next
    * `ensure` rebuilds into a fresh versioned dir instead of silently
    * serving the old generation (the freshness contract; the catalog's
    * latest INDEX registration always names the serving generation).
    *
    * At very large file counts an O(files) driver listing is the wrong
    * tool; a deployment publishes a cheap monotonic source instead —
    * set `spark.graft.sourceVersion.<table>` (snapshot id, partition
    * watermark) and the listing is skipped entirely.
    */
  private[graft] def sourceVersion(spark: SparkSession, dir: String, table: String): String = {
    val listing = spark.conf.getOption(s"spark.graft.sourceVersion.$table").getOrElse {
      val root = new org.apache.hadoop.fs.Path(dir, s"$table.parquet")
      val fs = root.getFileSystem(spark.sessionState.newHadoopConf())
      if (!fs.exists(root)) "absent"
      else {
        val prefix = fs.makeQualified(root).toString
        val it = fs.listFiles(root, true)
        val buf = scala.collection.mutable.ArrayBuffer.empty[String]
        while (it.hasNext) {
          val st = it.next()
          if (st.isFile)
            buf += s"${st.getPath.toString.stripPrefix(prefix)}|${st.getLen}|${st.getModificationTime}"
        }
        buf.sorted.mkString("\n")
      }
    }
    Integer.toHexString(
      scala.util.hashing.MurmurHash3.stringHash(listing) & 0x7fffffff)
  }

  /** Materialize `build` at the standing location for (`dir`, `name`,
    * source fingerprint) exactly once — cross-thread via [[buildLock]],
    * cross-process via a file lock + the Hadoop `_SUCCESS` marker
    * (same convention as Engine.materializeBucketed) — registering the
    * artifact in the engine catalog (entryType INDEX, generation =
    * source fingerprint) on first build and PRUNING superseded
    * generations of the same artifact (a corpus that rewrites monthly
    * would otherwise accumulate a full index copy per rewrite).
    * Returns true iff this call built it.
    */
  private[queries] def ensure(spark: SparkSession, dir: String, name: String,
      sourceTable: String)(build: => DataFrame): Boolean =
      buildLockFor(dir, name).synchronized {
    val gen = sourceVersion(spark, dir, sourceTable)
    val path = versionedPathFor(spark, dir, name, gen)
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
          val t0 = System.nanoTime()
          val df = build
          df.write.mode("overwrite").parquet(path)
          df.unpersist() // trained relations arrive persisted; release
          // per-artifact build timing, opt-in (round-9 advice: don't
          // spam stderr on every build by default)
          if (spark.conf.getOption("spark.graft.index.logBuilds").contains("true"))
            System.err.println(f"[index-build] $name ${(System.nanoTime() - t0) / 1e9}%.2f s")
          catalogLock.synchronized {
            catalogFor(spark, dir).register(
              s"idx_$name", path, Nil,
              Some("standing index artifact"), entryType = "INDEX",
              generation = Some(gen))
          }
          pruneStale(p.getParent, name, gen)
          true
        }
      } finally lock.release()
    } finally ch.close()
  }

  /** Delete superseded generations of `name` (sibling
    * `name-<otherFp>.parquet` dirs): once the new generation carries
    * `_SUCCESS` and the catalog points at it, the old copies are dead
    * weight — without this every corpus rewrite permanently accumulates
    * a full index copy. The catalog keeps latest-per-ref, so the
    * superseded registrations fall away on read.
    */
  private def pruneStale(parent: java.nio.file.Path, name: String, keepGen: String): Unit = {
    val re = java.util.regex.Pattern.compile(
      java.util.regex.Pattern.quote(name) + "-([0-9a-f]+)\\.parquet")
    val stale = java.nio.file.Files.list(parent).iterator()
    try {
      import scala.jdk.CollectionConverters._
      stale.asScala.toSeq.foreach { sib =>
        val m = re.matcher(sib.getFileName.toString)
        if (m.matches() && m.group(1) != keepGen)
          graft.streaming.StreamingEvents.rmTree(sib)
      }
    } finally ()
  }

  private def versionedPathFor(spark: SparkSession, dir: String, name: String,
      gen: String): String =
    scratch(spark, dir, s"index/$name-$gen.parquet")

  private def versionedPath(spark: SparkSession, dir: String, name: String,
      sourceTable: String): String =
    versionedPathFor(spark, dir, name, sourceVersion(spark, dir, sourceTable))

  private[queries] def load(spark: SparkSession, dir: String, name: String,
      sourceTable: String = "embeddings"): DataFrame =
    spark.read.parquet(versionedPath(spark, dir, name, sourceTable))

  /** Build-if-absent the PQ standing index for `dir`'s embeddings:
    * the seed codebooks and the coded corpus (vec_id, codes[m], vnorm,
    * rnorm — ~m+12 bytes/vector). Returns true iff anything was built.
    */
  def ensurePqIndex(spark: SparkSession, dir: String): Boolean = {
    val emb = Tables(spark, dir, "embeddings")
    val b1 = ensure(spark, dir, "ann_pq_books", "embeddings")(
      Pq.codebooks(emb, m = 8, ksub = 16, dim = 64))
    val b2 = ensure(spark, dir, "ann_pq_coded", "embeddings")(
      Pq.encode(emb, load(spark, dir, "ann_pq_books"), m = 8, dim = 64))
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
      Pq.ivfPqIndex(emb, load(spark, dir, "ann_centroids"),
        load(spark, dir, "ann_ivfpq_books"), m = 8, dim = 64))
    b1 || b2 || b3
  }

  /** Build-if-absent the plain-IVF standing index (seed centroids +
    * celled corpus with norms — sim_topk_ivf's serving relation).
    */
  def ensureIvfIndex(spark: SparkSession, dir: String): Boolean = {
    val emb = Tables(spark, dir, "embeddings")
    val b1 = ensure(spark, dir, "ann_centroids", "embeddings")(
      Similarity.centroidsFor(emb, 16, kmeansIters = 0))
    val b2 = ensure(spark, dir, "ann_ivf_cells", "embeddings")(
      Similarity.ivfIndex(emb, load(spark, dir, "ann_centroids")))
    b1 || b2
  }

  /** Build-if-absent the LSH standing index: the corpus-side
    * multi-table hyperplane signatures in sim_topk_lsh's config.
    */
  def ensureLshIndex(spark: SparkSession, dir: String): Boolean = {
    val emb = Tables(spark, dir, "embeddings")
    ensure(spark, dir, "ann_lsh_sigs", "embeddings")(
      Similarity.lshIndex(emb, bits = 6, tables = 8))
  }

  /** Build-if-absent the SQ8 standing index: the per-dim min/max grid
    * relation and the 1-byte/dim coded corpus.
    */
  def ensureSq8Index(spark: SparkSession, dir: String): Boolean = {
    val emb = Tables(spark, dir, "embeddings")
    val b1 = ensure(spark, dir, "ann_sq8_grid", "embeddings")(
      Sq8.gridRelation(emb))
    val b2 = ensure(spark, dir, "ann_sq8_coded", "embeddings") {
      val (mins, scales) = Sq8.gridFrom(load(spark, dir, "ann_sq8_grid"), 64)
      Sq8.codedIndex(emb, mins, scales)
    }
    b1 || b2
  }

  /** Build-if-absent the OPQ standing index: the (rotation,
    * permutation) transform, the Lloyd-trained codebooks over the
    * transformed corpus, and the coded transformed corpus.
    */
  def ensureOpqIndex(spark: SparkSession, dir: String): Boolean = {
    val emb = Tables(spark, dir, "embeddings")
    val b1 = ensure(spark, dir, "ann_opq_transform", "embeddings")(
      Opq.transformRelation(emb, m = 8, dim = 64))
    // ONE persisted transformed-corpus relation shared by the books
    // training and the encode (guide §2.4: the rotation apply — a full
    // corpus map — ran once per consumer). Built lazily so the warm
    // path (both artifacts present) still reads nothing; unpersisted
    // after the chain, matching the trainCodebooks subs lifecycle.
    var cached: Option[DataFrame] = None
    def transformed = cached.getOrElse {
      val (flat, perm) = Opq.transformFrom(load(spark, dir, "ann_opq_transform"))
      val t = Opq.applyTransform(emb, flat, perm, 64)
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      cached = Some(t)
      t
    }
    try {
      val b2 = ensure(spark, dir, "ann_opq_books", "embeddings")(
        Pq.trainCodebooks(transformed, m = 8, ksub = 16, dim = 64, iters = 2))
      val b3 = ensure(spark, dir, "ann_opq_coded", "embeddings")(
        Pq.encode(transformed, load(spark, dir, "ann_opq_books"), m = 8, dim = 64))
      b1 || b2 || b3
    } finally cached.foreach(_.unpersist())
  }

  /** Build-if-absent the extra artifacts sim_recall_report's arms ride
    * beyond the per-family indexes: the seed-book celled PQ corpus
    * (the report's ivfpq arms deliberately measure SEED books, unlike
    * sim_topk_ivfpq's trained ones) and the Lloyd-refined (3-iter)
    * centroid set + celled corpus for the ivf_kmeans arm.
    */
  def ensureRecallExtras(spark: SparkSession, dir: String): Boolean = {
    val emb = Tables(spark, dir, "embeddings")
    // The six family chains are independent of each other (per-artifact
    // locks make the shared ann_centroids safe), and each chain is many
    // TINY jobs — wall time is driver-side planning/scheduling latency,
    // not CPU. Overlap them on a small pool (guide §2.6); only
    // ann_pq_celled waits for the two chains it reads from. Cold-build
    // wall for the full artifact set dropped ~3× at sf0.1.
    import scala.concurrent.{Await, ExecutionContext, Future}
    import scala.concurrent.duration.Duration
    // 6 threads = one per independent family chain (pq/ivf/lsh/sq8/
    // opq/k3; ann_pq_celled sequences behind pq+ivf) — at 4, two
    // chains queued behind the others for no reason; the builds are
    // driver-latency-bound, not CPU-bound, so a thread per chain is
    // the whole point of the overlap (guide §2.6).
    val pool = java.util.concurrent.Executors.newFixedThreadPool(6)
    implicit val ec: ExecutionContext = ExecutionContext.fromExecutorService(pool)
    try {
      val fPq = Future(ensurePqIndex(spark, dir))
      val fIvf = Future(ensureIvfIndex(spark, dir))
      val fLsh = Future(ensureLshIndex(spark, dir))
      val fSq8 = Future(ensureSq8Index(spark, dir))
      val fOpq = Future(ensureOpqIndex(spark, dir))
      val fK3 = Future {
        val b1 = ensure(spark, dir, "ann_centroids_k3", "embeddings")(
          Similarity.centroidsFor(emb, 16, kmeansIters = 3))
        val b2 = ensure(spark, dir, "ann_ivf_k3_cells", "embeddings")(
          Similarity.ivfIndex(emb, load(spark, dir, "ann_centroids_k3")))
        b1 || b2
      }
      val fCelled = fPq.zip(fIvf).map { case (bPq, bIvf) =>
        val b = ensure(spark, dir, "ann_pq_celled", "embeddings")(
          load(spark, dir, "ann_pq_coded").join(
            Similarity.assignCells(emb, load(spark, dir, "ann_centroids"),
              "vec_id", "embedding", keep = 1)
              .withColumnRenamed("cid", "_cell"), "vec_id"))
        bPq || bIvf || b
      }
      val built = Await.result(
        Future.sequence(Seq(fLsh, fSq8, fOpq, fK3, fCelled)), Duration.Inf)
      built.contains(true)
    } finally pool.shutdown()
  }

  /** Refresh every standing ANN index family for `dir` — idempotent by
    * construction (each `ensure` is a no-op when the artifact for the
    * CURRENT source generation already exists, and a full rebuild when
    * the corpus was rewritten). The HTTP surface exposes this as POST
    * /index/refresh so a deployment can re-point the serving artifacts
    * after a corpus change without a Scala entrypoint. Returns
    * family -> whether anything was (re)built.
    */
  def refresh(spark: SparkSession, dir: String): Map[String, Boolean] = Map(
    "pq" -> ensurePqIndex(spark, dir),
    "ivfpq" -> ensureIvfPqIndex(spark, dir),
    "ivf" -> ensureIvfIndex(spark, dir),
    "lsh" -> ensureLshIndex(spark, dir),
    "sq8" -> ensureSq8Index(spark, dir),
    "opq" -> ensureOpqIndex(spark, dir),
    "recall_extras" -> ensureRecallExtras(spark, dir))

  /** The INDEX registrations for `dir` (latest generation per
    * artifact) — what GET /catalog mirrors after a refresh.
    */
  def indexEntries(spark: SparkSession, dir: String): Seq[graft.catalog.CatalogEntry] =
    catalogFor(spark, dir).listTables.filter(_.entryType == "INDEX")

  /** PQ search SERVED from the standing index — same parameters and
    * oracle as sim_topk_pq, but the plan scans the persisted coded
    * corpus and codebooks: no codebook derivation, no encode jobs
    * (spec-asserted in IndexOpsSpec). Exact vectors are fetch-joined
    * only for the top-R re-rank, as in serving.
    */
  def sim_topk_pq_indexed(spark: SparkSession, dir: String): DataFrame = {
    ensurePqIndex(spark, dir)
    val emb = Tables(spark, dir, "embeddings")
    Pq.topKPqOnIndex(load(spark, dir, "ann_pq_coded"), emb,
      emb.filter(col("vec_id") < 64), k = 5,
      load(spark, dir, "ann_pq_books"), m = 8, dim = 64, rerankMult = 8)
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
    Pq.topKIvfPqOnIndex(load(spark, dir, "ann_ivfpq_coded"), emb,
      emb.filter(col("vec_id") < 64), k = 5,
      load(spark, dir, "ann_centroids"), load(spark, dir, "ann_ivfpq_books"),
      nProbe = 4, m = 8, dim = 64, rerankMult = 8, normCorrect = true)
      .orderBy(col("query_id"), col("rank"))
  }

  /** IVF search SERVED from the standing celled corpus — zero corpus
    * jobs at query time (only the 64-query cell assignment runs live).
    */
  def sim_topk_ivf_indexed(spark: SparkSession, dir: String): DataFrame = {
    ensureIvfIndex(spark, dir)
    val emb = Tables(spark, dir, "embeddings")
    Similarity.topKIvfOnIndex(load(spark, dir, "ann_ivf_cells"),
      emb.filter(col("vec_id") < 64), k = 5,
      load(spark, dir, "ann_centroids"), nProbe = 4)
      .orderBy(col("query_id"), col("rank"))
  }

  /** LSH search SERVED from the standing signature relation — the
    * corpus is never re-hashed; query signatures compute live (tiny).
    */
  def sim_topk_lsh_indexed(spark: SparkSession, dir: String): DataFrame = {
    ensureLshIndex(spark, dir)
    val emb = Tables(spark, dir, "embeddings")
    Similarity.topKLshOnIndex(load(spark, dir, "ann_lsh_sigs"), emb,
      emb.filter(col("vec_id") < 64), k = 5, bits = 6, tables = 8)
      .orderBy(col("query_id"), col("rank"))
  }

  /** SQ8 search SERVED from the standing grid + coded corpus — no
    * min/max aggregate, no encode scan at query time.
    */
  def sim_topk_sq8_indexed(spark: SparkSession, dir: String): DataFrame = {
    ensureSq8Index(spark, dir)
    val emb = Tables(spark, dir, "embeddings")
    val (mins, scales) = Sq8.gridFrom(load(spark, dir, "ann_sq8_grid"), 64)
    Sq8.topKSq8OnIndex(load(spark, dir, "ann_sq8_coded"), emb,
      emb.filter(col("vec_id") < 64), k = 5, mins, scales, rerankMult = 8)
      .orderBy(col("query_id"), col("rank"))
  }

  /** OPQ search SERVED from the standing transform + books + coded
    * corpus — no PCA/Jacobi, no Lloyd training, no encode scan at
    * query time; the re-rank rotates only its candidate rows.
    */
  def sim_topk_opq_indexed(spark: SparkSession, dir: String): DataFrame = {
    ensureOpqIndex(spark, dir)
    val emb = Tables(spark, dir, "embeddings")
    Opq.topKOpqOnIndex(load(spark, dir, "ann_opq_transform"),
      load(spark, dir, "ann_opq_books"), load(spark, dir, "ann_opq_coded"),
      emb, emb.filter(col("vec_id") < 64), k = 5, m = 8, dim = 64, rerankMult = 8)
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
    "sim_topk_ivf_indexed" -> (sim_topk_ivf_indexed _),
    "sim_topk_lsh_indexed" -> (sim_topk_lsh_indexed _),
    "sim_topk_sq8_indexed" -> (sim_topk_sq8_indexed _),
    "sim_topk_opq_indexed" -> (sim_topk_opq_indexed _),
    "corpus_delta_indexed" -> (corpus_delta_indexed _))

  val oracles: Map[String, String] = Map(
    // served results must hash-match the training twins' fixtures
    "sim_topk_pq_indexed" -> LlmOps.fixtureSql("sim_topk_pq", "embeddings"),
    "sim_topk_ivfpq_indexed" -> LlmOps.fixtureSql("sim_topk_ivfpq", "embeddings"),
    "sim_topk_ivf_indexed" -> LlmOps.fixtureSql("sim_topk_ivf", "embeddings"),
    "sim_topk_lsh_indexed" -> LlmOps.fixtureSql("sim_topk_lsh", "embeddings"),
    "sim_topk_sq8_indexed" -> LlmOps.fixtureSql("sim_topk_sq8", "embeddings"),
    "sim_topk_opq_indexed" -> LlmOps.fixtureSql("sim_topk_opq", "embeddings"),
    "corpus_delta_indexed" -> LlmOps.corpusDeltaOracle)
}
