package graft.operators

import java.awt.image.BufferedImage
import java.io.{ByteArrayInputStream, ByteArrayOutputStream}

import javax.imageio.ImageIO

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Decoded metadata for one media blob — width/height/format read from
  * the REAL codec header (javax.imageio), not the blob's byte count.
  */
case class MediaMeta(
    doc_id: Long,
    media_type: String,
    width: Int,
    height: Int,
    n_pixels: Long,
    format: String)

/** One sampled "frame" of a media blob. */
case class FrameSample(doc_id: Long, frame_idx: Int, byte_offset: Long, frame_byte: Int)

/** Resize-plan metadata for one media blob. */
case class ResizeMeta(doc_id: Long, width: Int, height: Int, out_w: Int, out_h: Int)

/** Multimodal-column plumbing (SURVEY.md §2D).
  *
  * Media rides as opaque `binary` columns with typed metadata beside
  * it. IMAGES ARE REAL as of round 7: the JDK ships PNG/JPEG/BMP/GIF
  * codecs in javax.imageio, so the decode/feature steps
  * ([[decodeMeta]], [[resizeMeta]], [[phashDedup]]) parse actual
  * image headers and pixels. The test corpus carries no blobs, so
  * [[withSyntheticImages]] renders a deterministic grayscale gradient
  * PNG per document (spec below — integer-only, so the independent
  * Python oracle derives every expected pixel without a codec; PNG is
  * lossless, so decode returns exactly the generated raster). AUDIO
  * is real via javax.sound.sampled ([[Audio]]) and multi-frame VIDEO
  * is real for animated GIF via the same javax.imageio ([[Video]]);
  * only GENERAL video containers (MP4/WebM — no such codec in the
  * JDK) keep the declared byte-offset stub [[sampleFrames]], which
  * demonstrates the fan-out plumbing over raw bytes.
  *
  * Synthetic image spec (all integer arithmetic, doc_id-only):
  *   w = 16 + doc_id % 17, h = 16 + doc_id % 13
  *   cell(x, y) = (y*8/h)*8 + (x*8/w)            (the 8×8 coarse grid)
  *   px(x, y) = splitmix64(doc_id·64 + cell) >>> 56   (top byte)
  * — a per-doc pseudorandom COARSE block pattern (splitmix64 of the
  * (doc, cell) index; a mere multiplicative rotor is near-arithmetic
  * in its top byte and aHash phase-cancels it into mass collisions):
  * every doc's 8×8 block-mean profile is an independent 64-byte code,
  * so perceptual hashes are doc-distinctive, while the coarse
  * structure survives small pixel perturbations and lossy re-encodes
  * like a natural image's low frequencies do.
  */
object Multimodal {

  // ImageIO defaults to a disk-backed stream cache (a temp FILE per
  // encode/decode) — pure overhead for KB-sized in-memory blobs; the
  // heap cache is strictly faster here and per-JVM global is safe
  // (executors only ever stream from byte arrays).
  ImageIO.setUseCache(false)

  // Synthetic-media relations are FIXTURE inputs (the test corpus
  // ships no blobs; production media comes from storage): without
  // memoization every mm_* query re-renders and re-ENCODES the whole
  // blob column before the decode operator under test even runs —
  // at 10x that charged ~3 full GIF-encode passes to the three video
  // queries alone. Materialize each (session, corpus, kind) relation
  // once — the same session-scoped memo convention as Bpe's merge
  // table — via an eager localCheckpoint (MEMORY_AND_DISK blocks), so
  // a repeat query reads blocks instead of re-encoding.
  private val synthCache =
    scala.collection.concurrent.TrieMap.empty[(String, Int, String), DataFrame]

  private[graft] def cachedMedia(kind: String, docs: DataFrame)(
      build: => DataFrame): DataFrame = {
    // keyed by applicationId (stable for the context's lifetime, never
    // reused within a JVM — unlike an identity hash, which GC can
    // recycle onto a NEW session and serve it a DataFrame whose
    // checkpoint blocks died with the old context) + the analyzed
    // plan's semantic hash (the corpus) + kind; entries of stopped
    // contexts are purged on access so cycling sessions can't pin dead
    // checkpoint blocks for the JVM's lifetime.
    // IMMUTABILITY ASSUMPTION: the semantic hash keys the PLAN, not the
    // files behind it — if the parquet under an identical docs path is
    // rewritten mid-application (fixture regeneration in-session), the
    // memo would serve blobs checkpointed from the OLD files. Fine for
    // the immutable sf* fixtures this serves; a corpus that can be
    // rewritten in-session would need a file-listing fingerprint
    // (paths+sizes+mtimes) folded into the key.
    synthCache.filterInPlace((_, df) => !df.sparkSession.sparkContext.isStopped)
    synthCache.getOrElseUpdate(
      (docs.sparkSession.sparkContext.applicationId,
        docs.queryExecution.analyzed.semanticHash(), kind),
      build.localCheckpoint())
  }

  /** The id column spread across the session's cores for a heavy
    * per-id ENCODE stage. The synthetic builders' input is doc_id
    * alone (8 B/row), but it arrives with the corpus scan's split
    * count — a single-row-group parquet fixture means ONE task, so
    * the whole render+encode pass serializes on one core. Hash-
    * repartitioning just the ids is the guide §8 shape (shuffle the
    * narrow key, parallelize the heavy payload work) at a cost of
    * 8 bytes/row at ANY scale; deterministic key, so retries are
    * safe (guide §2.5). Never shrinks existing parallelism.
    */
  private[graft] def spreadIds(docs: DataFrame): DataFrame =
    // ids-only: the exchange moves 8 B/row, and the downstream media
    // encode is expensive at ANY corpus size — no size gate (measured
    // a win even at sf0.1, round 9)
    spreadRows(docs.select(col("doc_id")), minBytesPerCore = 0L)

  /** Full-row sibling of [[spreadIds]] (guide §8): hash-spread a
    * relation across the session's cores BEFORE a heavy per-row kernel
    * (media encode/decode, span windows, langid/quality scoring, BPE
    * encode) when — and only when — its scan has fewer splits than
    * cores. A single-row-group gate fixture serializes every kernel
    * pass onto one task otherwise; at 100 TB scans have thousands of
    * real splits, so the condition self-disables and no exchange is
    * added — scale-adaptive, never a fixture-tuned constant. Multiple
    * consumers of the same spread relation collapse to ONE exchange
    * (ReuseExchange), so the rows move at most once per query.
    *
    * `minBytesPerCore`: below ~32 KB of (estimated) input per core the
    * exchange + 32-way task fan-out costs MORE than the serialized
    * kernel pass it parallelizes (measured: the span family regressed
    * 0.6-1.6 s at sf0.1's 0.6 MB corpus while winning 3.6× at 10×'s
    * 5.8 MB) — so tiny inputs keep their original single-task plan.
    * Both plans produce identical rows; the gate only picks the
    * cheaper one, the same contract as collapsedPairs' density probe.
    */
  private[graft] def spreadRows(d: DataFrame, key: String = "doc_id",
      minBytesPerCore: Long = 32L << 10): DataFrame = {
    val p = d.sparkSession.sparkContext.defaultParallelism
    if (d.rdd.getNumPartitions >= p) d
    else if (minBytesPerCore > 0 &&
      d.queryExecution.optimizedPlan.stats.sizeInBytes < p.toLong * minBytesPerCore) d
    else d.repartition(p, col(key))
  }

  private[graft] def synthDims(docId: Long): (Int, Int) =
    ((16 + (docId % 17)).toInt, (16 + (docId % 13)).toInt)

  /** Row-major (y*w + x) grayscale raster of the synthetic coarse
    * block pattern (spec in the object doc).
    */
  private[graft] def synthPixels(docId: Long): Array[Int] = {
    val (w, h) = synthDims(docId)
    Array.tabulate(h * w) { i =>
      val y = i / w
      val x = i % w
      val cell = (y * 8 / h) * 8 + (x * 8 / w)
      (graft.functions.TextHashes.splitmix64(docId * 64L + cell) >>> 56).toInt
    }
  }

  /** Encode a grayscale raster via the JDK's own codec. `format` is an
    * ImageIO writer name ("png" lossless, "jpg" lossy).
    */
  private[graft] def encodeImage(w: Int, h: Int, px: Array[Int],
      format: String = "png"): Array[Byte] = {
    val img = new BufferedImage(w, h, BufferedImage.TYPE_BYTE_GRAY)
    val raster = img.getRaster
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        raster.setSample(x, y, 0, px(y * w + x))
        x += 1
      }
      y += 1
    }
    val baos = new ByteArrayOutputStream()
    require(ImageIO.write(img, format, baos), s"no ImageIO writer for $format")
    baos.toByteArray
  }

  /** Header-only decode: (width, height, codec format name) without
    * reading pixel data — at scale metadata extraction should not
    * decompress the raster.
    */
  private[graft] def decodeHeader(bytes: Array[Byte]): (Int, Int, String) = {
    val iis = ImageIO.createImageInputStream(new ByteArrayInputStream(bytes))
    try {
      val readers = ImageIO.getImageReaders(iis)
      require(readers.hasNext, "no ImageIO reader recognizes this blob")
      val r = readers.next()
      try {
        r.setInput(iis)
        (r.getWidth(0), r.getHeight(0), r.getFormatName.toLowerCase)
      } finally r.dispose()
    } finally iis.close()
  }

  /** Full decode to a row-major grayscale raster (any JDK-supported
    * format; color inputs read their first band — the test images are
    * single-band gray).
    */
  private[graft] def decodePixels(bytes: Array[Byte]): (Int, Int, Array[Int]) = {
    val img = ImageIO.read(new ByteArrayInputStream(bytes))
    require(img != null, "undecodable image blob")
    val (w, h) = (img.getWidth, img.getHeight)
    val raster = img.getRaster
    val px = new Array[Int](w * h)
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        px(y * w + x) = raster.getSample(x, y, 0)
        x += 1
      }
      y += 1
    }
    (w, h, px)
  }

  /** Attach a REAL synthetic PNG media column: one deterministic
    * gradient image per document (spec in the object doc), rendered
    * and PNG-encoded on the executors — the ingest shape where blobs
    * arrive beside the row.
    */
  def withSyntheticImages(docs: DataFrame): DataFrame = cachedMedia("image", docs) {
    val spark = docs.sparkSession
    import spark.implicits._
    // NOT spreadIds: a 16×16 gray PNG encodes in ~0.1 ms — fan-out
    // overhead beats the win (measured); the GIF build in
    // Video.withSyntheticVideos is the expensive one that uses it
    docs.select(col("doc_id")).as[Long]
      .mapPartitions { it =>
        it.map { id =>
          val (w, h) = synthDims(id)
          (id, encodeImage(w, h, synthPixels(id)))
        }
      }
      .toDF("doc_id", "media")
      .withColumn("media_type", lit("image/png"))
  }

  /** Attach a fake binary "media" column (UTF-8 bytes of the text) —
    * used only by the VIDEO frame-sampling stub, which has no JDK
    * codec to lean on.
    */
  def withFakeMedia(docs: DataFrame): DataFrame =
    docs.withColumn("media", col("text").cast("binary"))
      .withColumn("media_type", lit("video/fake"))

  /** Per-partition REAL header decode of binary media into typed
    * metadata. `mapPartitions` (not per-row UDF) so the codec lookup
    * machinery amortizes across a batch — the same shape a Pandas-UDF
    * batch decode has in PySpark.
    */
  def decodeMeta(spark: SparkSession, docs: DataFrame): Dataset[MediaMeta] = {
    import spark.implicits._
    docs.select(col("doc_id"), col("media"), col("media_type"))
      .as[(Long, Array[Byte], String)]
      .mapPartitions { it =>
        it.map { case (id, bytes, mtype) =>
          // null blobs (missing media at ingest) report 0×0, not NPE
          if (bytes == null || bytes.isEmpty) MediaMeta(id, mtype, 0, 0, 0L, "none")
          else {
            val (w, h, fmt) = decodeHeader(bytes)
            MediaMeta(id, mtype, w, h, w.toLong * h, fmt)
          }
        }
      }
  }

  /** Per-partition frame sampling: `k` evenly spaced "frames" per
    * blob. DECLARED STUB for video (no container codecs in the JDK): a
    * frame is the byte at offset ⌊i·n/k⌋ (a real implementation seeks
    * keyframes via the container index); the plumbing is the
    * production shape — one input row fans out to k frame rows inside
    * the executor, empty blobs yield no frames, and nothing is
    * materialized on the driver.
    */
  def sampleFrames(spark: SparkSession, docs: DataFrame, k: Int = 4): Dataset[FrameSample] = {
    import spark.implicits._
    docs.select(col("doc_id"), col("media")).as[(Long, Array[Byte])]
      .mapPartitions { it =>
        it.flatMap { case (id, rawBytes) =>
          val bytes = if (rawBytes == null) Array.empty[Byte] else rawBytes
          if (bytes.isEmpty) Iterator.empty
          else (0 until k).iterator.map { i =>
            val off = i.toLong * bytes.length / k
            FrameSample(id, i, off, bytes(off.toInt) & 0xff)
          }
        }
      }
  }

  /** 8×8 area-average downsample of a REAL decoded raster: cell
    * (by, bx) averages the pixel block x ∈ [bx·w/8, (bx+1)·w/8),
    * y ∈ [by·h/8, (by+1)·h/8) with integer floor bounds and integer
    * mean — the classic aHash preprocessing, exact by construction so
    * the Python oracle mirrors it without float concerns. Output index
    * = by*8 + bx.
    */
  private[graft] def gray64(w: Int, h: Int, px: Array[Int]): Array[Int] = {
    val out = new Array[Int](64)
    var by = 0
    while (by < 8) {
      val y0 = by * h / 8
      val y1 = (by + 1) * h / 8
      var bx = 0
      while (bx < 8) {
        val x0 = bx * w / 8
        val x1 = (bx + 1) * w / 8
        if (x1 > x0 && y1 > y0) {
          var s = 0L
          var y = y0
          while (y < y1) {
            var x = x0
            while (x < x1) { s += px(y * w + x); x += 1 }
            y += 1
          }
          out(by * 8 + bx) = (s / ((x1 - x0).toLong * (y1 - y0))).toInt
        }
        bx += 1
      }
      by += 1
    }
    out
  }

  /** Average perceptual hash (aHash): bit i set iff 64·pixel(i) >
    * Σ pixels — the classic downsample-and-threshold image fingerprint
    * (the cross-multiplied compare keeps it integer-exact).
    */
  def aHash64(px: Array[Int]): Long = {
    var total = 0L
    var i = 0
    while (i < 64) { total += px(i); i += 1 }
    var sig = 0L
    i = 0
    while (i < 64) {
      if (px(i) * 64L > total) sig |= (1L << i)
      i += 1
    }
    sig
  }

  /** Deterministic lossy-STYLE re-encode: decode the real pixels,
    * perturb them in PIXEL space (+2 on the (x+y) % 5 == 0 lattice,
    * clamped — the magnitude/shape of mild quantization noise), and
    * re-encode as PNG. Bytes change everywhere (defeating exact
    * hashing); the raster moves by ≤ 2 per pixel (surviving the
    * perceptual hash). Deterministic end to end so the Python oracle
    * replays it exactly; the ACTUAL-JPEG robustness of the same hash
    * is spec-asserted in MultimodalSpec (a JPEG round-trip's pixel
    * error isn't reproducible without the codec).
    */
  private[graft] def perturbPixels(w: Int, h: Int, px: Array[Int]): Array[Int] = {
    val out = px.clone()
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        if ((x + y) % 5 == 0) {
          val i = y * w + x
          out(i) = math.min(255, out(i) + 2)
        }
        x += 1
      }
      y += 1
    }
    out
  }

  /** Re-encoded copies of the first `n` docs (ids shifted by
    * `idOffset`) — the ingest-time "same media, different bytes" case
    * the perceptual dedup exists for. Real decode → pixel perturbation
    * → real PNG encode, all on the executors.
    */
  def reencodedCopies(spark: SparkSession, docs: DataFrame,
      n: Long, idOffset: Long): DataFrame = {
    import spark.implicits._
    // missing media can't be re-encoded — skip it (the same tolerance
    // decodeMeta shows missing blobs, applied to this path's decode)
    docs.filter(col("doc_id") < n)
      .select(col("doc_id"), col("media")).as[(Long, Array[Byte])]
      .mapPartitions(_.collect { case (id, bytes) if bytes != null && bytes.nonEmpty =>
        val (w, h, px) = decodePixels(bytes)
        (id + idOffset, encodeImage(w, h, perturbPixels(w, h, px)))
      })
      .toDF("doc_id", "media")
  }

  /** Perceptual-hash near-dup pairs over the media column: per-
    * partition REAL decode + downsample + hash (mapPartitions — codec
    * setup amortizes per batch), then EXACTLY the simhash
    * combination-banding machinery ([[Dedup.hammingBandPairs]]):
    * pigeonhole-exact recall at the requested hamming, clone groups
    * (re-encodes collapsing to one aHash) pair off on the full value
    * instead of meeting in every band table. 100 TB shape: the only
    * relation past the scan is (doc_id, 8-byte sig).
    */
  def phashDedup(spark: SparkSession, docs: DataFrame, maxHamming: Int = 3): DataFrame = {
    import spark.implicits._
    // a missing blob has no perceptual content to compare — it gets NO
    // signature and never pairs (decodeMeta's missing-media tolerance,
    // applied to dedup; a degenerate all-zero sig would instead cluster
    // every null-media doc into one giant false family)
    val sigs = docs.select(col("doc_id"), col("media")).as[(Long, Array[Byte])]
      .mapPartitions { it =>
        it.collect { case (id, bytes) if bytes != null && bytes.nonEmpty =>
          val (w, h, px) = decodePixels(bytes)
          (id, aHash64(gray64(w, h, px)))
        }
      }
      .toDF("doc_id", "_sig")
    Dedup.hammingBandPairs(sigs, maxHamming)
  }

  /** Fit-in-box resize plan (never upscales): output dims for a
    * `box`×`box` bound with aspect preserved, computed from the REAL
    * decoded header dims (a real deployment hands the plan to the
    * codec in the same mapPartitions batch); missing blobs pass
    * through as 0×0.
    */
  def resizeMeta(spark: SparkSession, docs: DataFrame, box: Int = 224): Dataset[ResizeMeta] = {
    import spark.implicits._
    docs.select(col("doc_id"), col("media")).as[(Long, Array[Byte])]
      .mapPartitions { it =>
        it.map { case (id, bytes) =>
          if (bytes == null || bytes.isEmpty) ResizeMeta(id, 0, 0, 0, 0)
          else {
            val (w, h, _) = decodeHeader(bytes)
            if (w <= 0 || h <= 0) ResizeMeta(id, w, h, 0, 0)
            else {
              val scale = math.min(box.toDouble / w, box.toDouble / h)
              if (scale >= 1.0) ResizeMeta(id, w, h, w, h)
              else ResizeMeta(id, w, h, (w * scale).toInt, (h * scale).toInt)
            }
          }
        }
      }
  }
}
