package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Decoded metadata for one media blob. */
case class MediaMeta(
    doc_id: Long,
    media_type: String,
    width: Int,
    height: Int,
    n_bytes: Long,
    first_byte: Int)

/** One sampled "frame" of a media blob. */
case class FrameSample(doc_id: Long, frame_idx: Int, byte_offset: Long, frame_byte: Int)

/** Resize-plan metadata for one media blob. */
case class ResizeMeta(doc_id: Long, width: Int, height: Int, out_w: Int, out_h: Int)

/** Multimodal-column plumbing (SURVEY.md §2D).
  *
  * Media rides as opaque `binary` columns with typed metadata beside
  * it. The decode step itself is STUBBED — image/audio codecs aren't
  * in this container — with a deterministic fake that derives
  * "dimensions" from the bytes; everything around it (binary column
  * handling, per-partition batch iteration, typed Dataset output,
  * no driver involvement) is the real production shape: swap
  * `fakeDecode` for an actual codec call and nothing else changes.
  */
object Multimodal {

  /** STUB: deterministic fake decoder standing in for e.g. a JPEG
    * header parse. Real implementation would read the codec header
    * from `bytes`; this derives the same fields arithmetically so
    * correctness of the *plumbing* is oracle-checkable.
    */
  def fakeDecode(bytes: Array[Byte]): (Int, Int) = {
    val w = (bytes.length % 640).toInt
    val h = if (bytes.isEmpty) 0 else (bytes(0) & 0xff) % 480
    (w, h)
  }

  /** Attach a fake binary "media" column (UTF-8 bytes of the text) —
    * the test corpus has no real blobs; at ingest this column would
    * come from the source (e.g. image bytes in parquet/webdataset).
    */
  def withFakeMedia(docs: DataFrame): DataFrame =
    docs.withColumn("media", col("text").cast("binary"))
      .withColumn("media_type", lit("image/fake"))

  /** Per-partition decode of binary media into typed metadata.
    * `mapPartitions` (not per-row UDF) so a real decoder could
    * amortize codec/context setup across a batch — the same shape a
    * Pandas-UDF batch decode has in PySpark.
    */
  def decodeMeta(spark: SparkSession, docs: DataFrame): Dataset[MediaMeta] = {
    import spark.implicits._
    docs.select(col("doc_id"), col("media"), col("media_type"))
      .as[(Long, Array[Byte], String)]
      .mapPartitions { it =>
        // per-partition: a real codec would init once here
        it.map { case (id, rawBytes, mtype) =>
          // null blobs (missing media at ingest) decode as empty, not NPE
          val bytes = if (rawBytes == null) Array.empty[Byte] else rawBytes
          val (w, h) = fakeDecode(bytes)
          MediaMeta(id, mtype, w, h, bytes.length.toLong, if (bytes.isEmpty) 0 else bytes(0) & 0xff)
        }
      }
  }

  /** Per-partition frame sampling: `k` evenly spaced "frames" per
    * blob. STUB: a frame is the byte at offset ⌊i·n/k⌋ (a real
    * implementation seeks keyframes via the container index); the
    * plumbing is the production shape — one input row fans out to k
    * frame rows inside the executor, empty blobs yield no frames, and
    * nothing is materialized on the driver.
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

  /** STUB "grayscale 8×8 downsample": 64 pixel values 0..255, pixel i
    * = integer mean of the i-th of 64 even byte chunks (a real
    * implementation decodes and area-averages actual pixels; identical
    * blobs give identical grids, near-identical blobs near-identical
    * ones, which is all the hash needs). Integer-only, so the Python
    * fixture mirror is exact by construction.
    */
  def fakeGray64(bytes: Array[Byte]): Array[Int] = {
    val px = new Array[Int](64)
    val n = bytes.length
    var i = 0
    while (i < 64) {
      val lo = (i.toLong * n / 64).toInt
      val hi = ((i + 1).toLong * n / 64).toInt
      if (hi > lo) {
        var s = 0L
        var j = lo
        while (j < hi) { s += (bytes(j) & 0xff); j += 1 }
        px(i) = (s / (hi - lo)).toInt
      }
      i += 1
    }
    px
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

  /** STUB re-encode: the same "image" after a lossy codec round-trip —
    * low-bit flips at three spread byte positions, length preserved
    * (real lossy re-encodes perturb pixel values without moving
    * structure, which is exactly what survives a perceptual hash and
    * kills an exact hash).
    */
  def fakeReencode(bytes: Array[Byte]): Array[Byte] = {
    val out = bytes.clone()
    if (out.length > 0) {
      var k = 1
      while (k <= 3) {
        val p = k * out.length / 4
        val q = if (p >= out.length) out.length - 1 else p
        out(q) = (out(q) ^ 1).toByte
        k += 1
      }
    }
    out
  }

  /** Re-encoded copies of the first `n` docs (ids shifted by
    * `idOffset`) — the ingest-time "same media, different bytes" case
    * the perceptual dedup exists for.
    */
  def reencodedCopies(spark: SparkSession, docs: DataFrame,
      n: Long, idOffset: Long): DataFrame = {
    import spark.implicits._
    docs.filter(col("doc_id") < n)
      .select(col("doc_id"), col("media")).as[(Long, Array[Byte])]
      .mapPartitions(_.map { case (id, rawBytes) =>
        val bytes = if (rawBytes == null) Array.empty[Byte] else rawBytes
        (id + idOffset, fakeReencode(bytes))
      })
      .toDF("doc_id", "media")
  }

  /** Perceptual-hash near-dup pairs over the media column: per-
    * partition downsample+hash (mapPartitions — a real decoder
    * amortizes codec setup per batch), then EXACTLY the simhash
    * combination-banding machinery ([[Dedup.hammingBandPairs]]):
    * pigeonhole-exact recall at the requested hamming, clone groups
    * (re-encodes collapsing to one aHash) pair off on the full value
    * instead of meeting in every band table. 100 TB shape: the only
    * relation past the scan is (doc_id, 8-byte sig).
    */
  def phashDedup(spark: SparkSession, docs: DataFrame, maxHamming: Int = 3): DataFrame = {
    import spark.implicits._
    val sigs = docs.select(col("doc_id"), col("media")).as[(Long, Array[Byte])]
      .mapPartitions { it =>
        it.map { case (id, rawBytes) =>
          val bytes = if (rawBytes == null) Array.empty[Byte] else rawBytes
          (id, aHash64(fakeGray64(bytes)))
        }
      }
      .toDF("doc_id", "_sig")
    Dedup.hammingBandPairs(sigs, maxHamming)
  }

  /** Fit-in-box resize plan (never upscales): output dims for a
    * `box`×`box` bound with aspect preserved. STUB: dims come from
    * [[fakeDecode]] and only the plan is computed (a real
    * implementation hands the plan to the codec in the same
    * mapPartitions batch); degenerate dims pass through as 0×0.
    */
  def resizeMeta(spark: SparkSession, docs: DataFrame, box: Int = 224): Dataset[ResizeMeta] = {
    import spark.implicits._
    docs.select(col("doc_id"), col("media")).as[(Long, Array[Byte])]
      .mapPartitions { it =>
        it.map { case (id, rawBytes) =>
          val bytes = if (rawBytes == null) Array.empty[Byte] else rawBytes
          val (w, h) = fakeDecode(bytes)
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
