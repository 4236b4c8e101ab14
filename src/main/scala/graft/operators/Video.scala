package graft.operators

import java.awt.image.{BufferedImage, IndexColorModel}
import java.io.{ByteArrayInputStream, ByteArrayOutputStream}

import javax.imageio.{IIOImage, ImageIO, ImageTypeSpecifier, ImageWriter}
import javax.imageio.metadata.{IIOMetadata, IIOMetadataNode}
import javax.imageio.stream.ImageInputStream

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Decoded metadata for one video blob — frame count, dims, per-frame
  * delay and total duration all read from the REAL container
  * (javax.imageio's GIF reader: image count via a full stream scan,
  * delay from each frame's GraphicControlExtension), not the
  * generation spec.
  */
case class VideoMeta(
    doc_id: Long,
    n_frames: Int,
    width: Int,
    height: Int,
    delay_cs: Int,
    duration_ms: Long,
    format: String)

/** One sampled, DECODED frame of a video blob: `src_frame` is the
  * container frame index, `mean_luma` the integer mean of its decoded
  * grayscale raster.
  */
case class VideoFrame(doc_id: Long, frame_idx: Int, src_frame: Int, mean_luma: Int)

/** Video-column plumbing (SURVEY.md §2D) — the multi-frame sibling of
  * [[Multimodal]] (images) and [[Audio]] (WAV). VIDEO IS REAL as of
  * round 7 for the one multi-frame container the JDK itself can
  * decode: animated GIF. The decode steps parse actual container
  * structure — frame count needs a real stream scan, per-frame delay
  * lives in each frame's GraphicControlExtension, and frame pixels
  * come back through the LZW decoder. (General video — H.264/VP9 in
  * MP4/WebM — stays out of scope: no such codec ships in the JDK, and
  * the container-byte stub [[Multimodal.sampleFrames]] remains the
  * declared no-codec path for those.)
  *
  * The test corpus carries no blobs, so [[withSyntheticVideos]]
  * renders a deterministic animated GIF per document with the JDK's
  * own sequence writer. GIF's LZW is lossless and the 256-gray
  * palette is explicit, so decode returns exactly the generated
  * rasters (round-trip pixel-exactness is spec-asserted); every spec
  * quantity is integer arithmetic, so the independent Python/DuckDB
  * oracles derive expected values without a codec:
  *   n_frames = 2 + doc_id % 4                 (2..5 frames)
  *   w = 16 + doc_id % 17, h = 16 + doc_id % 13  (same grid as images)
  *   delay_cs = 4 + doc_id % 7                 (per-frame, centisec)
  *   cell(x, y) = (y*8/h)*8 + (x*8/w)
  *   px(f, x, y) = splitmix64((doc_id*131 + f)*64 + cell) >>> 56
  * — each frame is an independent pseudorandom coarse block pattern
  * (the image family's proven doc-distinctive shape, re-keyed per
  * frame), so per-frame features differ within a clip and across docs.
  */
object Video {

  /** Explicit 256-level grayscale palette: palette index == gray
    * value, so the writer never quantizes and the LZW round trip is
    * bit-exact on the raster.
    */
  private val GrayPalette: IndexColorModel = {
    val g = Array.tabulate[Byte](256)(_.toByte)
    new IndexColorModel(8, 256, g, g, g)
  }

  private[graft] def nFrames(docId: Long): Int = (2 + (docId % 4)).toInt

  private[graft] def delayCs(docId: Long): Int = (4 + (docId % 7)).toInt

  /** Row-major grayscale raster of frame `f` (spec in the object doc). */
  private[graft] def synthFrame(docId: Long, f: Int): Array[Int] = {
    val (w, h) = Multimodal.synthDims(docId)
    Array.tabulate(h * w) { i =>
      val y = i / w
      val x = i % w
      val cell = (y * 8 / h) * 8 + (x * 8 / w)
      (graft.functions.TextHashes.splitmix64((docId * 131L + f) * 64L + cell) >>> 56).toInt
    }
  }

  private def toIndexed(w: Int, h: Int, px: Array[Int]): BufferedImage = {
    val img = new BufferedImage(w, h, BufferedImage.TYPE_BYTE_INDEXED, GrayPalette)
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
    img
  }

  /** Encode frames as an animated GIF through the JDK's own sequence
    * writer, stamping each frame's GraphicControlExtension with
    * `delayCs` — a REAL multi-frame container with REAL timing
    * metadata, not a concatenation of stills.
    */
  private[graft] def encodeGif(w: Int, h: Int, frames: Seq[Array[Int]],
      delayCs: Int): Array[Byte] = {
    val writer: ImageWriter = ImageIO.getImageWritersByFormatName("gif").next()
    val param = writer.getDefaultWriteParam
    val first = toIndexed(w, h, frames.head)
    val meta: IIOMetadata =
      writer.getDefaultImageMetadata(ImageTypeSpecifier.createFromRenderedImage(first), param)
    val fmt = meta.getNativeMetadataFormatName
    val root = meta.getAsTree(fmt).asInstanceOf[IIOMetadataNode]
    // The default tree ships a web-cube LocalColorTable that would
    // OVERRIDE each frame's own 256-gray palette and QUANTIZE the
    // raster (measured: every pixel moved) — strip it so the writer
    // derives the table from the actual image and the LZW round trip
    // stays bit-exact. (ImageDescriptor must STAY: without it the
    // writer drops the GraphicControlExtension too.) The NodeList is
    // a snapshot — collect, then remove.
    val lcts = root.getElementsByTagName("LocalColorTable")
    (0 until lcts.getLength).map(lcts.item).foreach(root.removeChild)
    val gce = new IIOMetadataNode("GraphicControlExtension")
    gce.setAttribute("disposalMethod", "none")
    gce.setAttribute("userInputFlag", "FALSE")
    gce.setAttribute("transparentColorFlag", "FALSE")
    gce.setAttribute("delayTime", delayCs.toString)
    gce.setAttribute("transparentColorIndex", "0")
    root.appendChild(gce)
    meta.setFromTree(fmt, root)
    val baos = new ByteArrayOutputStream()
    val ios = ImageIO.createImageOutputStream(baos)
    try {
      writer.setOutput(ios)
      writer.prepareWriteSequence(null)
      frames.foreach { px =>
        writer.writeToSequence(new IIOImage(toIndexed(w, h, px), null, meta), param)
      }
      writer.endWriteSequence()
    } finally {
      ios.close()
      writer.dispose()
    }
    baos.toByteArray
  }

  private def openReader(bytes: Array[Byte]): (javax.imageio.ImageReader, ImageInputStream) = {
    val iis = ImageIO.createImageInputStream(new ByteArrayInputStream(bytes))
    val readers = ImageIO.getImageReaders(iis)
    require(readers.hasNext, "no ImageIO reader recognizes this blob")
    val r = readers.next()
    r.setInput(iis)
    (r, iis)
  }

  /** Decoded grayscale raster of container frame `i` — read through
    * the palette (getRGB & 0xff), so the value is the decoded gray
    * regardless of how the writer laid out the color table.
    */
  private[graft] def decodeFrame(r: javax.imageio.ImageReader, i: Int): (Int, Int, Array[Int]) = {
    val img = r.read(i)
    val (w, h) = (img.getWidth, img.getHeight)
    val px = new Array[Int](w * h)
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        px(y * w + x) = img.getRGB(x, y) & 0xff
        x += 1
      }
      y += 1
    }
    (w, h, px)
  }

  /** The delayTime (centiseconds) of frame `i`'s
    * GraphicControlExtension, 0 if absent.
    */
  private[graft] def frameDelayCs(r: javax.imageio.ImageReader, i: Int): Int = {
    val m = r.getImageMetadata(i)
    val root = m.getAsTree(m.getNativeMetadataFormatName).asInstanceOf[IIOMetadataNode]
    val gces = root.getElementsByTagName("GraphicControlExtension")
    if (gces.getLength == 0) 0
    else gces.item(0).asInstanceOf[org.w3c.dom.Element].getAttribute("delayTime").toInt
  }

  /** Attach a REAL synthetic animated-GIF media column: one
    * deterministic multi-frame clip per document, rendered and
    * GIF-encoded on the executors.
    */
  def withSyntheticVideos(docs: DataFrame): DataFrame =
    Multimodal.cachedMedia("video", docs) {
      val spark = docs.sparkSession
      import spark.implicits._
      Multimodal.spreadIds(docs).as[Long]
        .mapPartitions(_.map { id =>
          val (w, h) = Multimodal.synthDims(id)
          val frames = (0 until nFrames(id)).map(f => synthFrame(id, f))
          (id, encodeGif(w, h, frames, delayCs(id)))
        })
        .toDF("doc_id", "media")
        .withColumn("media_type", lit("video/gif"))
    }

  /** Per-partition REAL container decode into typed metadata: frame
    * count via `getNumImages(true)` (a genuine stream scan — GIF has
    * no frame-count header field), dims and per-frame delay from the
    * first frame, duration = Σ delays. mapPartitions so reader
    * machinery amortizes across a batch.
    */
  def decodeMeta(spark: SparkSession, docs: DataFrame): Dataset[VideoMeta] = {
    import spark.implicits._
    docs.select(col("doc_id"), col("media")).as[(Long, Array[Byte])]
      .mapPartitions(_.map { case (id, bytes) =>
        if (bytes == null || bytes.isEmpty) VideoMeta(id, 0, 0, 0, 0, 0L, "none")
        else {
          val (r, iis) = openReader(bytes)
          try {
            val n = r.getNumImages(true)
            val delay = frameDelayCs(r, 0)
            var durationCs = 0L
            var i = 0
            while (i < n) { durationCs += frameDelayCs(r, i); i += 1 }
            VideoMeta(id, n, r.getWidth(0), r.getHeight(0), delay,
              durationCs * 10L, r.getFormatName.toLowerCase)
          } finally { r.dispose(); iis.close() }
        }
      })
  }

  /** REAL frame sampling: `k` evenly spaced frames per clip, each
    * DECODED through the LZW codec (src_frame = ⌊i·F/k⌋) and reduced
    * to its integer mean luma — the per-frame feature a downstream
    * filter keys on. One input row fans out to k frame rows inside
    * the executor; empty blobs yield no frames.
    */
  def sampleFrames(spark: SparkSession, docs: DataFrame, k: Int = 2): Dataset[VideoFrame] = {
    import spark.implicits._
    docs.select(col("doc_id"), col("media")).as[(Long, Array[Byte])]
      .mapPartitions(_.flatMap { case (id, bytes) =>
        if (bytes == null || bytes.isEmpty) Iterator.empty
        else {
          val (r, iis) = openReader(bytes)
          try {
            val n = r.getNumImages(true)
            (0 until k).map { i =>
              val src = (i.toLong * n / k).toInt
              val (w, h, px) = decodeFrame(r, src)
              var s = 0L
              var j = 0
              while (j < px.length) { s += px(j); j += 1 }
              VideoFrame(id, i, src, (s / (w.toLong * h)).toInt)
            }
          } finally { r.dispose(); iis.close() }
        }
      })
  }

  /** Per-clip temporal-average perceptual profile: [[Multimodal.gray64]]
    * of every decoded frame, averaged per cell across frames (integer
    * floor) — the clip's 8×8 "long-exposure" thumbnail. A uniform
    * per-frame pixel perturbation moves each cell mean by at most the
    * perturbation, so the aHash survives re-encodes the way the image
    * path's does.
    */
  private[graft] def temporalGray64(bytes: Array[Byte]): Array[Int] = {
    val (r, iis) = openReader(bytes)
    try {
      val n = r.getNumImages(true)
      val acc = new Array[Long](64)
      var f = 0
      while (f < n) {
        val (w, h, px) = decodeFrame(r, f)
        val g = Multimodal.gray64(w, h, px)
        var c = 0
        while (c < 64) { acc(c) += g(c); c += 1 }
        f += 1
      }
      Array.tabulate(64)(c => (acc(c) / n).toInt)
    } finally { r.dispose(); iis.close() }
  }

  /** Pixel-perturbed re-encodes of the first `n` clips (ids shifted
    * by `idOffset`): real decode of EVERY frame → the image family's
    * deterministic +2 lattice perturbation → real GIF re-encode. The
    * bytes change everywhere; the temporal profile moves ≤ 2 per cell.
    */
  def reencodedCopies(spark: SparkSession, docs: DataFrame,
      n: Long, idOffset: Long): DataFrame = {
    import spark.implicits._
    // missing media can't be re-encoded — skip (decodeMeta's tolerance)
    docs.filter(col("doc_id") < n)
      .select(col("doc_id"), col("media")).as[(Long, Array[Byte])]
      .mapPartitions(_.collect { case (id, bytes) if bytes != null && bytes.nonEmpty =>
        val (r, iis) = openReader(bytes)
        val (w, h, frames) = try {
          val nf = r.getNumImages(true)
          val fs = (0 until nf).map { f =>
            val (w, h, px) = decodeFrame(r, f)
            (w, h, Multimodal.perturbPixels(w, h, px))
          }
          (fs.head._1, fs.head._2, fs.map(_._3))
        } finally { r.dispose(); iis.close() }
        (id + idOffset, encodeGif(w, h, frames, delayCs(id)))
      })
      .toDF("doc_id", "media")
  }

  /** Perceptual near-dup pairs over the video column: per-partition
    * REAL multi-frame decode + temporal profile + average-hash (the
    * SAME [[Multimodal.aHash64]] rule as images/audio), then the
    * simhash combination-banding machinery. 100 TB shape identical to
    * the other media dedups: the only relation past the scan is
    * (doc_id, 8-byte sig).
    */
  def videoDedup(spark: SparkSession, docs: DataFrame, maxHamming: Int = 3): DataFrame = {
    import spark.implicits._
    // missing media gets NO signature and never pairs (see
    // Multimodal.phashDedup for why not a degenerate all-zero sig)
    val sigs = docs.select(col("doc_id"), col("media")).as[(Long, Array[Byte])]
      .mapPartitions(_.collect { case (id, bytes) if bytes != null && bytes.nonEmpty =>
        (id, Multimodal.aHash64(temporalGray64(bytes)))
      })
      .toDF("doc_id", "_sig")
    Dedup.hammingBandPairs(sigs, maxHamming)
  }
}
