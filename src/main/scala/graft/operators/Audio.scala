package graft.operators

import java.io.{ByteArrayInputStream, ByteArrayOutputStream}

import javax.sound.sampled.{AudioFileFormat, AudioFormat, AudioInputStream, AudioSystem}

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Decoded metadata for one audio blob — every field read from the
  * REAL container header (javax.sound.sampled), not the generation
  * spec.
  */
case class AudioMeta(
    doc_id: Long,
    encoding: String,
    sample_rate: Int,
    channels: Int,
    bits: Int,
    n_frames: Long,
    duration_ms: Long)

/** One sampled PCM frame of an audio blob. */
case class AudioFrame(doc_id: Long, frame_idx: Int, frame_offset: Long, amplitude: Int)

/** Audio-column plumbing (SURVEY.md §2D) — the audio sibling of
  * [[Multimodal]]'s image family. AUDIO IS REAL as of round 7: the
  * JDK ships a WAV (RIFF) reader/writer in javax.sound.sampled, so
  * the decode steps parse actual container headers and PCM frames —
  * the same "JDK codec, no external libs" move that made images real.
  * Only VIDEO remains a declared stub (no container codec in the JDK).
  *
  * The test corpus carries no blobs, so [[withSyntheticAudio]] renders
  * a deterministic 8-bit unsigned mono PCM clip per document and
  * WAV-encodes it with the JDK's own writer. The sample spec is pure
  * integer arithmetic so the DuckDB/Python oracles derive every
  * expected value without a codec (WAV PCM is lossless — decode
  * returns exactly the generated samples):
  *   n_frames = 64 + doc_id % 97          (64..160 frames)
  *   rate = 8000 Hz, mono, 8-bit unsigned
  *   sample(i) = (doc_id·131 + i·31) % 256
  * — a per-doc sawtooth lattice: stride-31 mod 256 visits all residues
  * (gcd(31,256)=1), so each doc's amplitude envelope is distinctive
  * while remaining closed-form for the oracle.
  */
object Audio {

  val SampleRate = 8000

  private[graft] def nFrames(docId: Long): Int = (64 + (docId % 97)).toInt

  /** Raw unsigned-PCM samples of the synthetic clip (spec above). */
  private[graft] def synthSamples(docId: Long): Array[Byte] = {
    val n = nFrames(docId)
    Array.tabulate(n)(i => ((docId * 131L + i * 31L) % 256L).toByte)
  }

  /** Encode unsigned 8-bit mono PCM as WAV via the JDK's own writer
    * (8-bit WAV is unsigned by spec, so PCM_UNSIGNED is the one
    * encoding every RIFF reader agrees on).
    */
  private[graft] def encodeWav(samples: Array[Byte]): Array[Byte] = {
    val fmt = new AudioFormat(AudioFormat.Encoding.PCM_UNSIGNED,
      SampleRate.toFloat, 8, 1, 1, SampleRate.toFloat, false)
    val ais = new AudioInputStream(
      new ByteArrayInputStream(samples), fmt, samples.length.toLong)
    val baos = new ByteArrayOutputStream()
    AudioSystem.write(ais, AudioFileFormat.Type.WAVE, baos)
    baos.toByteArray
  }

  /** Header-only decode: container metadata without reading frames —
    * at scale metadata extraction should not stream the PCM payload.
    */
  private[graft] def decodeHeader(bytes: Array[Byte]): AudioFileFormat =
    AudioSystem.getAudioFileFormat(new ByteArrayInputStream(bytes))

  /** Full decode to raw PCM frame bytes through the real reader (for
    * 8-bit unsigned mono the decoded stream is one byte per frame).
    */
  private[graft] def decodeSamples(bytes: Array[Byte]): Array[Byte] = {
    val ais = AudioSystem.getAudioInputStream(new ByteArrayInputStream(bytes))
    try ais.readAllBytes() finally ais.close()
  }

  /** Attach a REAL synthetic WAV media column: one deterministic clip
    * per document, PCM-rendered and WAV-encoded on the executors.
    */
  def withSyntheticAudio(docs: DataFrame): DataFrame =
    Multimodal.cachedMedia("audio", docs) {
      val spark = docs.sparkSession
      import spark.implicits._
      // NOT spreadIds: the WAV build is header+copy (~μs/doc) — the
      // id shuffle + fan-out costs more than the encode it would
      // parallelize (measured +1.5 s at sf0.1); video's LZW encode is
      // the one that warrants it
      docs.select(col("doc_id")).as[Long]
        .mapPartitions(_.map(id => (id, encodeWav(synthSamples(id)))))
        .toDF("doc_id", "media")
        .withColumn("media_type", lit("audio/wav"))
    }

  /** Per-partition REAL header decode of audio blobs into typed
    * metadata (mapPartitions, not a per-row UDF, so reader lookup
    * amortizes across a batch). duration_ms floors — the integer form
    * the SQL oracle states exactly.
    */
  def decodeMeta(spark: SparkSession, docs: DataFrame): Dataset[AudioMeta] = {
    import spark.implicits._
    docs.select(col("doc_id"), col("media")).as[(Long, Array[Byte])]
      .mapPartitions(_.map { case (id, bytes) =>
        if (bytes == null || bytes.isEmpty) AudioMeta(id, "none", 0, 0, 0, 0L, 0L)
        else {
          val aff = decodeHeader(bytes)
          val f = aff.getFormat
          val frames = aff.getFrameLength.toLong
          AudioMeta(id, f.getEncoding.toString, f.getSampleRate.toInt,
            f.getChannels, f.getSampleSizeInBits, frames,
            frames * 1000L / f.getSampleRate.toLong)
        }
      })
  }

  /** REAL frame sampling: `k` evenly spaced PCM frames per clip, read
    * through the JDK decoder (unlike the video stub, these are true
    * decoded amplitudes, not container bytes). Frame i sits at offset
    * ⌊i·n/k⌋; empty blobs yield no frames.
    */
  def sampleFrames(spark: SparkSession, docs: DataFrame, k: Int = 4): Dataset[AudioFrame] = {
    import spark.implicits._
    docs.select(col("doc_id"), col("media")).as[(Long, Array[Byte])]
      .mapPartitions(_.flatMap { case (id, bytes) =>
        if (bytes == null || bytes.isEmpty) Iterator.empty
        else {
          val pcm = decodeSamples(bytes)
          (0 until k).iterator.map { i =>
            val off = i.toLong * pcm.length / k
            AudioFrame(id, i, off, pcm(off.toInt) & 0xff)
          }
        }
      })
  }

  /** 64-window amplitude-envelope profile of a PCM clip — the 1-D
    * analog of the image path's 8×8 [[Multimodal.gray64]]: window w
    * integer-floor-averages |sample − 128| over frames
    * [w·n/64, (w+1)·n/64). n ≥ 64 by the synth spec so every window
    * is non-empty; all arithmetic is integer, so the Python fixture
    * mirrors it exactly.
    */
  private[graft] def envelope64(pcm: Array[Byte]): Array[Int] = {
    val n = pcm.length
    val out = new Array[Int](64)
    var w = 0
    while (w < 64) {
      val i0 = w * n / 64
      val i1 = (w + 1) * n / 64
      if (i1 > i0) {
        var s = 0L
        var i = i0
        while (i < i1) { s += math.abs((pcm(i) & 0xff) - 128); i += 1 }
        out(w) = (s / (i1 - i0)).toInt
      }
      w += 1
    }
    out
  }

  /** Deterministic gain-change "re-encode": decode the real PCM,
    * scale every amplitude around the 128 midline by 5/4 (integer
    * floor on the magnitude, clamped to the 8-bit range), and
    * WAV-encode again. Bytes change at almost every frame (defeating
    * exact hashing); the envelope PROFILE scales near-uniformly, so
    * the perceptual hash below survives — the audio analog of a
    * volume-normalized re-upload.
    */
  private[graft] def scaleGain(pcm: Array[Byte]): Array[Byte] =
    pcm.map { b =>
      val a = (b & 0xff) - 128
      val scaled =
        if (a >= 0) math.min(127, a * 5 / 4)
        else -math.min(128, (-a) * 5 / 4)
      (128 + scaled).toByte
    }

  /** Gain-scaled re-encodes of the first `n` clips (ids shifted by
    * `idOffset`) — real decode → integer gain scale → real WAV
    * encode, all on the executors.
    */
  def reencodedCopies(spark: SparkSession, docs: DataFrame,
      n: Long, idOffset: Long): DataFrame = {
    import spark.implicits._
    // missing media can't be re-encoded — skip (decodeMeta's tolerance)
    docs.filter(col("doc_id") < n)
      .select(col("doc_id"), col("media")).as[(Long, Array[Byte])]
      .mapPartitions(_.collect { case (id, bytes) if bytes != null && bytes.nonEmpty =>
        (id + idOffset, encodeWav(scaleGain(decodeSamples(bytes))))
      })
      .toDF("doc_id", "media")
  }

  /** Perceptual near-dup pairs over the audio column: per-partition
    * REAL decode + envelope profile + average-hash (the SAME
    * [[Multimodal.aHash64]] threshold rule the image path uses — bit w
    * set iff 64·e(w) > Σe, which a uniform gain change preserves),
    * then the simhash combination-banding machinery. 100 TB shape
    * identical to image/simhash dedup: the only relation past the
    * scan is (doc_id, 8-byte sig).
    */
  def audioDedup(spark: SparkSession, docs: DataFrame, maxHamming: Int = 3): DataFrame = {
    import spark.implicits._
    // missing media gets NO signature and never pairs (see
    // Multimodal.phashDedup for why not a degenerate all-zero sig)
    val sigs = docs.select(col("doc_id"), col("media")).as[(Long, Array[Byte])]
      .mapPartitions(_.collect { case (id, bytes) if bytes != null && bytes.nonEmpty =>
        (id, Multimodal.aHash64(envelope64(decodeSamples(bytes))))
      })
      .toDF("doc_id", "_sig")
    Dedup.hammingBandPairs(sigs, maxHamming)
  }
}
