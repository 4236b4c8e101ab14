package graft

import graft.operators.Audio
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class AudioSpec extends AnyFunSuite {
  import SparkTestSession._

  test("synthetic WAV round-trips losslessly through the JDK codec") {
    // generation → WAV encode → javax.sound.sampled decode must be the
    // identity on PCM samples (this is what lets the DuckDB/Python
    // oracles derive every expected value from the spec with no codec)
    Seq(0L, 1L, 7L, 123L, 10_000_000L).foreach { id =>
      val samples = Audio.synthSamples(id)
      val bytes = Audio.encodeWav(samples)
      val decoded = Audio.decodeSamples(bytes)
      assert(decoded.sameElements(samples), s"PCM changed in round trip for doc $id")
      val aff = Audio.decodeHeader(bytes)
      val f = aff.getFormat
      assert(f.getEncoding.toString == "PCM_UNSIGNED")
      assert(f.getSampleRate.toInt == Audio.SampleRate)
      assert(f.getChannels == 1 && f.getSampleSizeInBits == 8)
      assert(aff.getFrameLength == Audio.nFrames(id))
    }
  }

  test("decodeMeta reads the real RIFF header; frame sampling decodes true amplitudes") {
    import spark.implicits._
    val docs = Seq(5L, 100L).toDF("doc_id")
    val metas = Audio.decodeMeta(spark, Audio.withSyntheticAudio(docs))
      .collect().map(m => m.doc_id -> m).toMap
    assert(metas(5L).n_frames == 64 + 5 % 97)
    assert(metas(5L).sample_rate == 8000 && metas(5L).channels == 1 && metas(5L).bits == 8)
    assert(metas(5L).duration_ms == (64 + 5 % 97) * 1000L / 8000)
    assert(metas(100L).encoding == "PCM_UNSIGNED")

    val frames = Audio.sampleFrames(spark, Audio.withSyntheticAudio(Seq(5L).toDF("doc_id")))
      .collect().sortBy(_.frame_idx)
    val n = 64 + 5 % 97
    assert(frames.map(_.frame_offset).toSeq == (0 until 4).map(i => i.toLong * n / 4))
    frames.foreach { fr =>
      assert(fr.amplitude == ((5L * 131 + fr.frame_offset * 31) % 256).toInt,
        s"frame ${fr.frame_idx} must be the decoded spec amplitude")
    }
  }

  test("null and empty blobs degrade to zero meta / no frames, not exceptions") {
    import spark.implicits._
    val media = Seq(1L, 2L).toDF("doc_id")
      .withColumn("media", when(col("doc_id") === 2L, lit(null))
        .otherwise(lit(Array.empty[Byte])))
      .withColumn("media_type", lit("audio/wav"))
    val metas = Audio.decodeMeta(spark, media).collect()
    assert(metas.forall(m => m.encoding == "none" && m.n_frames == 0L))
    assert(Audio.sampleFrames(spark, media).collect().isEmpty)
  }

  test("envelope hash links gain-scaled re-encodes that exact hashing misses") {
    import spark.implicits._
    val docs = spark.range(0, 64).toDF("doc_id")
    val base = Audio.withSyntheticAudio(docs).select(col("doc_id"), col("media"))
    val withRe = base.unionByName(
      Audio.reencodedCopies(spark, base, n = 32, idOffset = 1_000_000L))
    // gain scaling changes almost every byte: exact (byte-equality)
    // dedup finds zero (original, re-encode) pairs
    val exact = withRe.withColumn("h", md5(col("media")))
      .groupBy(col("h")).count().filter(col("count") > 1).count()
    assert(exact == 0L, "gain scaling must defeat exact hashing")
    // the envelope aHash survives: every re-encode pairs with its original
    val pairs = Audio.audioDedup(spark, withRe, maxHamming = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    (0L until 32L).foreach { id =>
      assert(pairs.contains((id, id + 1_000_000L)),
        s"re-encode of clip $id must link to its original at hamming <= 3")
    }
  }

  test("envelope hash is gain-invariant by construction on the threshold rule") {
    // 64·e(w) > Σe compares RATIOS: a uniform 5/4 magnitude scale with
    // no clamping leaves every comparison's sign unchanged up to the
    // integer floors — hamming stays far below the band threshold
    Seq(3L, 42L, 77L).foreach { id =>
      val pcm = Audio.synthSamples(id)
      val a = graft.operators.Multimodal.aHash64(Audio.envelope64(pcm))
      val b = graft.operators.Multimodal.aHash64(Audio.envelope64(Audio.scaleGain(pcm)))
      assert(java.lang.Long.bitCount(a ^ b) <= 3,
        s"clip $id: gain-scaled envelope hash drifted past the band radius")
    }
  }
}
