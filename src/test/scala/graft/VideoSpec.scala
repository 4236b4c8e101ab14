package graft

import graft.operators.{Multimodal, Video}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class VideoSpec extends AnyFunSuite {
  import SparkTestSession._

  test("synthetic animated GIF round-trips losslessly through the JDK codec") {
    // generation → GIF sequence encode → LZW decode must be the
    // identity on every frame's raster (this is what lets the Python
    // oracle derive every expected value from the spec with no codec),
    // and the GraphicControlExtension delay must read back exactly
    Seq(0L, 1L, 7L, 123L, 10_000_000L).foreach { id =>
      val (w, h) = Multimodal.synthDims(id)
      val n = Video.nFrames(id)
      val frames = (0 until n).map(f => Video.synthFrame(id, f))
      val bytes = Video.encodeGif(w, h, frames, Video.delayCs(id))
      val iis = javax.imageio.ImageIO.createImageInputStream(
        new java.io.ByteArrayInputStream(bytes))
      val r = javax.imageio.ImageIO.getImageReaders(iis).next()
      r.setInput(iis)
      try {
        assert(r.getNumImages(true) == n, s"frame count changed for doc $id")
        (0 until n).foreach { f =>
          val (dw, dh, px) = Video.decodeFrame(r, f)
          assert(dw == w && dh == h, s"dims changed for doc $id frame $f")
          assert(px.sameElements(frames(f)), s"raster changed for doc $id frame $f")
          assert(Video.frameDelayCs(r, f) == Video.delayCs(id),
            s"delay metadata changed for doc $id frame $f")
        }
      } finally { r.dispose(); iis.close() }
    }
  }

  test("decodeMeta reads the real container; frame sampling decodes true rasters") {
    import spark.implicits._
    val docs = Seq(5L, 100L).toDF("doc_id")
    val metas = Video.decodeMeta(spark, Video.withSyntheticVideos(docs))
      .collect().map(m => m.doc_id -> m).toMap
    assert(metas(5L).n_frames == (2 + 5 % 4))
    assert(metas(5L).width == 16 + 5 % 17 && metas(5L).height == 16 + 5 % 13)
    assert(metas(5L).delay_cs == 4 + 5 % 7)
    assert(metas(5L).duration_ms == (2 + 5 % 4).toLong * (4 + 5 % 7) * 10)
    assert(metas(100L).format == "gif")

    val frames = Video.sampleFrames(spark, Video.withSyntheticVideos(Seq(5L).toDF("doc_id")))
      .collect().sortBy(_.frame_idx)
    val n = 2 + 5 % 4
    assert(frames.map(_.src_frame).toSeq == (0 until 2).map(i => i * n / 2))
    frames.foreach { fr =>
      val px = Video.synthFrame(5L, fr.src_frame)
      assert(fr.mean_luma == (px.map(_.toLong).sum / px.length).toInt,
        s"frame ${fr.frame_idx} must be the decoded spec mean luma")
    }
  }

  test("null and empty blobs degrade to zero meta / no frames, not exceptions") {
    import spark.implicits._
    val media = Seq(1L, 2L).toDF("doc_id")
      .withColumn("media", when(col("doc_id") === 2L, lit(null))
        .otherwise(lit(Array.empty[Byte])))
      .withColumn("media_type", lit("video/gif"))
    val metas = Video.decodeMeta(spark, media).collect()
    assert(metas.forall(m => m.format == "none" && m.n_frames == 0))
    assert(Video.sampleFrames(spark, media).collect().isEmpty)
  }

  test("temporal hash links per-frame perturbed GIF re-encodes that exact hashing misses") {
    import spark.implicits._
    val docs = spark.range(0, 64).toDF("doc_id")
    val base = Video.withSyntheticVideos(docs).select(col("doc_id"), col("media"))
    val withRe = base.unionByName(
      Video.reencodedCopies(spark, base, n = 32, idOffset = 1_000_000L))
    // per-frame pixel perturbation changes the LZW stream: exact
    // (byte-equality) dedup finds zero (original, re-encode) pairs
    val exact = withRe.withColumn("h", md5(col("media")))
      .groupBy(col("h")).count().filter(col("count") > 1).count()
    assert(exact == 0L, "pixel perturbation must defeat exact hashing")
    // the temporal-profile aHash survives: every re-encode pairs with
    // its original
    val pairs = Video.videoDedup(spark, withRe, maxHamming = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    (0L until 32L).foreach { id =>
      assert(pairs.contains((id, id + 1_000_000L)),
        s"re-encode of clip $id must link to its original at hamming <= 3")
    }
  }
}
