package graft

import graft.operators.Multimodal
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class MultimodalSpec extends AnyFunSuite {
  import SparkTestSession._

  test("synthetic PNG round-trips losslessly through the JDK codec") {
    // generation → ImageIO png encode → ImageIO decode must be the
    // identity on pixels (this is what lets the Python oracle derive
    // expected pixels from the spec with no codec at all)
    Seq(0L, 1L, 7L, 123L, 10_000_000L).foreach { id =>
      val (w, h) = Multimodal.synthDims(id)
      val px = Multimodal.synthPixels(id)
      val bytes = Multimodal.encodeImage(w, h, px)
      val (dw, dh, dpx) = Multimodal.decodePixels(bytes)
      assert((dw, dh) == (w, h), s"dims changed in round trip for doc $id")
      assert(dpx.sameElements(px), s"pixels changed in round trip for doc $id")
      val (hw, hh, fmt) = Multimodal.decodeHeader(bytes)
      assert((hw, hh, fmt) == (w, h, "png"))
    }
  }

  test("decodeMeta reads real header dims; frame sampling fans out k frames") {
    import spark.implicits._
    val docs = Seq(5L, 21L).toDF("doc_id")
    val metas = Multimodal.decodeMeta(spark, Multimodal.withSyntheticImages(docs))
      .collect().map(m => m.doc_id -> m).toMap
    assert(metas(5L).width == 16 + 5 % 17 && metas(5L).height == 16 + 5 % 13)
    assert(metas(5L).format == "png" && metas(5L).n_pixels ==
      metas(5L).width.toLong * metas(5L).height)
    // video frame sampling stays a byte-offset stub (no container
    // codec in the JDK): k frames at floor(i*n/k), empty blobs none
    val df = Seq((1L, "abcdefghij"), (2L, "")).toDF("doc_id", "text")
    val media = Multimodal.withFakeMedia(df)
      .withColumn("media", when(col("doc_id") === 2L, lit(null)).otherwise(col("media")))
    val frames = Multimodal.sampleFrames(spark, media, k = 4).collect().sortBy(_.frame_idx)
    assert(frames.forall(_.doc_id == 1L), "empty blob must produce no frames")
    assert(frames.map(_.byte_offset).toSeq == Seq(0L, 2L, 5L, 7L))
  }

  test("resize plan from real dims preserves aspect, fits the box, never upscales") {
    import spark.implicits._
    // doc 16: w=16+16%17=32, h=16+16%13=19 — must shrink to fit 24
    // doc 0:  w=16, h=16 — inside the box, no upscale
    val docs = Seq(0L, 16L).toDF("doc_id")
    val metas = Multimodal.resizeMeta(spark,
      Multimodal.withSyntheticImages(docs), box = 24)
      .collect().map(m => m.doc_id -> m).toMap
    assert(metas(0L).out_w == 16 && metas(0L).out_h == 16, "no upscale")
    val m2 = metas(16L)
    assert(m2.width == 32 && m2.height == 19)
    assert(m2.out_w == 24 && m2.out_h == (19.0 * 24 / 32).toInt)
    assert(m2.out_w <= 24 && m2.out_h <= 24)
  }

  test("phash links pixel-perturbed re-encodes that exact hashing misses") {
    import spark.implicits._
    val base = Multimodal.withSyntheticImages((0L until 8L).toDF("doc_id"))
      .select(col("doc_id"), col("media"))
    val re = Multimodal.reencodedCopies(spark, base, n = 8, idOffset = 100L)
    // the re-encode really changed the bytes: exact (byte) equality fails
    val exactMatches = base.join(re.withColumnRenamed("doc_id", "rid"),
      base("media") === re("media")).count()
    assert(exactMatches == 0L, "re-encode must change bytes")
    // ... but every (original, re-encode) pair survives the perceptual hash
    val pairs = Multimodal.phashDedup(spark, base.unionByName(re))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    (0L until 8L).foreach { i =>
      assert(pairs.contains((i, i + 100L)), s"re-encode of $i not linked: $pairs")
    }
    // hamming symmetry/ordering: pairs come out (low, high) once
    assert(pairs.forall { case (a, b) => a < b })
  }

  test("aHash survives a REAL lossy JPEG round trip (true perceptual robustness)") {
    // the gated pipeline uses a deterministic pixel perturbation (the
    // Python oracle can't replay a codec's quantization); this spec
    // closes the loop with the actual JPEG codec: encode the gradient
    // as JPEG, decode the lossy pixels, and require the aHash to stay
    // within a small hamming distance while the bytes (and pixels)
    // really changed
    Seq(3L, 11L, 42L).foreach { id =>
      val (w, h) = Multimodal.synthDims(id)
      val px = Multimodal.synthPixels(id)
      val jpeg = Multimodal.encodeImage(w, h, px, format = "jpg")
      val (dw, dh, dpx) = Multimodal.decodePixels(jpeg)
      assert((dw, dh) == (w, h))
      assert(!dpx.sameElements(px), s"JPEG of doc $id decoded losslessly?!")
      val a = Multimodal.aHash64(Multimodal.gray64(w, h, px))
      val b = Multimodal.aHash64(Multimodal.gray64(dw, dh, dpx))
      val hamming = java.lang.Long.bitCount(a ^ b)
      assert(hamming <= 8, s"doc $id aHash moved $hamming bits after JPEG round trip")
    }
  }
}
