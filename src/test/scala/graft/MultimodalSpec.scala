package graft

import graft.operators.Multimodal
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class MultimodalSpec extends AnyFunSuite {
  import SparkTestSession._

  private def media(rows: Seq[(Long, String)]) = {
    import spark.implicits._
    Multimodal.withFakeMedia(rows.toDF("doc_id", "text"))
  }

  test("frame sampling fans out k frames at floor(i*n/k) offsets; empty blobs yield none") {
    import spark.implicits._
    val df = media(Seq((1L, "abcdefghij"), (2L, "")))
      .withColumn("media", when(col("doc_id") === 2L, lit(null)).otherwise(col("media")))
    val frames = Multimodal.sampleFrames(spark, df, k = 4).collect().sortBy(_.frame_idx)
    assert(frames.forall(_.doc_id == 1L), "empty blob must produce no frames")
    assert(frames.map(_.byte_offset).toSeq == Seq(0L, 2L, 5L, 7L))
    assert(frames.map(_.frame_byte).toSeq == Seq('a'.toInt, 'c'.toInt, 'f'.toInt, 'h'.toInt))
  }

  test("resize plan preserves aspect, fits the box, never upscales") {
    val small = "x" * 100 // w=100, h='x'%480=120 — inside the box
    val wide = "y" * 500 // w=500, h='y'%480=121 — must shrink to 224 wide
    val metas = Multimodal.resizeMeta(spark, media(Seq((1L, small), (2L, wide))))
      .collect().map(m => m.doc_id -> m).toMap
    assert(metas(1L).out_w == 100 && metas(1L).out_h == 120, "no upscale")
    val m2 = metas(2L)
    assert(m2.out_w == 224 && m2.out_h == (121.0 * 224 / 500).toInt)
    assert(m2.out_w <= 224 && m2.out_h <= 224)
  }

  test("phash links lossy re-encodes that exact hashing misses") {
    import spark.implicits._
    val texts = (0L until 8L).map(i =>
      (i, s"doc $i body " + (1 to 40).map(j => s"w${i}_$j").mkString(" ")))
    val base = media(texts).select(col("doc_id"), col("media"))
    val re = Multimodal.reencodedCopies(spark, base, n = 8, idOffset = 100L)
    // the re-encode really changed the bytes: exact (byte) equality fails
    val exactMatches = base.join(re.withColumnRenamed("doc_id", "rid"),
      base("media") === re("media")).count()
    assert(exactMatches == 0L, "fakeReencode must change bytes")
    // ... but every (original, re-encode) pair survives the perceptual hash
    val pairs = Multimodal.phashDedup(spark, base.unionByName(re))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    (0L until 8L).foreach { i =>
      assert(pairs.contains((i, i + 100L)), s"re-encode of $i not linked: $pairs")
    }
    // hamming symmetry/ordering: pairs come out (low, high) once
    assert(pairs.forall { case (a, b) => a < b })
  }
}
