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
}
