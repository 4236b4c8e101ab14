package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}

/** File-format inference and multi-format readers.
  *
  * Mirrors the reference's extension dispatch
  * (reference: src/data_source/utils.rs:5-27 — .csv/.tsv/.log/.txt/
  * .xlsx; .json rejected there but on its roadmap, supported here)
  * plus parquet (reference roadmap) and an explicit ndjson family.
  *
  * All readers are Spark DataSource scans: file listing, partitioned
  * reads, schema inference and pushdown are distributed — no
  * driver-side IO. Glob patterns in paths are handled natively by
  * Spark's file index (reference uses the `glob` crate,
  * src/data_source/utils.rs:29-38).
  */
sealed trait DataSourceFormat
object DataSourceFormat {
  case object Csv extends DataSourceFormat
  case object Tsv extends DataSourceFormat
  /** newline-delimited JSON; extension varies (.log/.txt/.ndjson/.jsonl) */
  case class NdJson(extension: String) extends DataSourceFormat
  /** a single JSON array-of-objects document */
  case object JsonArray extends DataSourceFormat
  case object Xlsx extends DataSourceFormat
  case object Parquet extends DataSourceFormat
}

object Formats {
  import DataSourceFormat._

  /** Infer a format from a path's extension; None → not a file ref.
    * `#Sheet` suffixes (xlsx sheet selector) are stripped first.
    */
  def infer(path: String): Option[DataSourceFormat] = {
    val p = path.stripSuffix("'").takeWhile(_ != '#').toLowerCase
    if (p.endsWith(".csv")) Some(Csv)
    else if (p.endsWith(".tsv")) Some(Tsv)
    else if (p.endsWith(".log")) Some(NdJson(".log"))
    else if (p.endsWith(".txt")) Some(NdJson(".txt"))
    else if (p.endsWith(".ndjson")) Some(NdJson(".ndjson"))
    else if (p.endsWith(".jsonl")) Some(NdJson(".jsonl"))
    // .json defaults to newline-delimited — it's what our own export
    // endpoint produces (and the dominant data-engineering format);
    // array-of-objects documents read via an explicit JsonArray
    else if (p.endsWith(".json")) Some(NdJson(".json"))
    else if (p.endsWith(".xlsx")) Some(Xlsx)
    else if (p.endsWith(".parquet")) Some(Parquet)
    else None
  }

  /** Read `path` (glob patterns allowed) as the given format.
    *
    * CSV/TSV read with multiLine=true so RFC-4180 quoted fields
    * containing newlines parse correctly (they are what our own
    * writer emits). Scale note: multiLine makes a file non-splittable
    * (parallelism = number of files, like gzip/xlsx); corpora known
    * to be newline-free inside fields can pass splittable=true to
    * restore intra-file splits.
    */
  def read(spark: SparkSession, path: String, format: DataSourceFormat,
      splittable: Boolean = false): DataFrame =
    format match {
      case Csv =>
        spark.read.option("header", "true").option("inferSchema", "true")
          .option("multiLine", (!splittable).toString).csv(path)
      case Tsv =>
        spark.read.option("header", "true").option("inferSchema", "true")
          .option("multiLine", (!splittable).toString)
          .option("sep", "\t").csv(path)
      case NdJson(_) => spark.read.json(path)
      case JsonArray => spark.read.option("multiLine", "true").json(path)
      case Xlsx => XlsxSource.read(spark, path)
      case Parquet => spark.read.parquet(path)
    }

  /** Read with format inferred from the extension. */
  def readAuto(spark: SparkSession, path: String): DataFrame =
    infer(path) match {
      case Some(f) => read(spark, path, f)
      case None => throw new IllegalArgumentException(
        s"Cannot infer a data-source format from path: $path")
    }
}
