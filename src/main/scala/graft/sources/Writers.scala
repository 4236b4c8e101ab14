package graft.sources

import java.nio.file.{Files, Path, Paths}

import org.apache.spark.sql.DataFrame

import scala.jdk.CollectionConverters._

/** Query-result export (reference: src/controllers.rs:188-257
  * `/query/export` → CSV / TSV / JSON(ndjson) download).
  *
  * Two shapes:
  *  - `exportDir` — the scale path: a normal partitioned distributed
  *    write (what you want for a 100 TB result set).
  *  - `exportFile` — the reference's semantic: one downloadable file.
  *    Implemented as a single-partition write then a rename of the
  *    part file; only for human-sized results.
  */
object Writers {

  sealed trait ExportFormat { def extension: String }
  object ExportFormat {
    case object Csv extends ExportFormat { val extension = ".csv" }
    case object Tsv extends ExportFormat { val extension = ".tsv" }
    case object NdJson extends ExportFormat { val extension = ".json" }
    /** beyond the reference's CSV/TSV/JSON (single-file only) */
    case object Xlsx extends ExportFormat { val extension = ".xlsx" }

    def of(name: String): ExportFormat = name.trim.toUpperCase match {
      case "CSV" => Csv
      case "TSV" => Tsv
      case "JSON" | "NDJSON" | "DNJSON" => NdJson
      case "XLSX" => Xlsx
      case other => throw new IllegalArgumentException(s"Unknown export format: $other")
    }
  }

  private def write(df: DataFrame, dir: String, format: ExportFormat): Unit = format match {
    case ExportFormat.Csv =>
      df.write.mode("overwrite").option("header", "true").csv(dir)
    case ExportFormat.Tsv =>
      df.write.mode("overwrite").option("header", "true").option("sep", "\t").csv(dir)
    case ExportFormat.NdJson =>
      df.write.mode("overwrite").json(dir)
    case ExportFormat.Xlsx =>
      throw new IllegalArgumentException(
        "XLSX is a single-file download format; use exportFile")
  }

  /** Distributed partitioned export — the 100 TB path. */
  def exportDir(df: DataFrame, dir: String, format: ExportFormat): Unit =
    write(df, dir, format)

  /** Single-file export for download; returns the file path. */
  def exportFile(df: DataFrame, filePath: String, format: ExportFormat): Path = {
    if (format == ExportFormat.Xlsx) return XlsxWriter.write(df, filePath)
    val target = Paths.get(filePath)
    val tmpDir = target.resolveSibling(target.getFileName.toString + ".staging")
    write(df.coalesce(1), tmpDir.toString, format)
    val listStream = Files.list(tmpDir)
    val part = try {
      listStream.iterator().asScala
        .find(p => p.getFileName.toString.startsWith("part-"))
        .getOrElse(throw new IllegalStateException(s"No part file written under $tmpDir"))
    } finally listStream.close()
    Files.createDirectories(target.toAbsolutePath.getParent)
    Files.deleteIfExists(target)
    Files.move(part, target)
    // clean the staging dir (part file already moved out); NIO streams
    // hold an open directory handle and must be closed
    val walkStream = Files.walk(tmpDir)
    try walkStream.iterator().asScala.toSeq.reverse.foreach(Files.deleteIfExists(_))
    finally walkStream.close()
    target
  }
}
