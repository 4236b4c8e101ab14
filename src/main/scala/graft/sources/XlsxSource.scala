package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Distributed XLSX reader — implemented in the Sources milestone
  * (SURVEY.md §7 step 4). Placeholder so Formats compiles.
  */
object XlsxSource {
  def read(spark: SparkSession, path: String): DataFrame =
    throw new UnsupportedOperationException("XLSX reader not yet wired")
}
