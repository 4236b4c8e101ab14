package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Loaders for the driver-generated TPC-H-ish parquet tables (see
  * TESTDATA.md). Queries receive an `sfDir` and read through here so
  * every scan goes through one code path (column pruning + filter
  * pushdown verified once).
  */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def apply(spark: SparkSession, sfDir: String, name: String): DataFrame =
    spark.read.parquet(s"$sfDir/$name.parquet")

  /** Register all tables as temp views (lazy — no IO until a query
    * actually scans one) so `spark.sql` text can reference them by
    * name, mirroring the reference catalog registration
    * (reference: src/data_source/context.rs:34-81).
    */
  def registerAll(spark: SparkSession, sfDir: String): SparkSession = {
    GraftSession.tune(spark)
    names.foreach(n => apply(spark, sfDir, n).createOrReplaceTempView(n))
    spark
  }
}
