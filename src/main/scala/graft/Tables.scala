package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.{col, expr}

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
    if (name == "events") {
      // events.ts is parquet TIMESTAMP(NANOS) which Spark has no native
      // type for. Read the raw int64 nanos (exactness preserved in
      // `ts_ns`) and surface `ts` as a µs-truncated TimestampType for
      // date/window functions. Integer `div` — a double division would
      // lose precision above 2^53 ns.
      spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
      spark.read.parquet(s"$sfDir/$name.parquet")
        .withColumnRenamed("ts", "ts_ns")
        .withColumn("ts", expr("timestamp_micros(ts_ns div 1000)"))
        .select(col("event_id"), col("ts"), col("user_id"),
          col("event_type"), col("value"), col("props"), col("ts_ns"))
    } else {
      spark.read.parquet(s"$sfDir/$name.parquet")
    }

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
