package graft.streaming

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Event-stream operators (SURVEY.md §2E) — the same declarative
  * transforms run in batch (for the oracle gate) and under Structured
  * Streaming (watermark + windowed state). At scale the streaming
  * variant's state is bounded by the watermark; the batch variant is a
  * plain two-level aggregate.
  */
object Events {

  /** Tumbling 1-hour aggregate per event type. */
  def hourlyAgg(events: DataFrame): DataFrame =
    events
      .groupBy(window(col("ts"), "1 hour").as("w"), col("event_type"))
      .agg(
        count(lit(1)).as("n"),
        sum(col("value").cast(DecimalType(18, 6))).cast("double").as("sum_value"))
      .select(date_format(col("w.start"), "yyyy-MM-dd HH").as("hour"),
        col("event_type"), col("n"), col("sum_value"))

  /** Gap-based sessionization per user via `session_window`, rolled up
    * to per-user session stats. A session extends while consecutive
    * events arrive within `gap`.
    */
  def sessionStats(events: DataFrame, gap: String = "1 day"): DataFrame =
    events
      .groupBy(session_window(col("ts"), gap).as("sw"), col("user_id"))
      .agg(count(lit(1)).as("n"))
      .groupBy(col("user_id"))
      .agg(count(lit(1)).as("n_sessions"),
        sum(col("n")).as("n_events"),
        max(col("n")).as("max_session_events"))

  /** Streaming source over the events parquet, with the same
    * nanosecond handling as the batch loader (Tables.apply).
    */
  def stream(spark: SparkSession, sfDir: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val path = s"$sfDir/events.parquet"
    val rawSchema = spark.read.parquet(path).schema
    // the file-stream source monitors a DIRECTORY; stage the single
    // table file into one via symlink (a real deployment streams a
    // landing directory to begin with)
    val dir = java.nio.file.Files.createTempDirectory("graft-evt-stream")
    val link = java.nio.file.Files.createSymbolicLink(
      dir.resolve("events.parquet"), java.nio.file.Paths.get(path))
    // staging artifacts die with the JVM instead of accumulating
    link.toFile.deleteOnExit()
    dir.toFile.deleteOnExit()
    spark.readStream.schema(rawSchema).parquet(dir.toString)
      .withColumnRenamed("ts", "ts_ns")
      .withColumn("ts", expr("timestamp_micros(ts_ns div 1000)"))
  }

  /** Streaming tumbling-window aggregate with a watermark bounding
    * state; used by the streaming spec through a memory sink.
    */
  def streamingHourlyAgg(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "2 hours")
      .groupBy(window(col("ts"), "1 hour").as("w"), col("event_type"))
      .agg(count(lit(1)).as("n"))
      .select(date_format(col("w.start"), "yyyy-MM-dd HH").as("hour"),
        col("event_type"), col("n"))
}
