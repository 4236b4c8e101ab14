package graft.tools
import graft.{GraftSession, Tables}
import org.apache.spark.sql.functions._
object ProbeMain {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession("local[4]", "probe")
    import spark.implicits._
    // drive flatMapGroupsWithState alerts end-to-end as a streaming query
    val dir = java.nio.file.Files.createTempDirectory("probe-alerts")
    val evDf = Tables(spark, "/root/testdata/sf0.001", "events")
      .select(col("user_id"), col("event_type"), col("value"))
    evDf.write.mode("overwrite").parquet(dir.toString + "/in")
    val stream = spark.readStream.schema(evDf.schema).parquet(dir.toString + "/in")
      .as[graft.streaming.UserEvent]
    val q = graft.streaming.Stateful.thresholdAlerts(spark, stream, threshold = 100.0)
      .writeStream.outputMode("append").format("memory").queryName("alerts").start()
    q.processAllAvailable(); q.stop()
    val alerts = spark.table("alerts").collect()
    println(s"PROBE alerts => ${alerts.length} alerts, sample=${alerts.take(2).mkString(", ")}")
    println(s"PROBE alerts-distinct-users => ${alerts.map(_.getLong(0)).distinct.length == alerts.length}")
    spark.stop()
  }
}
