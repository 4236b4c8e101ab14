package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Hot-key stress probe for the SALTED stream-stream attribution join:
  * drain runAttribution(saltBuckets=N) against a derived corpus with a
  * planted hot user and compare count + Σlag_us + Σ(click_id·37+view_id)
  * checksums against the BATCH interval join — the distributed
  * equality check for outputs too large to collect.
  *
  * Usage: runMain graft.tools.SaltedAttrProbe <sfDir> [arm ...]
  * where each arm is `auto`, `auto-rocks`, `batch`, or an integer
  * (forced salt-all count). Default: batch + auto.
  */
object SaltedAttrProbe {
  def main(args: Array[String]): Unit = {
    val dir = args(0)
    val arms = if (args.length > 1) args.drop(1).toSeq else Seq("batch", "auto")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    graft.GraftSession.tune(spark)
    spark.sparkContext.setLogLevel("WARN")
    val events = graft.Tables(spark, dir, "events")

    def sig(label: String)(mk: => org.apache.spark.sql.DataFrame): Unit = {
      val t0 = System.nanoTime()
      val r = mk.agg(count(lit(1)).as("n"), sum(col("lag_us")).as("s"),
        sum(col("click_id") * 37 + col("view_id")).as("k")).head()
      println(f"[salted-attr] $label: n=${r.getLong(0)} lag_sum=${r.get(1)} " +
        f"key_sum=${r.get(2)} wall=${(System.nanoTime() - t0) / 1e9}%.1fs")
    }

    arms.foreach {
      case "batch" => sig("batch")(graft.streaming.Events.attribution(events))
      case "auto" => sig("stream auto")(graft.streaming.StreamingEvents
        .runAttribution(spark, events))
      case "auto-rocks" => sig("stream auto+rocksdb")(graft.streaming.StreamingEvents
        .runAttribution(spark, events, rocksDbState = true))
      case n => sig(s"stream salt=$n")(graft.streaming.StreamingEvents
        .runAttribution(spark, events, saltBuckets = n.toInt))
    }
    spark.stop()
  }
}
