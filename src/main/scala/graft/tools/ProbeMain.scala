package graft.tools
import graft.{GraftSession, SparkEntry}
object ProbeMain {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession("local[8]", "probe")
    val df = SparkEntry.queries("text_heavy_hitters")(spark, "/root/testdata/sf0.01")
    val plan = df.queryExecution.executedPlan.toString
    println("PROBE agg-nodes => " + plan.linesIterator.filter(_.contains("Aggregate")).map(_.trim.take(90)).mkString(" || "))
    println("PROBE result-head => " + df.collect().take(3).mkString(", "))
    spark.stop()
  }
}
