package graft.tools
import graft.{GraftSession, SparkEntry}
object ProbeMain {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession("local[8]", "probe")
    val plan = SparkEntry.queries("q02_filter_project")(spark, "/root/testdata/sf0.1").queryExecution.executedPlan.toString
    plan.linesIterator.filter(l => l.contains("PushedFilters") || l.contains("Scan")).foreach(l => println("AUDIT " + l.trim.take(250)))
    spark.stop()
  }
}
