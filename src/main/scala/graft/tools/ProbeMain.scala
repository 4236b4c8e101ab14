package graft.tools
import graft.{GraftSession, SparkEntry}
object ProbeMain {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession("local[8]", "probe")
    val dir = "/root/testdata/sf0.01"
    val bj = SparkEntry.queries("opt_bucketed_join")(spark, dir)
    val plan = bj.queryExecution.executedPlan.toString
    val joinPart = plan.substring(plan.indexOf("SortMergeJoin"))
    println("PROBE bucketed-exchanges-in-join-subtree => " + "Exchange hashpartitioning".r.findAllIn(joinPart).size)
    println("PROBE bucketed-scan => " + plan.linesIterator.filter(_.contains("Bucketed: true")).size + " bucketed scans")
    println("PROBE bucketed-result => " + bj.collect().map(_.toString).mkString(" "))
    val ivf = SparkEntry.queries("sim_topk_ivf")(spark, dir)
    println("PROBE ivf-sample => " + ivf.limit(3).collect().mkString(", ") + " total=" + ivf.count())
    spark.stop()
  }
}
