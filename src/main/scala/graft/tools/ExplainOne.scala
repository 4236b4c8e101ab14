package graft.tools

import org.apache.spark.sql.SparkSession

/** Print the formatted physical plan of one (or more) SparkEntry
  * queries to stdout — the inner-loop companion to PlanDump when
  * iterating on a single operator's plan shape.
  *
  * Usage: runMain graft.tools.ExplainOne <sfDir> <name> [name ...]
  */
object ExplainOne {
  def main(args: Array[String]): Unit = {
    val dir = args(0)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    graft.GraftSession.tune(spark)
    spark.sparkContext.setLogLevel("ERROR")
    args.drop(1).foreach { name =>
      val df = graft.SparkEntry.queries(name)(spark, dir)
      println(s"==== $name ====")
      println(df.queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode))
    }
    spark.stop()
  }
}
