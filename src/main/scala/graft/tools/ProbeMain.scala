package graft.tools
import graft.{GraftSession, SparkEntry}
object ProbeMain {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession("local[8]", "probe")
    val dir = "/root/testdata/sf0.01"
    val pp = SparkEntry.queries("opt_partition_pruning")(spark, dir)
    val plan = pp.queryExecution.executedPlan.toString
    val scanLine = plan.linesIterator.find(_.contains("PartitionFilters")).getOrElse("NONE")
    println("PROBE pruning-filters => " + scanLine.substring(scanLine.indexOf("PartitionFilters")).take(130))
    println("PROBE pruning-result => " + pp.collect().take(2).mkString(" "))
    // probe: filter on a date with NO partition -> empty result, no error
    val base = pp.queryExecution.logical
    val none = spark.read.parquet(scanLine.split("InMemoryFileIndex").headOption.map(_ => s"${sys.props("java.io.tmpdir")}/graft-scratch/_root_testdata_sf0_01/events_partitioned").get)
      .filter(org.apache.spark.sql.functions.col("event_date") === "1999-12-31")
    println("PROBE pruning-missing-date => rows=" + none.count())
    val so = SparkEntry.queries("q35_set_ops")(spark, dir).collect()
    println("PROBE set-ops => " + so.take(4).mkString(" ") + " total=" + so.length)
    spark.stop()
  }
}
