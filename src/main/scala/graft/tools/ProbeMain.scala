package graft.tools
import graft.GraftSession
object ProbeMain {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession("local[4]", "probe")
    val df = spark.read.format("graft-xlsx").load("/tmp/probe/foreign.xlsx")
    println("PROBE v2-foreign => " + df.collect().mkString(" ; "))
    println("PROBE v2-foreign-schema => " + df.schema.map(f => s"${f.name}:${f.dataType.simpleString}").mkString(","))
    spark.stop()
  }
}
