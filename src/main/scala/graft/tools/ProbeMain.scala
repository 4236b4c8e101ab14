package graft.tools

import graft.{GraftSession, SparkEntry}

/** Minimal smoke driver: runs the flagship entry query and prints its
  * result — handy for quick sanity checks (`sbt "runMain
  * graft.tools.ProbeMain [sfDir]"`). The full surface runs through
  * graft.Verify.
  */
object ProbeMain {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession("local[4]", "graft-smoke")
    val rows = SparkEntry.entry(spark).collect()
    println(s"entry() rows=${rows.length}")
    rows.foreach(r => println("  " + r))
    spark.stop()
  }
}
