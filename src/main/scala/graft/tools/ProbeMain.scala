package graft.tools
import graft.GraftSession
import graft.sql.Engine
/** Scratch driver for manual probing; not part of the engine surface. */
object ProbeMain {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession("local[4]", "probe")
    val eng = new Engine(spark, dataDir = "/root/testdata/sf0.001",
      catalogDir = java.nio.file.Files.createTempDirectory("probe-cat").toString)
    def tryIt(label: String, sql: String): Unit =
      try {
        val r = eng.execute(sql)
        println(s"PROBE $label => OK rows=${r.rows.size} header=${r.header.mkString("|")} rows=${r.rows.map(_.mkString(",")).mkString(" ; ")}")
      } catch { case e: Throwable => println(s"PROBE $label => ERR ${e.getClass.getSimpleName}: ${Option(e.getMessage).map(_.linesIterator.next()).getOrElse("")}") }
    tryIt("foreign-xlsx", "select * from '/tmp/probe/foreign.xlsx' order by id")
    tryIt("foreign-xlsx-sheet", "select name from '/tmp/probe/foreign.xlsx#Data' order by name")
    tryIt("foreign-xlsx-badsheet", "select * from '/tmp/probe/foreign.xlsx#Wrong'")
    tryIt("corrupt-xlsx", "select * from '/tmp/probe/corrupt.xlsx'")
    spark.stop()
  }
}
