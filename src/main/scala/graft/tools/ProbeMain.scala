package graft.tools
import graft.GraftSession
import graft.sql.Engine
object ProbeMain {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession("local[4]", "probe")
    val eng = new Engine(spark, dataDir = "/tmp/probe",
      catalogDir = java.nio.file.Files.createTempDirectory("probe-cat").toString)
    val r = eng.execute("select id, note from '/tmp/probe/multiline.csv' order by id")
    println("PROBE multiline-rows => " + r.rows.map(_.mkString("[", "|", "]")).mkString(" ; "))
    println("PROBE multiline-count => " + r.rows.size)
    spark.stop()
  }
}
