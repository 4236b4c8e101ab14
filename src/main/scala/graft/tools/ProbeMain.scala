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
        println(s"PROBE $label => OK ${r.sqlType} rows=${r.rows.size} first=${r.rows.headOption}")
      } catch { case e: Throwable => println(s"PROBE $label => ERR ${e.getClass.getSimpleName}: ${e.getMessage.linesIterator.next()}") }
    tryIt("happy-direct-path", "select count(*) as n from '/root/testdata/sf0.001/lineitem.parquet'")
    tryIt("glob-zero-files", "select * from '/tmp/probe/nomatch_*.csv'")
    tryIt("ddl-no-location", "create table t1 (a int)")
    tryIt("ddl-then-select-relative", "create table cust2 () location 'customer.parquet'")
    tryIt("select-registered", "select count(*) as n from cust2")
    tryIt("unknown-table", "select * from never_created")
    tryIt("garbage", "selectt * from x")
    tryIt("empty", "")
    tryIt("unsupported-ext", "select * from '/tmp/probe/file.xyz'")
    tryIt("semicolon+limit", "select l_orderkey from '/root/testdata/sf0.001/lineitem.parquet' order by l_orderkey;")
    println("history=" + eng.catalog.history(5).map(h => h.status).mkString(","))
    spark.stop()
  }
}
