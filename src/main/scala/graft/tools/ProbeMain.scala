package graft.tools
import graft.{GraftSession, SparkEntry}
object ProbeMain {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession("local[8]", "probe")
    val dir = "/root/testdata/sf0.1"
    def run(name: String): Double = {
      val t0 = System.nanoTime()
      SparkEntry.queries(name)(spark, dir).write.format("noop").mode("overwrite").save()
      val t = (System.nanoTime()-t0)/1e9
      spark.catalog.clearCache()
      t
    }
    run("q01_agg")
    val names = SparkEntry.queries.keys.toSeq.sorted.takeWhile(_ != "q01_agg")
    names.foreach(run)
    val rt = Runtime.getRuntime
    println(f"PROBE heap-before-gc => used ${(rt.totalMemory-rt.freeMemory)/1e9}%.1f GB of ${rt.totalMemory/1e9}%.1f GB")
    System.gc(); Thread.sleep(2000)
    println(f"PROBE heap-after-gc => used ${(rt.totalMemory-rt.freeMemory)/1e9}%.1f GB")
    println(f"PROBE q01-after-gc => ${run("q01_agg")}%.2f s")
    println(f"PROBE q01-again => ${run("q01_agg")}%.2f s")
    spark.stop()
  }
}
