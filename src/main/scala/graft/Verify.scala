package graft
import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths}
import java.util.concurrent.{Executors, TimeUnit}
import java.util.concurrent.atomic.AtomicInteger

/** Driver-run correctness dump: each SparkEntry.queries result → parquet,
  * plus oracle_sql.json, for the driver's DuckDB compare.
  *
  * The oracle json is written FIRST so a mid-run kill (driver time
  * budget) still leaves the driver everything it needs to grade the
  * queries that did complete. Queries run CONCURRENTLY on a small
  * thread pool — Spark schedules jobs from many threads at once, and
  * at verify SFs most per-query wall time is fixed latency (job
  * scheduling, codegen, streaming triggers), not CPU, so overlapping
  * them cuts total wall several-fold. The engine/format family shares
  * one on-disk catalog file and fixed-name temp views, so it runs
  * serially first; every other query touches only its own state
  * (per-query scratch dirs, nanoTime-unique stream sinks).
  */
object Verify {
  def main(args: Array[String]): Unit = {
    val Array(sfDir, outDir) = args
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.codegen.cache.maxEntries", "5000")
      // concurrent verify jobs share executor slots round-robin
      // instead of queueing whole plans behind one another
      .config("spark.scheduler.mode", "FAIR")
      .getOrCreate()
    GraftSession.tune(spark)
    spark.sparkContext.setLogLevel("WARN")
    new java.io.File(outDir).mkdirs()

    // JSON string escape: backslash, quote, and ALL control chars (<0x20)
    // — a tab or CR in builder-authored SQL would otherwise make the
    // driver's json.load fail and silently zero the round's correctness.
    def q(s: String): String = "\"" + s.flatMap {
      case '"'  => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""
    val json = SparkEntry.oracleSql
      .map { case (k, v) => s"${q(k)}: ${q(v)}" }.mkString("{", ",", "}")
    Files.writeString(Paths.get(s"$outDir/oracle_sql.json"), json)

    // Optional targeted run (builder-side): comma-separated query names.
    // The driver never sets this, so its full-suite behavior is unchanged.
    val only = sys.env.get("SPARK_GRAFT_QUERIES")
      .map(_.split(',').map(_.trim).toSet)
    val all = SparkEntry.queries.toSeq
      .filter { case (name, _) => only.forall(_.contains(name)) }
      .sortBy(_._1)

    val t0 = System.nanoTime()
    val failed = new AtomicInteger(0)
    def runOne(name: String, fn: (SparkSession, String) => org.apache.spark.sql.DataFrame): Unit = {
      val s = System.nanoTime()
      try {
        fn(spark, sfDir).coalesce(1).write.mode("overwrite")
          .parquet(s"$outDir/$name")
        System.err.println(f"[verify] $name ok ${(System.nanoTime() - s) / 1e9}%.1fs")
      } catch { case e: Throwable =>
        failed.incrementAndGet()
        System.err.println(s"[verify] $name FAILED: ${e.getMessage}")
      }
    }

    val serialKeys = graft.queries.EngineOps.queries.keySet
    val (serial, par) = all.partition { case (k, _) => serialKeys(k) }
    serial.foreach { case (n, f) => runOne(n, f) }

    val pool = Executors.newFixedThreadPool(math.min(8, math.max(2, cpus.toInt)))
    par.foreach { case (n, f) =>
      val task: Runnable = () => runOne(n, f)
      pool.submit(task)
    }
    pool.shutdown()
    pool.awaitTermination(4, TimeUnit.HOURS)

    System.err.println(
      f"[verify] done: ${all.size} queries, ${failed.get} failed, ${(System.nanoTime() - t0) / 1e9}%.1fs total")
    spark.stop()
  }
}
