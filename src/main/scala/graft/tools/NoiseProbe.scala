package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Bench-machine noise calibration: run one FIXED workload (a
  * lineitem scan + decimal aggregate — q01's shape, zero shuffle
  * variance, no code under test) `reps` times in one JVM and print
  * each wall. The spread on a plan whose work is constant IS the
  * machine's noise floor for that run — committed next to bench
  * artifacts so a wall-clock delta can be read against the floor
  * instead of against zero (same-code sf0.1 suite runs have measured
  * 196-251 s; single queries 2-31 s on identical plans and bytes).
  *
  * Usage: runMain graft.tools.NoiseProbe <sfDir> [reps]
  */
object NoiseProbe {
  def main(args: Array[String]): Unit = {
    val dir = args(0)
    val reps = if (args.length > 1) args(1).toInt else 8
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    graft.GraftSession.tune(spark)
    spark.sparkContext.setLogLevel("WARN")

    def once(): Double = {
      val t0 = System.nanoTime()
      graft.Tables(spark, dir, "lineitem")
        .filter(col("l_shipdate") <= lit("1998-09-02"))
        .groupBy(col("l_returnflag"), col("l_linestatus"))
        .agg(sum(col("l_quantity")).as("sq"),
          sum(col("l_extendedprice") * (lit(1) - col("l_discount"))).as("sd"),
          count(lit(1)).as("n"))
        .write.format("noop").mode("overwrite").save()
      (System.nanoTime() - t0) / 1e9
    }
    once() // JIT/codegen warmup, not reported
    val walls = (1 to reps).map(_ => once())
    val sorted = walls.sorted
    val med = sorted(reps / 2)
    println(walls.map(w => f"$w%.2f").mkString("[noise] walls: ", " ", " s"))
    println(f"[noise] median=$med%.2f min=${sorted.head}%.2f " +
      f"max=${sorted.last}%.2f spread=${sorted.last / sorted.head}%.1fx")
    spark.stop()
  }
}
