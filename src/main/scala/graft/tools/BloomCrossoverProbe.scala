package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Exercise [[graft.operators.Dedup.containment]]'s bounded-bloom
  * semi-filter arm ABOVE its real activation threshold (3 M docs) and
  * measure the crossover against the broadcast arm — round-5 verdict
  * task: until now the bloom arm was only ever spec-forced at toy
  * corpus sizes.
  *
  * The corpus is synthetic but adversarially shaped for the prefix
  * filter: documents come in families of four where member m's token
  * sequence is an exact suffix of member 0's, so every family carries
  * exactly 7 true containment pairs at t=0.9 — (m→m') at C=1.0 for all
  * m>m' plus (0→1) at exactly 0.9 — giving the probe a CLOSED-FORM
  * expected pair count (7 × families) that both arms must hit, while
  * the distinct-prefix-fp relation grows with family count into the
  * megabytes-broadcast regime where the sketch should win.
  *
  * Usage: runMain graft.tools.BloomCrossoverProbe <nDocs> [outJson]
  */
object BloomCrossoverProbe {

  /** (doc_id, text): family f = id/4, member m = id%4; tokens
    * w{f}_{m}..w{f}_{9} then two family-spanning tail words.
    */
  def corpus(spark: SparkSession, nDocs: Long): DataFrame =
    spark.range(nDocs)
      .select(col("id").as("doc_id"),
        concat_ws(" ",
          concat_ws(" ", expr(
            "transform(sequence(cast(id % 4 as int), 9), j -> concat('w', cast(id div 4 as string), '_', cast(j as string)))")),
          lit("zz qq")).as("text"))

  def main(args: Array[String]): Unit = {
    val nDocs = args(0).toLong
    val outJson = if (args.length > 1) args(1) else "bench/bloom_crossover_last.json"
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.codegen.cache.maxEntries", "5000")
      .getOrCreate()
    graft.GraftSession.tune(spark)
    spark.sparkContext.setLogLevel("WARN")
    val metrics = new ShuffleMetricsListener
    spark.sparkContext.addSparkListener(metrics)

    val dir = s"${sys.props("java.io.tmpdir")}/graft-bloomx-$nDocs"
    if (!new java.io.File(s"$dir/_SUCCESS").exists())
      corpus(spark, nDocs).write.mode("overwrite").parquet(dir)
    val docs = spark.read.parquet(dir)
    val expected = 7L * (nDocs / 4)

    def arm(name: String, bloomSemiFilterDocs: Long): String = {
      val (t, m) = QueryMeasure.measure(spark, metrics, name)(
        graft.operators.Dedup.containment(docs,
            bloomSemiFilterDocs = bloomSemiFilterDocs)
          .write.format("noop").mode("overwrite").save())
      // pair-count check is a second, untimed run of the same plan
      val pairs = graft.operators.Dedup.containment(docs,
        bloomSemiFilterDocs = bloomSemiFilterDocs).count()
      val line =
        f"""{"arm":"$name","n_docs":$nDocs,"wall_s":$t%.2f,"pairs":$pairs,"expected_pairs":$expected,"shuffle_read":${m.read},"shuffle_write":${m.write},"spill":${m.spill},"njobs":${m.jobs}}"""
      println(s"[bloomx] $line")
      line
    }

    val broadcastLine = arm("broadcast", Long.MaxValue)
    val bloomLine = arm("bloom", 0L)
    try {
      new java.io.File(outJson).getParentFile.mkdirs()
      java.nio.file.Files.writeString(java.nio.file.Paths.get(outJson),
        s"[$broadcastLine,\n$bloomLine]\n")
    } catch { case _: Throwable => }
    spark.stop()
  }
}
