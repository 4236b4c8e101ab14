package graft.tools
import graft.GraftSession
import graft.functions.GraftFunctions
import org.apache.spark.sql.functions._
/** Scratch driver for manual probing; not part of the engine surface. */
object ProbeMain {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession("local[4]", "probe")
    GraftFunctions.register(spark)
    import spark.implicits._
    // codegen check: is Fnv1a64 inside a WholeStageCodegen span?
    val df = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .selectExpr("fnv1a64(text) as fp", "simhash64(text) as sh")
    val plan = df.queryExecution.executedPlan.toString
    println("PROBE codegen-span => " + plan.linesIterator.take(3).mkString(" | "))
    println("PROBE values => " + df.limit(2).collect().mkString(", "))
    println("PROBE null-input => " + Seq[(java.lang.Long, String)]((1L, null)).toDF("id","text").selectExpr("fnv1a64(text)").collect().mkString)
    try { spark.sql("select fnv1a64('a','b')").collect() }
    catch { case e: Throwable => println("PROBE wrong-arity => " + e.getMessage.linesIterator.next()) }
    spark.stop()
  }
}
