package graft.tools
import org.apache.spark.sql.SparkSession
object ProbeMain {
  def main(args: Array[String]): Unit = {
    // fresh JVM (sbt fork): withExtensions applies at session creation
    val spark = SparkSession.builder()
      .master("local[4]")
      .withExtensions(new graft.GraftExtensions)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    println("PROBE ext-sql => " + spark.sql("select fnv1a64('hello') as f, simhash64('a b c') as s").collect().mkString)
    println("PROBE ext-describe => " + spark.sql("describe function fnv1a64").collect().map(_.getString(0)).mkString(" | ").take(120))
    try spark.sql("select fnv1a64('a','b')").collect()
    catch { case e: Throwable => println("PROBE ext-arity => " + Option(e.getMessage).getOrElse("").linesIterator.next().take(100)) }
    spark.stop()
  }
}
