package graft.tools
import graft.{GraftSession, Tables}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType
object ProbeMain {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession("local[8]", "probe")
    val dir = "/root/testdata/sf0.1"
    def time(label: String)(df: org.apache.spark.sql.DataFrame): Unit = {
      df.write.format("noop").mode("overwrite").save() // warm
      System.gc()
      val t0 = System.nanoTime()
      df.write.format("noop").mode("overwrite").save()
      println(f"PROBE $label => ${(System.nanoTime()-t0)/1e9}%.2f s")
    }
    val li = Tables(spark, dir, "lineitem").filter(col("l_shipdate") <= lit("2000-09-02").cast("timestamp"))
    def agg(sumExpr: String => org.apache.spark.sql.Column) =
      li.groupBy(col("l_returnflag"), col("l_linestatus")).agg(
        sumExpr("l_quantity").as("a"),
        sumExpr("l_extendedprice").as("b"),
        count(lit(1)).as("n"))
    time("double-sum")(agg(c => sum(col(c))))
    time("decimal12-sum")(agg(c => sum(col(c).cast(DecimalType(12,2))).cast("double")))
    time("decimal8-sum")(agg(c => sum(col(c).cast(DecimalType(8,2))).cast("double")))
    time("longcents-sum")(agg(c => (sum(round(col(c)*100, 0).cast("long"))/100.0)))
    // full q01 for reference
    time("full-q01")(graft.queries.SqlSurfaceA.q01_agg(spark, dir))
    spark.stop()
  }
}
