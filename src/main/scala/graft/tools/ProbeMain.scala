package graft.tools
import graft.{GraftSession, Tables}
import graft.operators.Similarity
import org.apache.spark.sql.functions._
object ProbeMain {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession("local[8]", "probe")
    val emb = Tables(spark, "/root/testdata/sf0.01", "embeddings")
    val c0 = Similarity.kmeansCentroids(emb, 16, 0+1)
    val c3 = Similarity.kmeansCentroids(emb, 16, 3)
    println("PROBE centroids-after-1-iter => " + c0.count())
    println("PROBE centroids-after-3-iters => " + c3.count())
    val dims = c3.select(size(col("_cent")).as("d")).distinct().collect().map(_.getInt(0)).toSeq
    println("PROBE centroid-dims => " + dims)
    spark.stop()
  }
}
