package graft

import graft.queries.QueryUtil
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Z-order layout: measures the actual file-pruning payoff that
  * min/max stats get from a Morton-interleaved sort versus a
  * single-column sort. The claim that matters at 100 TB: a z-ordered
  * layout serves box queries on EITHER clustered dimension from a
  * small fraction of files, while a linear sort only serves its own
  * leading column.
  */
class ZorderSpec extends AnyFunSuite {
  import SparkTestSession._

  private def fileHits(layout: DataFrame, cond: org.apache.spark.sql.Column): (Long, Long) = {
    val total = layout.select(input_file_name()).distinct().count()
    val hit = layout.filter(cond).select(input_file_name()).distinct().count()
    (hit, total)
  }

  test("z-ordered files serve box queries on both dims; linear sort only on its own") {
    Tables.registerAll(spark, "/root/testdata/sf0.001")
    val li = Tables(spark, "/root/testdata/sf0.001", "lineitem")
      .select(col("l_partkey"), col("l_suppkey"))
    val z = spark.sql(QueryUtil.zorderBucketedSql("l_partkey", "l_suppkey"))

    val dir = java.nio.file.Files.createTempDirectory("graft-zorder").toString
    val nFiles = 16
    z.repartitionByRange(nFiles, col("z"))
      .sortWithinPartitions(col("z"))
      .write.mode("overwrite").parquet(s"$dir/zorder")
    li.repartitionByRange(nFiles, col("l_partkey"))
      .sortWithinPartitions(col("l_partkey"))
      .write.mode("overwrite").parquet(s"$dir/linear")

    val zLayout = spark.read.parquet(s"$dir/zorder")
    val linLayout = spark.read.parquet(s"$dir/linear")
    val stats = li.agg(max("l_partkey"), max("l_suppkey")).head()
    val (maxPart, maxSupp) = (stats.getLong(0), stats.getLong(1))
    // a ~1/8 box on each dimension
    val partBox = col("l_partkey") <= maxPart / 8
    val suppBox = col("l_suppkey") <= maxSupp / 8

    val (zPart, zTot) = fileHits(zLayout, partBox)
    val (zSupp, _) = fileHits(zLayout, suppBox)
    val (linPart, linTot) = fileHits(linLayout, partBox)
    val (linSupp, _) = fileHits(linLayout, suppBox)

    assert(zTot == nFiles && linTot == nFiles)
    // linear layout: perfect on its own column, useless on the other
    assert(linPart <= 3, s"partkey-sorted files localize partkey box: $linPart")
    assert(linSupp == nFiles, s"suppkey box hits every partkey-sorted file: $linSupp")
    // z-order: BOTH boxes prune — at most half the files each (the
    // morton-theoretical bound for a 1/8 box is ~nFiles/2 hit files at
    // this file count, and range-partition sampling can land exactly
    // on it, so the bound is inclusive), strictly better than the
    // linear layout's full scan on its non-leading column
    assert(zPart <= nFiles / 2, s"zorder prunes partkey box: $zPart of $zTot")
    assert(zSupp <= nFiles / 2, s"zorder prunes suppkey box: $zSupp of $zTot")
    assert(zSupp < linSupp, s"zorder must beat the linear layout's $linSupp")
  }

  test("morton key is monotone in box containment: interleave round-trips") {
    import spark.implicits._
    // spot-check the bit interleave against a reference implementation
    def ref(a: Long, b: Long): Long =
      (0 until 21).foldLeft(0L) { (acc, i) =>
        acc | ((a >> i) & 1L) << (2 * i) | ((b >> i) & 1L) << (2 * i + 1)
      }
    val pairs = Seq((0L, 0L), (1L, 0L), (0L, 1L), (123L, 456L),
      (65535L, 1L), (1048575L, 2097151L))
    val got = pairs.toDF("a", "b")
      .selectExpr("a", "b", s"${QueryUtil.zorderSql("a", "b")} AS z")
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    pairs.foreach { case (a, b) =>
      assert(got((a, b)) == ref(a, b), s"interleave($a,$b)")
    }
  }
}
