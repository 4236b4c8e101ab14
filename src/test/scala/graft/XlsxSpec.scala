package graft

import java.nio.file.Files

import graft.sources.{XlsxSource, XlsxWriter}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

class XlsxSpec extends AnyFunSuite {
  import SparkTestSession._

  private lazy val tmp = Files.createTempDirectory("graft-xlsx").toString

  test("writer → reader roundtrip preserves values and types") {
    val df = Tables(spark, sfDir, "nation")
    XlsxWriter.write(df, s"$tmp/nation.xlsx")
    val back = XlsxSource.read(spark, s"$tmp/nation.xlsx")
    assert(back.schema.fieldNames.toSeq == Seq("n_nationkey", "n_name", "n_regionkey"))
    // whole-number columns infer as bigint (reference types Int cells
    // integrally) so they join parquet bigints without a cast
    assert(back.schema("n_nationkey").dataType == LongType)
    assert(back.count() == df.count())
    val got = back.select(col("n_nationkey").cast("int"), col("n_name"), col("n_regionkey").cast("int"))
      .orderBy(col("n_nationkey")).collect().map(_.toSeq)
    val want = df.orderBy(col("n_nationkey")).collect().map(_.toSeq)
    assert(got.sameElements(want))
  }

  test("numeric columns with any fractional value stay double") {
    import spark.implicits._
    val df = Seq((1L, 2.0), (2L, 2.5), (3L, 4.0)).toDF("id", "x")
    XlsxWriter.write(df, s"$tmp/fracs.xlsx")
    val back = XlsxSource.read(spark, s"$tmp/fracs.xlsx")
    assert(back.schema("id").dataType == LongType)
    assert(back.schema("x").dataType == DoubleType)
    assert(back.orderBy("id").collect().map(_.getDouble(1)).toSeq == Seq(2.0, 2.5, 4.0))
  }

  test("glob inference widens bigint to double when a LATER shard is fractional") {
    import spark.implicits._
    // shard 0: whole numbers only; shard 1: a fractional value — the
    // column must infer double (first-shard-only inference would pick
    // bigint and silently null 2.5 at convert time)
    XlsxWriter.write(Seq((1L, 2.0), (2L, 4.0)).toDF("id", "x"), s"$tmp/gshard_0.xlsx")
    XlsxWriter.write(Seq((3L, 2.5)).toDF("id", "x"), s"$tmp/gshard_1.xlsx")
    val back = XlsxSource.read(spark, s"$tmp/gshard_*.xlsx")
    assert(back.schema("x").dataType == DoubleType)
    assert(back.orderBy("id").collect().map(_.getDouble(1)).toSeq == Seq(2.0, 4.0, 2.5))
  }

  test("a failing plan leaves no partial xlsx at the target path") {
    import spark.implicits._
    val df = Seq(1L, 2L).toDF("id")
      .withColumn("boom", assert_true(col("id") < 2L))
    val target = s"$tmp/partial.xlsx"
    intercept[Exception] { XlsxWriter.write(df, target) }
    assert(!Files.exists(java.nio.file.Paths.get(target)), "no truncated workbook")
    assert(!Files.exists(java.nio.file.Paths.get(s"$target.tmp")), "tmp cleaned up")
  }

  test("#Sheet selector picks the named sheet and errors on unknown") {
    val df = Tables(spark, sfDir, "region")
    XlsxWriter.write(df, s"$tmp/region.xlsx", sheetName = "Regions")
    assert(XlsxSource.read(spark, s"$tmp/region.xlsx#Regions").count() == 5)
    val e = intercept[Exception](XlsxSource.read(spark, s"$tmp/region.xlsx#Nope").count())
    assert(e.getMessage.contains("Nope"))
  }

  test("timestamps roundtrip through ISO strings back to timestamps; booleans survive") {
    import spark.implicits._
    val df = Seq((java.sql.Timestamp.valueOf("2024-01-02 03:04:05"), true, "a"),
      (java.sql.Timestamp.valueOf("2024-06-07 08:09:10"), false, "b"))
      .toDF("ts", "flag", "s")
    XlsxWriter.write(df, s"$tmp/mixed.xlsx")
    val back = XlsxSource.read(spark, s"$tmp/mixed.xlsx")
    // string cells shaped yyyy-MM-dd HH:mm:ss parse back into timestamps
    // (reference excel.rs:81-93)
    assert(back.schema("ts").dataType == TimestampType)
    val rows = back.orderBy("s").collect()
    assert(rows(0).getTimestamp(0) == java.sql.Timestamp.valueOf("2024-01-02 03:04:05"))
    assert(rows(0).getBoolean(1) === true)
    assert(rows(1).getBoolean(1) === false)
  }

  test("empty path errors cleanly") {
    val e = intercept[IllegalArgumentException](XlsxSource.read(spark, s"$tmp/none_*.xlsx"))
    assert(e.getMessage.contains("matches no files"))
  }
}
