package graft

import java.nio.file.Files

import graft.sources.{DataSourceFormat, Formats, Writers}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Edge cases for the text readers/writers: quoting, embedded
  * delimiters/newlines, nulls, unicode, empty strings.
  */
class FormatsEdgeSpec extends AnyFunSuite {
  import SparkTestSession._

  private lazy val tmp = Files.createTempDirectory("graft-fmt-edge").toString

  private def tricky = {
    import spark.implicits._
    Seq(
      (1L, "plain", Option("x")),
      (2L, "comma, inside", Option("y")),
      (3L, "quote \" inside", Option("z")),
      (4L, "newline\ninside", Option("w")),
      (5L, "unicode 你好 éü", Option("v")),
      (6L, "", Option("empty-text")),
      (7L, "null-extra", None)
    ).toDF("id", "text", "extra")
  }

  test("CSV roundtrip preserves quotes, commas, newlines, unicode, nulls") {
    val p = s"$tmp/tricky.csv"
    Writers.exportFile(tricky, p, Writers.ExportFormat.Csv)
    val back = Formats.read(spark, p, DataSourceFormat.Csv)
      .withColumn("id", col("id").cast("long")).orderBy("id").collect()
    val want = tricky.orderBy("id").collect()
    back.zip(want).foreach { case (g, w) =>
      assert(g.getLong(0) == w.getLong(0))
      // Spark CSV cannot distinguish empty string from null on read
      val gt = Option(g.getString(1)).getOrElse("")
      val wt = Option(w.getString(1)).getOrElse("")
      assert(gt == wt || (wt == "" && g.isNullAt(1)), s"row ${g.getLong(0)}")
      // embedded newline must survive quoted-field parsing
      if (w.getLong(0) == 4L) assert(gt.contains("\n"))
    }
  }

  test("NdJSON roundtrip preserves nulls and unicode exactly") {
    val p = s"$tmp/tricky.log"
    Writers.exportFile(tricky, p, Writers.ExportFormat.NdJson)
    val back = Formats.read(spark, p, DataSourceFormat.NdJson(".log"))
      .orderBy("id").collect()
    assert(back.length == 7)
    assert(back(4).getString(back(4).fieldIndex("text")) == "unicode 你好 éü")
    val r7 = back(6)
    assert(r7.isNullAt(r7.fieldIndex("extra")), "JSON null must read back as null")
  }

  test("TSV with embedded tab survives via quoting") {
    import spark.implicits._
    val df = Seq((1L, "has\ttab")).toDF("id", "text")
    val p = s"$tmp/tab.tsv"
    Writers.exportFile(df, p, Writers.ExportFormat.Tsv)
    val back = Formats.read(spark, p, DataSourceFormat.Tsv).collect()
    assert(back.head.getString(1) == "has\ttab")
  }

  test("XLSX roundtrip preserves unicode and xml-special characters") {
    import spark.implicits._
    val df = Seq((1.0, "a<b&c>d \"q\""), (2.0, "你好")).toDF("n", "s")
    val p = s"$tmp/special.xlsx"
    graft.sources.XlsxWriter.write(df, p)
    val back = graft.sources.XlsxSource.read(spark, p).orderBy("n").collect()
    assert(back(0).getString(1) == "a<b&c>d \"q\"")
    assert(back(1).getString(1) == "你好")
  }
}
