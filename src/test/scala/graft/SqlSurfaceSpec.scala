package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

object SparkTestSession {
  lazy val spark: SparkSession = {
    val s = GraftSession("local[4]", "graft-test")
    s
  }
  val sfDir = "/root/testdata/sf0.001"
}

class SqlSurfaceSpec extends AnyFunSuite {
  import SparkTestSession._

  test("entry returns rows") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("every declared query runs and returns rows at sf0.001") {
    SparkEntry.queries.foreach { case (name, fn) =>
      val n = fn(spark, sfDir).count()
      assert(n > 0, s"$name returned 0 rows")
    }
  }

  test("every query has matching oracle coverage or is rows-only by design") {
    val missing = SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet
    assert(missing.isEmpty, s"oracles without queries: $missing")
  }

  test("q01 aggregates are exact-decimal stable") {
    val r1 = SparkEntry.queries("q01_agg")(spark, sfDir).collect()
    val r2 = SparkEntry.queries("q01_agg")(spark, sfDir).repartition(7).collect()
    assert(r1.map(_.toString).sorted.sameElements(r2.map(_.toString).sorted))
  }
}
