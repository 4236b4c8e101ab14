package graft

import graft.operators.Sampling
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class SamplingSpec extends AnyFunSuite {
  import SparkTestSession._

  test("split is deterministic, total, and roughly 80/10/10") {
    val docs = Tables(spark, sfDir, "documents")
    val counts = Sampling.split(docs, col("doc_id"))
      .groupBy("split").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val n = docs.count()
    assert(counts.values.sum == n, "every row gets exactly one split")
    assert(counts("train") > n * 6 / 10 && counts("train") < n * 95 / 100)
    assert(counts.keySet == Set("train", "val", "test"))
    // re-running yields the identical assignment (pure function of id)
    val a = Sampling.split(docs, col("doc_id")).select("doc_id", "split").collect().toSet
    val b = Sampling.split(docs.repartition(7), col("doc_id")).select("doc_id", "split").collect().toSet
    assert(a == b)
  }

  test("hash sample is stable under corpus growth") {
    val docs = Tables(spark, sfDir, "documents")
    val small = Sampling.hashSample(docs.filter(col("doc_id") < 250), col("doc_id"), 20)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    val grown = Sampling.hashSample(docs, col("doc_id"), 20)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(small.subsetOf(grown), "already-sampled ids never change membership")
  }

  test("stratified sample keeps exactly ceil(frac*n) rows per stratum") {
    val docs = Tables(spark, sfDir, "documents")
    val perLang = docs.groupBy("lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val got = Sampling.stratified(docs, col("doc_id"), col("lang"), 0.2)
      .groupBy("lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    perLang.foreach { case (lang, n) =>
      assert(got.getOrElse(lang, 0L) == math.ceil(n * 0.2).toLong, s"stratum $lang")
    }
  }
}
