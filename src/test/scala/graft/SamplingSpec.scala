package graft

import graft.operators.Sampling
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class SamplingSpec extends AnyFunSuite {
  import SparkTestSession._

  test("budget select: bucketed two-phase equals the naive global running total") {
    import spark.implicits._
    import org.apache.spark.sql.expressions.Window
    // ties in quality + a doc that straddles the budget boundary
    val df = Seq(
      (1L, 0.9, 50L), (2L, 0.9, 60L), (3L, 0.8, 40L),
      (4L, 0.8, 100L), (5L, 0.7, 30L), (6L, 0.6, 10L)
    ).toDF("doc_id", "q", "n")
    val got = Sampling.budgetSelect(df, col("doc_id"), col("q"), col("n"), budget = 200L)
      .collect().map(r => (r.getLong(0), r.getLong(3))).toMap
    // naive: 50,110,150,250(stop),... -> docs 1,2,3 kept; 4 straddles
    assert(got == Map(1L -> 50L, 2L -> 110L, 3L -> 150L), s"got $got")
    // equivalence with a single global window on the corpus table
    val corpus = Tables(spark, sfDir, "documents")
      .select(col("doc_id"), (col("doc_id") % 17 / lit(16.0)).as("q"),
        size(split(col("text"), " ")).cast("long").as("n"))
    val naive = corpus
      .withColumn("cum", sum(col("n")).over(
        Window.orderBy(col("q").desc, col("doc_id"))))
      .filter(col("cum") <= 5000)
      .select(col("doc_id"), col("cum")).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val fast = Sampling.budgetSelect(corpus, col("doc_id"), col("q"), col("n"), 5000L)
      .select(col("doc_id"), col("cum_tokens")).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(fast == naive)
  }

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

  test("pack: bins fill to capacity, offsets consistent, assignment pure") {
    val docs = Tables(spark, sfDir, "documents")
    val tokens = size(split(col("text"), "\\s+"))
    val packed = Sampling.pack(docs, col("doc_id"), tokens, capacity = 512, buckets = 8)
      .select(col("doc_id"), col("pack_bucket"), col("pack_bin"), col("pack_offset"), tokens.as("t"))
      .collect()
    assert(packed.map(_.getLong(1)).distinct.length == 8, "all 8 streams used")
    // per stream: offsets are the running token count mod capacity and
    // bins never decrease in doc order
    packed.groupBy(_.getLong(1)).foreach { case (_, rows) =>
      val inOrder = rows.sortBy(_.getLong(0))
      var cum = 0L
      inOrder.foreach { r =>
        assert(r.getLong(2) == cum / 512, s"bin of doc ${r.getLong(0)}")
        assert(r.getLong(3) == cum % 512, s"offset of doc ${r.getLong(0)}")
        cum += r.getInt(4)
      }
    }
    // repartitioning must not change any assignment
    val again = Sampling.pack(docs.repartition(13), col("doc_id"), tokens)
      .select("doc_id", "pack_bucket", "pack_bin", "pack_offset").collect().toSet
    assert(again == packed.map(r =>
      org.apache.spark.sql.Row(r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet)
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
