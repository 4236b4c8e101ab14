package graft

import graft.operators.{Bm25, Graph}
import graft.streaming.Events
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Specs for the round-4 analytics additions: BM25 ranked retrieval,
  * PageRank over a pair graph, and hourly anomaly z-scores.
  */
class SearchGraphSpec extends AnyFunSuite {
  import SparkTestSession._

  test("bm25: rare-term doc outranks common-term doc; tf raises score") {
    import spark.implicits._
    // 'rare' appears in one doc, 'common' in all four -> idf(rare) ≫
    // idf(common); doc 4 repeats the query term so tf lifts it over 3
    val docs = Seq(
      (1L, "rare alpha beta gamma delta"),
      (2L, "common alpha beta gamma delta"),
      (3L, "common epsilon zeta eta theta"),
      (4L, "common common common epsilon zeta")
    ).toDF("doc_id", "text")
    val r = Bm25.topK(docs, Seq(1 -> "rare", 2 -> "common"), 4).collect()
      .map(x => (x.getInt(0), x.getInt(1)) -> x.getLong(2)).toMap
    assert(r((1, 1)) == 1L, "only doc 1 contains 'rare'")
    assert(!r.contains((1, 2)), "no second hit for 'rare'")
    assert(r((2, 1)) == 4L, "highest tf wins for 'common'")
  }

  test("bm25: queries SHARING a term each keep their full term set") {
    import spark.implicits._
    // regression: the (query_id, term-fp) relation was once built by
    // zipping a per-(query,term) qid list against a per-DISTINCT-term
    // fp list — with 'data' shared below, query 2 silently lost it
    val docs = Seq(
      (1L, "data data data data"),
      (2L, "quality alpha beta gamma"),
      (3L, "dedup alpha beta gamma")
    ).toDF("doc_id", "text")
    val qs = Seq(1 -> "data quality", 2 -> "data dedup")
    val r = Bm25.topK(docs, qs, 3).collect()
      .map(x => (x.getInt(0), x.getLong(2))).toSet
    // BOTH queries must retrieve doc 1 through their shared 'data'
    // term AND their private-term doc
    assert(r.contains((1, 1L)) && r.contains((1, 2L)), s"query 1 hits: $r")
    assert(r.contains((2, 1L)) && r.contains((2, 3L)), s"query 2 hits: $r")
  }

  test("bm25: scores are identical across partitionings") {
    import spark.implicits._
    val docs = (1L to 40L)
      .map(i => (i, (1L to i).map(j => s"w${j % 7}").mkString(" ")))
      .toDF("doc_id", "text")
    val qs = Seq(1 -> "w1 w3", 2 -> "w5")
    val a = Bm25.topK(docs.repartition(1), qs, 5).collect().toSeq
    val b = Bm25.topK(docs.repartition(13), qs, 5).collect().toSeq
    assert(a == b, "bm25 output must not depend on partitioning")
  }

  test("pagerank: conserves mass, ranks the hub first, deterministic") {
    import spark.implicits._
    val docs = (1L to 6L).map(i => (i, s"d$i")).toDF("doc_id", "text")
    // star: 1 connected to 2,3,4; {5,6} isolated pair-less danglers
    val pairs = Seq((1L, 2L), (1L, 3L), (1L, 4L))
      .toDF("doc_a", "doc_b").withColumn("jaccard", lit(1.0))
    val r = Graph.pageRank(docs, pairs)
    val rows = r.collect().map(x => x.getLong(0) -> x.getDouble(2)).toMap
    val total = rows.values.sum
    assert(math.abs(total - 1.0) < 1e-6, s"mass conserved, got $total")
    assert(rows(1L) > rows(2L), "hub outranks leaves")
    assert(rows(2L) == rows(3L) && rows(3L) == rows(4L), "leaves tie")
    assert(rows(5L) == rows(6L), "danglers tie")
    val r2 = Graph.pageRank(docs.repartition(7), pairs.repartition(3))
      .collect().map(x => x.getLong(0) -> x.getDouble(2)).toMap
    assert(rows == r2, "pagerank must not depend on partitioning")
  }

  test("streaming anomaly retracts rows when later batches de-flag an hour") {
    import spark.implicits._
    // Batches split by hour range. After the early hours alone
    // (0..7 at 10 events, hour 5 at 20) hour 5 IS anomalous; the full
    // day adds hours 8..23 at 20 events, moving the mean so hour 5 is
    // ordinary — the changelog must retract the early emission, and
    // the drained table must equal the batch operator exactly.
    val rows = (0 until 24).flatMap { h =>
      val n = if (h == 5 || h >= 8) 20 else 10
      (0 until n).map(i => (h.toLong * 1000 + i,
        java.sql.Timestamp.valueOf(f"2024-01-01 $h%02d:00:01"), 1L, "click", 1.0, "{}"))
    }
    val events = rows.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    val batch = Events.hourlyAnomaly(events).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getDouble(3))).toSet
    val drained = graft.streaming.StreamingEvents.runAnomaly(spark, events, batches = 3)
      .collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getDouble(3))).toSet
    assert(drained == batch, s"drained=$drained batch=$batch")
    assert(!batch.exists(_._2 == "2024-01-01 05"), "hour 5 must end up de-flagged")
  }

  test("anomaly: an injected hourly spike is flagged, flat hours are not") {
    import spark.implicits._
    // 23 hours at 10 events + one hour at 60 -> only the spike hour
    // has |z| >= 2 (and the symmetric low side stays under threshold)
    val rows = (0 until 24).flatMap { h =>
      val n = if (h == 5) 60 else 10
      (0 until n).map(i => (h.toLong * 1000 + i,
        java.sql.Timestamp.valueOf(f"2024-01-01 $h%02d:00:01"), 1L, "click", 1.0, "{}"))
    }
    val events = rows.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    val flagged = Events.hourlyAnomaly(events).collect()
    assert(flagged.length == 1, s"exactly the spike hour: ${flagged.mkString(",")}")
    assert(flagged.head.getString(1) == "2024-01-01 05")
    assert(flagged.head.getDouble(3) > 2.0)
  }
}
