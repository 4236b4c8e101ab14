package graft

import graft.queries.{EngineOps, LlmOps, RagOps, SqlSurfaceC}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class RagOpsSpec extends AnyFunSuite {
  import SparkTestSession._

  test("chunk_overlap: full coverage, consecutive ids, exact overlap between neighbors") {
    val chunks = RagOps.chunk_overlap(spark, sfDir)
      .select(col("doc_id"), col("chunk_id"), col("start_word"), col("n_words"),
        col("chunk_text")).collect()
      .groupBy(_.getLong(0)).view.mapValues(_.sortBy(_.getInt(1))).toMap
    val docs = Tables(spark, sfDir, "documents")
      .select(col("doc_id"), split(rtrim(col("text")), " ").as("ws")).collect()
      .map(r => r.getLong(0) -> r.getSeq[String](1)).toMap
    assert(chunks.keySet == docs.keySet)
    chunks.foreach { case (id, cs) =>
      val words = docs(id)
      // ids consecutive from 0; first start is word 1
      assert(cs.map(_.getInt(1)).toSeq == cs.indices.toSeq)
      assert(cs.head.getLong(2) == 1L)
      // the last chunk reaches the end of the doc: full coverage
      val lastEnd = cs.last.getLong(2) + cs.last.getLong(3) - 1
      assert(lastEnd == words.length, s"doc $id covered to $lastEnd of ${words.length}")
      // every chunk is exactly the words it claims
      cs.foreach { c =>
        val s = c.getLong(2).toInt
        val expect = words.slice(s - 1, s - 1 + c.getLong(3).toInt).mkString(" ")
        assert(c.getString(4) == expect, s"doc $id chunk ${c.getInt(1)}")
      }
      // no chunk is a suffix of its predecessor (tail rule)
      cs.sliding(2).filter(_.length == 2).foreach { p =>
        assert(p(1).getLong(2) + p(1).getLong(3) > p(0).getLong(2) + p(0).getLong(3))
      }
    }
  }

  test("sim_mmr_rerank: first pick is the relevance argmax; output matches the fixture") {
    val got = RagOps.sim_mmr_rerank(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getDouble(3)))
    val bf = LlmOps.sim_topk_bruteforce(spark, sfDir)
      .filter(col("rank") === 1).collect()
      .map(r => r.getLong(0) -> r.getLong(2)).toMap
    // MMR rank 1 has an empty selected set -> pure relevance argmax
    got.filter(_._2 == 1).foreach { case (q, _, n, _) =>
      assert(bf(q) == n, s"query $q rank-1 $n != brute-force ${bf(q)}")
    }
    // scores non-increasing per query (greedy argmax invariant holds
    // because the max-sim penalty only grows as the set fills)
    got.groupBy(_._1).foreach { case (q, rs) =>
      val s = rs.sortBy(_._2).map(_._4)
      assert(s.zip(s.tail).forall { case (a, b) => a >= b }, s"query $q scores $s")
    }
    val fixture = spark.read
      .parquet("expected/sf0.001/sim_mmr_rerank.parquet").collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getDouble(3)))
    assert(got.toSet == fixture.toSet)
  }

  test("sim_topk_stream: drained stream equals batch brute force exactly") {
    val streamed = RagOps.sim_topk_stream(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getDouble(3))).toSet
    val batch = LlmOps.sim_topk_bruteforce(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getDouble(3))).toSet
    assert(streamed == batch)
  }

  test("stats_psi_drift: non-negative, finite, group counts sum to the corpus") {
    val rows = LlmOps.stats_psi_drift(spark, sfDir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val psi = r.getDouble(3)
      assert(psi >= 0.0 && !psi.isNaN && !psi.isInfinite, s"${r.getString(0)} psi=$psi")
    }
    val total = rows.map(_.getLong(1)).sum
    assert(total == Tables(spark, sfDir, "documents").count())
  }

  test("q48_ignore_nulls: purchases see themselves; purchase-free users stay null") {
    val rows = SqlSurfaceC.q48_ignore_nulls(spark, sfDir).collect()
    rows.filter(_.getString(2) == "purchase").foreach { r =>
      assert(!r.isNullAt(3), s"purchase event ${r.getLong(1)} has null LOCF")
    }
    val purchasers = rows.filter(_.getString(2) == "purchase").map(_.getLong(0)).toSet
    rows.filterNot(r => purchasers(r.getLong(0))).foreach { r =>
      assert(r.isNullAt(3) && r.isNullAt(4),
        s"user ${r.getLong(0)} has no purchases but a non-null fill")
    }
    // prev is strictly-before: on the FIRST purchase of a user it is null
    val firstPurchase = rows.filter(_.getString(2) == "purchase")
      .groupBy(_.getLong(0)).view.mapValues(_.map(_.getLong(1)).min).toMap
    rows.filter(r => r.getString(2) == "purchase" &&
        firstPurchase(r.getLong(0)) == r.getLong(1))
      .foreach { r =>
        // ordered by (ts, event_id): the min event_id per user is not
        // guaranteed first in time, so only assert when it is unique
        assert(r.isNullAt(4) || rows.count(x =>
          x.getLong(0) == r.getLong(0) && x.getString(2) == "purchase") > 1)
      }
  }

  test("data_temperature: flattens the language mix, preserves expected corpus size") {
    val d = Tables(spark, sfDir, "documents")
    val langN = d.groupBy(col("lang")).count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val rates = LlmOps.data_temperature(spark, sfDir)
      .select(col("lang"), col("rate")).distinct().collect()
      .map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(rates.keySet == langN.keySet)
    // monotone: a more common language never gets a higher rate
    val byN = langN.toSeq.sortBy(_._2)
    byN.sliding(2).filter(_.length == 2).foreach { p =>
      if (p(0)._2 < p(1)._2)
        assert(rates(p(0)._1) >= rates(p(1)._1),
          s"${p(0)._1} (n=${p(0)._2}) rate < ${p(1)._1} (n=${p(1)._2})")
    }
    // expected total = sum(rate_l * n_l) stays the corpus size
    val expected = langN.map { case (l, n) => rates(l) * n }.sum
    val total = langN.values.sum.toDouble
    assert(math.abs(expected - total) / total < 1e-4, s"$expected vs $total")
  }

  test("text_heavy_hitters_stream: drained sketch equals the batch aggregate") {
    val streamed = LlmOps.text_heavy_hitters_stream(spark, sfDir).collect()
      .map(r => (r.getString(0), r.getLong(1))).toSet
    val batch = LlmOps.text_heavy_hitters(spark, sfDir).collect()
      .map(r => (r.getString(0), r.getLong(1))).toSet
    assert(streamed == batch)
  }

  test("dedup_exact_stream: a late lower id re-seats the keeper via retraction") {
    import org.apache.spark.sql.streaming.TestGroupState
    import graft.streaming.StreamingSketch.{ExactDupState, exactDedupUpdate}
    val s1 = TestGroupState.create[ExactDupState](
      org.apache.spark.api.java.Optional.empty[ExactDupState](),
      org.apache.spark.sql.streaming.GroupStateTimeout.NoTimeout(),
      0L, org.apache.spark.api.java.Optional.empty[Long](), hasTimedOut = false)
    val out1 = exactDedupUpdate("h", Iterator(("h", 7L)), s1).toSeq
    assert(out1 == Seq(("h", 7L, 1L, 1L)))
    // late arrival of doc 3 (same text): retract (7,1), assert (3,2)
    val out2 = exactDedupUpdate("h", Iterator(("h", 3L)), s1).toSeq
    assert(out2 == Seq(("h", 7L, 1L, -1L), ("h", 3L, 2L, 1L)))
    // drained end-to-end equals batch
    val streamed = LlmOps.dedup_exact_stream(spark, sfDir).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    val batch = LlmOps.dedup_exact(spark, sfDir).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    assert(streamed == batch)
  }

  test("fmt_schema_evolution: merged footer adds the column, v1 rows read null") {
    val out = EngineOps.fmt_schema_evolution(spark, sfDir)
    assert(out.columns.toSeq == Seq("lang", "n", "sum_chars"))
    val key = sfDir.replaceAll("[^A-Za-z0-9]", "_")
    val base = s"${sys.props("java.io.tmpdir")}/graft-scratch/$key/schema_evo"
    val v1 = spark.read.parquet(s"$base/v1")
    assert(!v1.columns.contains("lang"))
    val merged = spark.read.option("mergeSchema", "true")
      .parquet(s"$base/v1", s"$base/v2")
    assert(merged.columns.contains("lang"))
    assert(merged.filter(col("lang").isNull).count() == v1.count())
  }

  test("pipeline_rag_index: retrieved chunks contain query terms; fixture matches") {
    val rows = RagOps.pipeline_rag_index(spark, sfDir).collect()
      .map(r => (r.getInt(0), r.getInt(1), r.getLong(2), r.getInt(3), r.getDouble(4)))
    assert(rows.map(_._1).toSet == Set(1, 2, 3, 4))
    assert(rows.groupBy(_._1).forall(_._2.length == 5))
    val fixture = spark.read
      .parquet("expected/sf0.001/pipeline_rag_index.parquet").collect()
      .map(r => (r.getInt(0), r.getInt(1), r.getLong(2), r.getInt(3), r.getDouble(4)))
    assert(rows.toSet == fixture.toSet)
    // relevance sanity: the top chunk for query 1 shares a term with it
    val chunkText = RagOps.chunk_overlap(spark, sfDir)
      .collect().map(r => (r.getLong(0), r.getInt(1)) -> r.getString(4)).toMap
    val q1terms = Set("spark", "join", "agg")
    val top1 = rows.filter(r => r._1 == 1 && r._2 == 1).head
    val words = chunkText((top1._3, top1._4)).split(" ").toSet
    assert(q1terms.exists(words), s"top chunk for q1 shares no term: $words")
  }

  test("search_rrf: fused scores bounded by the two-arm maximum, 10 per query") {
    val rows = LlmOps.search_rrf(spark, sfDir).collect()
      .map(r => (r.getInt(0), r.getInt(1), r.getLong(2), r.getDouble(3)))
    val byQ = rows.groupBy(_._1)
    assert(byQ.keySet == Set(1, 2, 3, 4))
    byQ.foreach { case (q, rs) =>
      assert(rs.length == 10, s"query $q returned ${rs.length}")
      val scores = rs.sortBy(_._2).map(_._4)
      // max possible = rank 1 in BOTH arms; min > 0 (must be in >= 1 arm)
      assert(scores.head <= 2.0 / 61 + 1e-9 && scores.last > 0.0)
      assert(scores.zip(scores.tail).forall { case (a, b) => a >= b })
    }
    // a doc at rank 1 in BM25 that also appears in the lexical pool
    // must beat any single-arm doc: spot-check fusion actually fuses
    val bm1 = LlmOps.search_bm25(spark, sfDir).filter(col("rank") === 1)
      .collect().map(r => r.getInt(0) -> r.getLong(2)).toMap
    byQ.foreach { case (q, rs) =>
      val top = rs.minBy(_._2)
      assert(top._4 >= 1.0 / 61, s"query $q top fused score ${top._4}")
      assert(bm1.contains(q))
    }
  }

  test("evt_paths_stream: late event retracts the trigram it splits; drained equals batch") {
    import org.apache.spark.sql.streaming.TestGroupState
    import graft.streaming.StreamingEvents.{PathState, pathsUpdate}
    val s = TestGroupState.create[PathState](
      org.apache.spark.api.java.Optional.empty[PathState](),
      org.apache.spark.sql.streaming.GroupStateTimeout.NoTimeout(),
      0L, org.apache.spark.api.java.Optional.empty[Long](), hasTimedOut = false)
    // events at t=1,2,3 -> one trigram a>b>c
    val out1 = pathsUpdate()(1L, Iterator((1L, 1L, 1L, "a"), (1L, 2L, 2L, "b"),
      (1L, 3L, 3L, "c")), s).toMap
    assert(out1 == Map("a>b>c" -> 1L))
    // late event at t=2.5 splits it: retract a>b>c, assert a>b>x, b>x>c
    val out2 = pathsUpdate()(1L, Iterator((1L, 2L, 10L, "x")), s).toMap
    assert(out2 == Map("a>b>c" -> -1L, "a>b>x" -> 1L, "b>x>c" -> 1L))
    val streamed = graft.queries.EventsOps.evt_paths_stream(spark, sfDir).collect()
      .map(r => (r.getString(0), r.getLong(1))).toSet
    val batch = graft.queries.EventsOps.evt_paths(spark, sfDir).collect()
      .map(r => (r.getString(0), r.getLong(1))).toSet
    assert(streamed == batch)
  }

  test("q49_try_safety: each TRY site nulls exactly its malformed rows") {
    val rows = SqlSurfaceC.q49_try_safety(spark, sfDir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val key = r.getLong(0); val line = r.getInt(1)
      assert(r.isNullAt(2) == (key % 3 == 0), s"safe_key at $key")
      assert(r.isNullAt(3) == (key % 5 == 0), s"safe_ratio at $key")
      assert(r.isNullAt(4) == (line > 2), s"safe_elem at $key/$line")
    }
  }

  test("opt_dynamic_overwrite: only the re-ingested partition changes") {
    val out = EngineOps.opt_dynamic_overwrite(spark, sfDir).collect()
      .map(r => r.getDate(0).toString -> (r.getLong(1), r.getDouble(2))).toMap
    val src = Tables(spark, sfDir, "events")
      .groupBy(to_date(col("ts")).as("d"))
      .agg(count(lit(1)).as("n"), sum(col("value")).as("s")).collect()
      .map(r => r.getDate(0).toString -> (r.getLong(1), r.getDouble(2))).toMap
    assert(out.keySet == src.keySet)
    out.foreach { case (d, (n, s)) =>
      val (n0, s0) = src(d)
      assert(n == n0, s"partition $d row count changed")
      val expect = if (d == "2024-01-05") s0 * 2 else s0
      assert(math.abs(s - expect) < 1e-6 * math.max(1.0, math.abs(expect)),
        s"partition $d sum $s != $expect")
    }
  }

  test("stats_profile: counts agree with direct queries") {
    val prof = LlmOps.stats_profile(spark, sfDir).collect()
      .map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getString(4), r.getString(5))).toMap
    assert(prof.keySet == Set("doc_id", "lang", "source", "n_chars"))
    val d = Tables(spark, sfDir, "documents")
    val n = d.count()
    prof.foreach { case (c, (rows, nulls, distinct, mn, mx)) =>
      assert(rows == n && nulls == 0L)
      assert(distinct == d.select(col(c)).distinct().count(), s"$c distinct")
      assert(mn == d.agg(min(col(c)).cast("string")).head.getString(0), s"$c min")
      assert(mx == d.agg(max(col(c)).cast("string")).head.getString(0), s"$c max")
    }
  }

  test("dedup_lsh_tuning: S-curve is monotone and the corpus pair mass sits above 0.8") {
    val rows = LlmOps.dedup_lsh_tuning(spark, sfDir).collect()
      .map(r => (r.getDouble(0), r.getDouble(1), r.getDouble(2), r.getLong(3)))
    assert(rows.length == 10)
    val det = rows.sortBy(_._1).map(_._3)
    assert(det.zip(det.tail).forall { case (a, b) => a <= b })
    // the planted near-dup families are at J >= 0.8 — where the 16x4
    // banding's detection probability is ~1 (the recall-1 argument)
    rows.filter(_._4 > 0).foreach { case (j, _, d, _) =>
      assert(j >= 0.8 && d > 0.999, s"pairs at j=$j with detection $d")
    }
    assert(rows.filter(_._4 > 0).map(_._4).sum > 0)
  }

  test("opt_compaction: 64 fragments compact to a handful of id-clustered files") {
    val out = EngineOps.opt_compaction(spark, sfDir)
    assert(out.count() > 0)
    def files(leaf: String) = {
      val key = sfDir.replaceAll("[^A-Za-z0-9]", "_")
      val d = new java.io.File(
        s"${sys.props("java.io.tmpdir")}/graft-scratch/$key/$leaf")
      Option(d.listFiles()).getOrElse(Array.empty)
        .filter(f => f.getName.endsWith(".parquet")).sortBy(_.getName)
    }
    val frag = files("docs_fragmented")
    val compact = files("docs_compacted")
    assert(frag.length > 16, s"fragmented copy has ${frag.length} files")
    assert(compact.length <= 4, s"compacted copy has ${compact.length} files")
    // range-partitioned rewrite: per-file id ranges must not overlap
    val ranges = compact.map { f =>
      val ids = spark.read.parquet(f.getAbsolutePath)
        .agg(min(col("doc_id")), max(col("doc_id"))).head()
      (ids.getLong(0), ids.getLong(1))
    }.sortBy(_._1)
    ranges.sliding(2).foreach {
      case Array((_, hi), (lo2, _)) => assert(hi < lo2, s"overlapping file ranges")
      case _ =>
    }
  }
}
