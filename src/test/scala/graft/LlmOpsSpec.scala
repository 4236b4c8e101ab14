package graft

import graft.operators.{Dedup, Similarity}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class LlmOpsSpec extends AnyFunSuite {
  import SparkTestSession._

  test("minhash-LSH and exact ngram-jaccard agree on near-dup pairs") {
    val lsh = queries.LlmOps.dedup_minhash_lsh(spark, sfDir)
      .select("doc_a", "doc_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val exact = queries.LlmOps.dedup_ngram_jaccard(spark, sfDir)
      .filter(col("jaccard") >= 0.8)
      .select("doc_a", "doc_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(exact.nonEmpty, "test corpus should contain planted near-dups")
    // LSH at 16x4 bands has >99.99% recall at j>=0.8; require full recall here
    assert(exact.subsetOf(lsh), s"LSH missed pairs: ${exact -- lsh}")
  }

  test("minhash maxBucket cap drops only degenerate buckets") {
    import spark.implicits._
    // 60 identical boilerplate docs (one giant bucket) + one real
    // near-dup pair of long distinct docs
    val words = (1 to 40).map(i => s"tok$i")
    val a = words.mkString(" ")
    val b = (words.dropRight(1) :+ "tokX").mkString(" ")
    val docs = ((0L until 60L).map(i => (i, "same boiler plate text here")) ++
      Seq((100L, a), (101L, b))).toDF("doc_id", "text")
    val capped = Dedup.minhashLsh(docs, maxBucket = Some(10))
      .select("doc_a", "doc_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // the boilerplate family (60^2/2 pairs) is excluded; the real pair survives
    assert(capped == Set((100L, 101L)), s"capped: $capped")
    val uncapped = Dedup.minhashLsh(docs)
      .select("doc_a", "doc_b").count()
    assert(uncapped == 60L * 59 / 2 + 1, "uncapped must keep the full candidate set")
  }

  test("keep-best resolve: survivor has the family's max quality, families intact") {
    val fams = queries.LlmOps.dedup_families(spark, sfDir).collect()
      .map(r => r.getLong(0) -> r.getLong(1))
    val best = queries.LlmOps.dedup_keep_best(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    assert(best.nonEmpty)
    // one survivor per family, member counts match the family map
    val famSizes = fams.groupBy(_._2).view.mapValues(_.length).toMap
    assert(best.map(_._1).toSet == famSizes.keySet)
    best.foreach { case (fid, n, kept, _) =>
      assert(n == famSizes(fid), s"family $fid size")
      assert(fams.contains((kept, fid)), s"survivor $kept not in family $fid")
    }
    // the survivor's quality is the max over the family
    val q = operators.TextAnalysis.withQuality(
      Tables(spark, sfDir, "documents"), col("text"))
      .select(col("doc_id"), col("quality_score")).collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    best.foreach { case (fid, _, kept, bq) =>
      val members = fams.filter(_._2 == fid).map(_._1)
      assert(bq == members.map(q).max, s"family $fid best quality")
      assert(q(kept) == bq, s"family $fid survivor quality")
    }
  }

  test("cross-corpus dedup: cross-side only, consistent with whole-corpus pairs") {
    val cross = queries.LlmOps.dedup_cross_corpus(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(cross.nonEmpty, "the 10% split should hit some near-dup families")
    val bucket = (id: Long) => {
      val md5 = java.security.MessageDigest.getInstance("MD5")
        .digest(id.toString.getBytes("UTF-8")).map("%02x".format(_)).mkString
      java.lang.Long.parseLong(md5.take(8), 16) % 100
    }
    cross.foreach { case (c, n) =>
      assert(bucket(c) < 90, s"corpus doc $c on wrong side")
      assert(bucket(n) >= 90, s"new doc $n on wrong side")
    }
    // every cross pair is a whole-corpus near-dup pair (either order)
    val all = queries.LlmOps.dedup_minhash_lsh(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    cross.foreach { case (c, n) =>
      assert(all.contains((math.min(c, n), math.max(c, n))), s"pair ($c,$n) not in corpus pairs")
    }
  }

  test("prefix-filtered ngram-jaccard has recall 1 on borderline pairs") {
    import spark.implicits._
    // families at J barely above 0.7 — exactly where probabilistic
    // blocking (per-pair recall ~j) drops pairs; the prefix-filter
    // theorem guarantees these are all found
    val mk = (tokens: Seq[String]) => tokens.mkString(" ")
    val base = (1 to 40).map(i => s"w$i")
    val docs = (0 until 30).flatMap { f =>
      val fam = base.map(t => s"$t-f$f")
      Seq((f * 2L, mk(fam)),
        (f * 2L + 1L, mk(fam.drop(6)))) // 38 vs 32 shingles, J = 32/38 ~ 0.84... drop more
    }.toDF("doc_id", "text")
    val got = Dedup.ngramJaccard(docs, k = 3, threshold = 0.7)
      .select("doc_a", "doc_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // brute-force ground truth on the tiny corpus
    val sets = docs.collect().map { r =>
      val w = r.getString(1).split(" ")
      r.getLong(0) -> w.sliding(3).map(_.mkString(" ")).toSet
    }.toMap
    val want = (for {
      a <- sets.keys; b <- sets.keys if a < b
      j = sets(a).intersect(sets(b)).size.toDouble / sets(a).union(sets(b)).size
      if j >= 0.7
    } yield (a, b)).toSet
    assert(want.nonEmpty, "fixture must contain borderline pairs")
    assert(got == want, s"missed=${want -- got} extra=${got -- want}")
  }

  test("exact dedup partitions the corpus") {
    val d = queries.LlmOps.dedup_exact(spark, sfDir)
    val total = Tables(spark, sfDir, "documents").count()
    assert(d.agg(sum("n_dupes")).head.getLong(0) == total)
  }

  test("identical texts collapse: simhash hamming 0, same fingerprint") {
    import spark.implicits._
    graft.functions.GraftFunctions.register(spark)
    val docs = Seq((1L, "alpha beta gamma delta"), (2L, "alpha beta gamma delta"),
      (3L, "totally different words here")).toDF("doc_id", "text")
    val pairs = Dedup.simhash(docs, maxHamming = 0).collect()
    assert(pairs.length == 1 && pairs.head.getLong(0) == 1L && pairs.head.getLong(1) == 2L)
    val fp = operators.TextAnalysis.withFingerprint(docs, col("text"))
      .select("doc_id", "fp_exact").collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(fp(1L) == fp(2L) && fp(1L) != fp(3L))
  }

  test("combination banding emits exactly the brute-force hamming pairs") {
    // Real corpus signatures (hot correlated buckets included): the
    // banded pair set must equal the all-pairs hamming result — recall
    // by pigeonhole over the block combinations, uniqueness by the
    // lowest-flip-free-combination rule — at every table layout the
    // maxHamming range selects (b=h+3 combos through the h>5 b=h+1
    // single-block fallback).
    val base = Tables(spark, sfDir, "documents")
      .select(col("doc_id"), graft.functions.GraftFunctions.simhash64(col("text")).as("_sig"))
    // clone-light fixture sigs (doc-level banding path) AND a
    // clone-dense union (every sig twice → distinct-signature
    // collapse path) — the adaptive branch must emit the brute-force
    // pair set on both
    val dense = base.unionByName(
      base.select((col("doc_id") + lit(500000L)).as("doc_id"), col("_sig")))
    for (sigRel <- Seq(base, dense)) {
      val sigs = sigRel.collect().map(r => r.getLong(0) -> r.getLong(1))
      for (mh <- Seq(0, 2, 3, 5, 7)) {
        val want = (for {
          (ida, sa) <- sigs; (idb, sb) <- sigs if ida < idb
          h = java.lang.Long.bitCount(sa ^ sb) if h <= mh
        } yield (ida, idb, h)).toSet
        val got = Dedup.hammingBandPairs(sigRel, mh).collect()
          .map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
        assert(got == want,
          s"maxHamming=$mh missed=${(want -- got).take(5)} extra=${(got -- want).take(5)}")
        if (mh == 3) assert(want.nonEmpty, "fixture must contain near-dup pairs")
      }
    }
  }

  test("clone-collapsed set-similarity ops equal doc-level semantics on a clone-dense corpus") {
    // Clone-dense corpus: fixture docs plus exact clones at shifted
    // ids — every set group has 3 members (dense enough that the ⅛
    // density probe reliably picks the collapse plan), so the intra
    // arm, the rep machinery and the member expansion all carry
    // weight.
    val base = Tables(spark, sfDir, "documents")
      .filter(col("doc_id") < 150).select(col("doc_id"), col("text"))
    val corpus = base
      .unionByName(base.select((col("doc_id") + lit(100000L)).as("doc_id"), col("text")))
      .unionByName(base.select((col("doc_id") + lit(200000L)).as("doc_id"), col("text")))
    def r4(x: Double): Double =
      BigDecimal(x).setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
    val sets = corpus.select(col("doc_id"),
        graft.functions.GraftFunctions.shingles(col("text"), 3).as("s"))
      .collect().map(r => r.getLong(0) -> r.getSeq[String](1).toSet)

    // exact ngram jaccard: brute-force all-pairs ground truth
    val wantJ = (for {
      (a, sa) <- sets; (b, sb) <- sets if a < b
      inter = sa.intersect(sb).size
      j = inter.toDouble / (sa.size + sb.size - inter) if j >= 0.7
    } yield (a, b, r4(j))).toSet
    val gotJ = Dedup.ngramJaccard(corpus).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(wantJ.exists(_._3 == 1.0) && wantJ.exists(_._3 < 1.0),
      "fixture must exercise both the intra arm and the expansion")
    assert(gotJ == wantJ,
      s"ngram missed=${(wantJ -- gotJ).take(5)} extra=${(gotJ -- wantJ).take(5)}")

    // directional containment: brute-force ordered-pairs ground truth
    val wantC = (for {
      (a, sa) <- sets; (b, sb) <- sets if a != b
      c = sa.intersect(sb).size.toDouble / sa.size if c >= 0.9
    } yield (a, b, r4(c))).toSet
    val gotC = Dedup.containment(corpus).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(gotC == wantC,
      s"containment missed=${(wantC -- gotC).take(5)} extra=${(gotC -- wantC).take(5)}")

    // the bloom arm of the prefix-fp semi-filter (forced by a zero
    // docs-hint threshold) must emit the identical pair set — false
    // positives only re-admit rows the equi-join discards
    val gotCBloom = Dedup.containment(corpus, bloomSemiFilterDocs = 0L)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(gotCBloom == wantC,
      s"bloom-arm containment missed=${(wantC -- gotCBloom).take(5)} " +
        s"extra=${(gotCBloom -- wantC).take(5)}")

    // minhash-LSH: must equal the DOC-level banding formulation
    // (probabilistic recall, so the reference is the pre-collapse
    // shape run literally, not brute force)
    val bb = Dedup.bandBuckets(corpus, 3, 16, 4)
    val cands = bb.select(col("band"), col("bucket"), col("doc_id").as("doc_a"))
      .join(bb.select(col("band"), col("bucket"), col("doc_id").as("doc_b")),
        Seq("band", "bucket"))
      .filter(col("doc_a") < col("doc_b"))
      .select(col("doc_a"), col("doc_b")).distinct()
    val wantM = Dedup.verifyJaccard(cands, corpus, 3)
      .filter(col("jaccard") >= 0.8)
      .select(col("doc_a"), col("doc_b"), round(col("jaccard"), 4).as("jaccard"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    val gotM = Dedup.minhashLsh(corpus).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(gotM == wantM,
      s"minhash missed=${(wantM -- gotM).take(5)} extra=${(gotM -- wantM).take(5)}")

    // The density probe must actually pick the collapse plan here and
    // the doc-level plan on the clone-light fixture — the equalities
    // above hold on either path, so the plan shape (collapse = intra ∪
    // expanded-cross Union root) is the observable.
    import org.apache.spark.sql.catalyst.plans.logical.Union
    assert(Dedup.minhashLsh(corpus).queryExecution.analyzed
      .collectFirst { case u: Union => u }.isDefined,
      "clone-dense corpus must take the collapse plan")
    assert(Dedup.minhashLsh(base).queryExecution.analyzed
      .collectFirst { case u: Union => u }.isEmpty,
      "clone-light fixture must keep the doc-level plan")
  }

  test("bounded-heap top-k aggregate matches the window row_number formulation exactly") {
    val emb = Tables(spark, sfDir, "embeddings")
    val q = emb.filter(col("vec_id") < 16)
    val scored = emb.select(col("vec_id").as("neighbor_id"), col("embedding").as("_ce"))
      .join(org.apache.spark.sql.functions.broadcast(
        q.select(col("vec_id").as("query_id"), col("embedding").as("_qe"))),
        col("query_id") =!= col("neighbor_id"))
      .withColumn("cosine", Similarity.dot(col("_qe"), col("_ce")) /
        (Similarity.l2norm(col("_qe")) * Similarity.l2norm(col("_ce"))))
    val viaHeap = Similarity.heapTopK(scored, 7).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getDouble(3))).toSet
    val viaWindow = Similarity.windowTopK(scored, 7).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getDouble(3))).toSet
    assert(viaHeap == viaWindow)
    assert(viaHeap.nonEmpty)
  }

  test("brute-force top-k: ranks contiguous, cosine descending and bounded") {
    val rows = queries.LlmOps.sim_topk_bruteforce(spark, sfDir).collect()
    val byQuery = rows.groupBy(_.getLong(0))
    byQuery.foreach { case (q, rs) =>
      val ranked = rs.sortBy(_.getInt(1))
      assert(ranked.map(_.getInt(1)).toSeq == (1 to ranked.length))
      val cosines = ranked.map(_.getDouble(3))
      assert(cosines.forall(c => c >= -1.0001 && c <= 1.0001), s"query $q cosine out of range")
      assert(cosines.zip(cosines.tail).forall { case (a, b) => a >= b }, s"query $q not descending")
    }
  }

  test("LSH top-k cosines match brute-force for shared (query, neighbor) pairs") {
    val bf = queries.LlmOps.sim_topk_bruteforce(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(2)) -> r.getDouble(3)).toMap
    val lsh = queries.LlmOps.sim_topk_lsh(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(2)) -> r.getDouble(3)).toMap
    val shared = bf.keySet intersect lsh.keySet
    shared.foreach(k => assert(math.abs(bf(k) - lsh(k)) < 1e-9))
  }

  test("SpaceSaving sketch: exact when capacity >= vocabulary, overcounts never undercount") {
    import spark.implicits._
    graft.functions.GraftFunctions.register(spark)
    val words = (Seq.fill(50)("hot") ++ Seq.fill(20)("warm") ++
      (1 to 30).map(i => s"cold_$i")).toDF("word").repartition(7)
    // tiny capacity: the heavy hitter must survive and never be undercounted
    val top = words.agg(graft.functions.GraftFunctions.spaceSavingTopK(col("word"), 3, 4).as("t"))
      .select(explode(col("t")).as("s")).select(col("s.item"), col("s.cnt")).collect()
    assert(top.head.getString(0) == "hot")
    assert(top.head.getLong(1) >= 50, "SpaceSaving must not undercount a heavy hitter")
  }

  test("component resolution keeps exactly one doc per near-dup family") {
    val total = Tables(spark, sfDir, "documents").count()
    val pairs = queries.LlmOps.dedup_minhash_lsh(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val kept = queries.LlmOps.dedup_resolve(spark, sfDir).collect()
      .map(_.getLong(0)).toSet
    assert(pairs.nonEmpty)
    assert(kept.size < total)
    pairs.foreach { case (a, b) =>
      assert(!(kept(a) && kept(b)), s"pair ($a,$b) must not both survive")
      assert(kept(a) || kept(b) || !kept(math.max(a, b)), s"family of ($a,$b) lost all members")
    }
    // representatives are family minima: the smaller of each pair is kept
    // unless an even smaller doc shares its component
    assert(pairs.count { case (a, b) => kept(math.min(a, b)) } >= pairs.length / 2)
  }

  test("component resolution converges on a 100-node chain (path halving)") {
    import spark.implicits._
    val docs = (0L until 120L).toDF("doc_id")
    // one 100-node chain plus an isolated pair — diameter 99 would need
    // 99 one-hop rounds; path halving must resolve it within the budget
    val pairs = ((0L until 99L).map(i => (i, i + 1)) :+ (110L, 111L)).toDF("doc_a", "doc_b")
    // force the DISTRIBUTED loop (threshold 0) — the adaptive local
    // union-find would otherwise absorb this graph
    val distributed = operators.Dedup.propagateLabels(pairs, localThreshold = 0L)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val local = operators.Dedup.propagateLabels(pairs, localThreshold = Long.MaxValue)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(distributed == local, "local union-find must equal the join loop")
    val kept = operators.Dedup.resolveComponents(docs, pairs)
      .collect().map(_.getLong(0)).toSet
    val all = (0L until 120L).toSet
    val chainMembers = (1L to 99L).toSet + 111L
    assert(kept == all -- chainMembers, "chain must collapse to doc 0, pair to doc 110")
  }

  test("dedup_weights: every doc weighted, families sum to 1, singletons weigh 1") {
    val rows = queries.LlmOps.dedup_weights(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    val nDocs = Tables(spark, sfDir, "documents").count()
    assert(rows.length == nDocs, "reweighting must keep every doc")
    rows.foreach { case (id, _, fs, w) =>
      assert(math.abs(w - 1.0 / fs) < 1e-12, s"doc $id weight $w != 1/$fs")
    }
    // per family the weights sum to 1 -> total weight = number of families
    val famSums = rows.groupBy(_._2).view.mapValues(_.map(_._4).sum)
    famSums.foreach { case (f, s) =>
      assert(math.abs(s - 1.0) < 1e-9, s"family $f weights sum to $s")
    }
    assert(rows.exists(_._3 > 1), "corpus should contain real families")
    assert(rows.exists(r => r._3 == 1 && r._4 == 1.0), "singletons weigh 1.0")
  }

  test("recall report: every ANN variant returns sane recall in (0, 1]") {
    val r = queries.LlmOps.sim_recall_report(spark, sfDir).collect()
      .map(row => row.getString(0) -> row.getDouble(1)).toMap
    assert(r.keySet ==
      Set("lsh", "ivf", "ivf_kmeans", "pq", "ivfpq", "ivfpq_nc", "sq8", "opq"))
    r.values.foreach(v => assert(v > 0.0 && v <= 1.0))
    // Per-arm recall FLOORS on the fixture corpus (sf0.001: 640
    // vectors, 64 queries, fully deterministic arms — measured values
    // are exact constants; floors sit just below so a silent quality
    // regression that keeps schema/rows, e.g. a codebook or rotation
    // bug, turns the suite red while honest parameter tweaks retain
    // headroom). Measured r7: lsh .3438 ivf .5875 ivf_kmeans .6344
    // pq .5813 ivfpq .4938 ivfpq_nc .5031 sq8 1.0 opq .6781.
    val floors = Map(
      "lsh" -> 0.30, "ivf" -> 0.55, "ivf_kmeans" -> 0.58,
      "pq" -> 0.55, "ivfpq" -> 0.45, "ivfpq_nc" -> 0.45,
      "sq8" -> 0.99, "opq" -> 0.65)
    floors.foreach { case (arm, floor) =>
      assert(r(arm) >= floor,
        s"$arm recall ${r(arm)} fell below its $floor floor — quality regression")
    }
  }

  test("quality floor keeps >=90% per lang and nothing below the lang's p10") {
    val kept = queries.LlmOps.quality_floor(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getDouble(2), r.getDouble(3)))
    assert(kept.nonEmpty)
    kept.foreach { case (id, _, q, p10) =>
      assert(q >= p10, s"doc $id kept below its floor")
    }
    val total = operators.TextAnalysis
      .withQuality(Tables(spark, sfDir, "documents"), col("text"))
      .groupBy("lang").count().collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val keptPerLang = kept.groupBy(_._2).view.mapValues(_.length).toMap
    keptPerLang.foreach { case (lang, n) =>
      assert(n >= (total(lang) * 0.9 - 1).floor.toLong, s"$lang dropped too much")
    }
  }

  test("approx quantiles agree with exact within tolerance on every lang group") {
    val rows = queries.LlmOps.quality_quantiles_approx(spark, sfDir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getBoolean(r.fieldIndex("approx_ok")),
        s"lang ${r.getString(0)}: approx_percentile outside tolerance of exact")
    }
    // the exact columns must equal the exact report operator's
    val exact = queries.LlmOps.quality_quantiles(spark, sfDir)
      .select("lang", "p50_words", "p90_words", "p50_quality", "p90_quality")
      .collect().map(r => r.getString(0) -> (r.getDouble(1), r.getDouble(2), r.getDouble(3), r.getDouble(4))).toMap
    rows.foreach { r =>
      val got = (r.getDouble(r.fieldIndex("p50_words")), r.getDouble(r.fieldIndex("p90_words")),
        r.getDouble(r.fieldIndex("p50_quality")), r.getDouble(r.fieldIndex("p90_quality")))
      assert(got == exact(r.getString(0)), s"lang ${r.getString(0)} exact columns diverge")
    }
  }

  test("normalization lowercases, strips sentence punct, collapses whitespace") {
    import spark.implicits._
    val df = Seq((1L, "  Hello,  WORLD!  It's  a Test.  ")).toDF("doc_id", "text")
    val r = operators.TextAnalysis.withNormalized(df, col("text")).collect().head
    assert(r.getString(r.fieldIndex("normalized")) == "hello world it's a test")
  }

  test("PII redaction scrubs emails, urls, IPs and phones with correct counts") {
    import spark.implicits._
    val df = Seq((1L,
      "contact bob@example.com or visit https://example.com/x from 192.168.1.10 call +1 (555) 123-4567 done"))
      .toDF("doc_id", "text")
    val r = operators.TextAnalysis.withRedaction(df, col("text")).collect().head
    val red = r.getString(r.fieldIndex("redacted"))
    assert(red.contains("<EMAIL>") && red.contains("<URL>") && red.contains("<IP>") && red.contains("<PHONE>"))
    assert(!red.contains("bob@") && !red.contains("192.168") && !red.contains("555"))
    assert(r.getInt(r.fieldIndex("n_email")) == 1)
    assert(r.getInt(r.fieldIndex("n_url")) == 1)
    assert(r.getInt(r.fieldIndex("n_ipv4")) == 1)
    assert(r.getInt(r.fieldIndex("n_phone")) == 1)
  }

  test("langid predicts a known language code") {
    val langs = queries.LlmOps.text_langid(spark, sfDir)
      .select("pred_lang").distinct().collect().map(_.getString(0)).toSet
    assert(langs.subsetOf(Set("en", "de", "fr", "es", "zh", "und")))
  }

  test("repetition metrics match hand-computed values on a degenerate doc") {
    import spark.implicits._
    val df = Seq(
      (1L, "spam spam spam spam spam spam"), // 1 distinct word/bigram/trigram
      (2L, "a b c d e f "), // all distinct; trailing space must not skew counts
      (3L, "a b c d e f")).toDF("doc_id", "text")
    val m = operators.TextAnalysis.repetition(df, col("doc_id"), col("text"))
      .collect().map(r => r.getLong(0) -> r).toMap
    assert(m(1L).getDouble(1) == 0.8) // 1 - 1/5 bigrams
    assert(m(1L).getDouble(2) == 0.75) // 1 - 1/4 trigrams
    assert(m(1L).getDouble(3) == 1.0) // top word covers everything
    assert(m(1L).getBoolean(4), "degenerate doc must be flagged")
    assert(m(2L).getDouble(1) == 0.0 && m(2L).getDouble(2) == 0.0)
    assert(!m(2L).getBoolean(4))
    // rtrim parity: doc 2 (trailing space) equals doc 3 metric-for-metric
    assert((1 to 3).forall(i => m(2L).getDouble(i) == m(3L).getDouble(i)))
  }

  test("surprisal matches hand-computed unigram -ln p") {
    import spark.implicits._
    val df = Seq((1L, "a a"), (2L, "b")).toDF("doc_id", "text")
    val m = operators.TextAnalysis.surprisal(df, col("doc_id"), col("text"))
      .collect().map(r => r.getLong(0) -> (r.getDouble(1), r.getLong(2))).toMap
    // corpus: a,a,b → p(a)=2/3, p(b)=1/3
    assert(m(1L) == (0.4055, 2L)) // -ln(2/3) = 0.405465...
    assert(m(2L) == (1.0986, 1L)) // -ln(1/3) = 1.098612...
  }

  test("bigram surprisal matches hand-computed conditional -ln p") {
    import spark.implicits._
    val df = Seq((1L, "a b c"), (2L, "a c")).toDF("doc_id", "text")
    // bigrams: d1 (a,b),(b,c); d2 (a,c). c(a,·)=2, c(b,·)=1
    val m = operators.TextAnalysis.bigramSurprisal(df, col("doc_id"), col("text"))
      .collect().map(r => r.getLong(0) -> (r.getDouble(1), r.getLong(2))).toMap
    assert(m(1L) == (0.3466, 2L)) // (-ln(1/2) - ln(1/1)) / 2
    assert(m(2L) == (0.6931, 1L)) // -ln(1/2)
  }

  test("contamination finds planted eval overlap and nothing else") {
    import spark.implicits._
    val evalDoc = "alpha beta gamma delta epsilon zeta"
    val df = Seq(
      (1L, evalDoc), // the "benchmark"
      (2L, "prefix words then alpha beta gamma delta epsilon tail"), // shares 5-grams
      (3L, "completely unrelated content with no overlap at all")).toDF("doc_id", "text")
    val hits = operators.Contamination.evalOverlap(df, col("doc_id") === 1L, k = 5)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // doc2 contains "alpha beta gamma delta epsilon" = 1 shared 5-gram
    assert(hits == Map(2L -> 1L), s"got $hits")
  }

  test("semantic dedup groups = closure of intra-cluster cosine pairs") {
    val emb = Tables(spark, sfDir, "embeddings")
    val verdict = operators.SemanticDedup.semantic(emb).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getBoolean(3)))
      .toMap
    val vecs = emb.select("vec_id", "embedding").collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1).toArray).toMap
    assert(verdict.keySet == vecs.keySet, "one verdict row per input vector")
    // driver-side reference: union-find over all same-cluster pairs with
    // cosine >= tau, using the operator's own cluster assignment
    val tau = 0.4
    def cos(a: Array[Float], b: Array[Float]): Double = {
      var d = 0.0; var na = 0.0; var nb = 0.0; var i = 0
      while (i < a.length) { d += a(i).toDouble * b(i); na += a(i).toDouble * a(i)
        nb += b(i).toDouble * b(i); i += 1 }
      d / math.sqrt(na * nb)
    }
    val parent = scala.collection.mutable.Map(vecs.keys.map(k => k -> k).toSeq: _*)
    def find(x: Long): Long = if (parent(x) == x) x else { val r = find(parent(x)); parent(x) = r; r }
    verdict.groupBy(_._2._1).values.foreach { members =>
      val ids = members.keys.toArray.sorted
      for (i <- ids.indices; j <- (i + 1) until ids.length)
        if (cos(vecs(ids(i)), vecs(ids(j))) >= tau) {
          val (ra, rb) = (find(ids(i)), find(ids(j)))
          if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
        }
    }
    verdict.foreach { case (vid, (_, grp, _)) =>
      assert(grp == find(vid), s"vec $vid group label")
    }
    // exactly one kept representative per group
    val byGrp = verdict.values.groupBy(_._2)
    byGrp.foreach { case (grp, vs) =>
      assert(vs.count(_._3) == 1, s"group $grp must keep exactly one member")
    }
    assert(byGrp.exists(_._2.size > 1), "corpus should contain semantic dups")
  }

  test("prototype pruning drops floor(frac*n) most-prototypical per cluster") {
    val emb = Tables(spark, sfDir, "embeddings")
    val out = operators.SemanticDedup.prunePrototypes(emb, pruneFrac = 0.25)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2), r.getLong(3), r.getBoolean(4)))
    assert(out.length == emb.count(), "one verdict row per vector")
    out.groupBy(_._2).foreach { case (cid, rows) =>
      val n = rows.length
      assert(rows.forall(_._4 == n), s"cluster $cid count column")
      assert(rows.map(_._3).sorted.toSeq == (1 to n), s"cluster $cid ranks are 1..n")
      val pruned = rows.count(!_._5)
      assert(pruned == math.floor(0.25 * n).toInt, s"cluster $cid prunes floor(frac*n)")
      // the pruned prefix is exactly the lowest ranks (most prototypical)
      assert(rows.filter(!_._5).map(_._3).sorted.toSeq == (1 to pruned),
        s"cluster $cid prunes the rank prefix")
    }
  }

  test("bpe trains the expected merges on a toy corpus and counts tokens") {
    import spark.implicits._
    // "low low low low low lower lower newest newest" classic example:
    // most frequent pair is (l, o) with 7 occurrences
    val docs = Seq((1L, "low low low low low lower lower newest newest")).toDF("doc_id", "text")
    val merges = operators.Bpe.trainMerges(docs, col("text"), nMerges = 4)
    assert(merges.head.left == "l" && merges.head.right == "o" &&
      merges.head.pairCount == 7L, s"first merge should be (l,o)x7, got ${merges.head}")
    assert(merges.map(_.rank) == Seq(1, 2, 3, 4))
    // second merge: "lo"+"w" appears 7 times too; ties/order resolved
    // deterministically — re-training must reproduce identically
    val again = operators.Bpe.trainMerges(docs, col("text"), nMerges = 4)
    assert(again == merges, "training is deterministic")
    // token counts shrink as merges apply: 9 words, fully merged "low"
    // words cost fewer symbols than raw chars
    val n0 = operators.Bpe.tokenCounts(docs, col("doc_id"), col("text"), Nil)
      .collect()(0).getInt(1)
    val n4 = operators.Bpe.tokenCounts(docs, col("doc_id"), col("text"), merges)
      .collect()(0).getInt(1)
    // no merges: every char + one </w> per word
    val text = "low low low low low lower lower newest newest"
    val expect0 = text.split(" ").map(_.length + 1).sum
    assert(n0 == expect0, s"unmerged token count $n0 != $expect0")
    assert(n4 < n0, "merges must reduce the token count")
  }

  test("bpe adaptive local rounds reproduce the distributed rounds merge-for-merge") {
    import spark.implicits._
    // deliberately tie-heavy corpus (many equal pair counts) so the
    // (count desc, left asc, right asc) binary tie-break is exercised,
    // plus a non-ASCII word to pin UTF8String byte ordering
    val docs = Seq(
      (0L, "low low low low low lower lower newest newest"),
      (1L, "née née aba aba abb abb"),
      (2L, "zz zz yy yy xx xx")).toDF("doc_id", "text")
    val vocab = operators.Bpe.wordCounts(docs, col("text"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val dist = operators.Bpe.trainDistributed(vocab, nMerges = 10)
    val local = operators.Bpe.trainLocal(
      vocab.collect().map(r => (r.getString(0), r.getLong(1))), nMerges = 10)
    assert(local == dist, s"local $local != distributed $dist")
    // the batched rounds must stay merge-for-merge identical under a
    // tiny collect window too (forces the overlap stopper + the
    // 2·c_ov truncation + many more rounds than the default window)
    val distTight = operators.Bpe.trainDistributed(vocab, nMerges = 10, collectK = 2)
    assert(distTight == local, s"collectK=2 $distTight != local $local")
    vocab.unpersist()
    // and on the real sf0.001 documents table at a deeper merge budget
    val docsReal = Tables(spark, sfDir, "documents")
    val vocabReal = operators.Bpe.wordCounts(docsReal, col("text"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val distReal = operators.Bpe.trainDistributed(vocabReal, nMerges = 40)
    val localReal = operators.Bpe.trainLocal(
      vocabReal.collect().map(r => (r.getString(0), r.getLong(1))), nMerges = 40)
    vocabReal.unpersist()
    assert(distReal == localReal,
      s"sf0.001 batched-distributed != local:\n$distReal\n$localReal")
  }

  test("bpe packIds: conservation, fixed length, doc-order stream, bucket-invariant") {
    import spark.implicits._
    val texts = Seq(
      (0L, "low low low lower"), (1L, "newest low lower"), (2L, "low"),
      (3L, "lower lower newest newest low low"), (4L, "newest newest"),
      (5L, "low lower newest low"))
    val docs = texts.toDF("doc_id", "text").repartition(4)
    val L = 7
    val packed = operators.Bpe.packIds(spark, docs, col("doc_id"), col("text"),
      nMerges = 3, seqLen = L)
      .collect().map(r => r.getLong(0) -> r.getSeq[Int](1)).sortBy(_._1)
    // every sequence is exactly L tokens
    assert(packed.forall(_._2.length == L), "all sequences full length")
    // conservation: total packed tokens == floor(total stream / L) * L,
    // where the stream is per-doc bpe token count + one EOS each
    val merges = operators.Bpe.trainMerges(docs, col("text"), nMerges = 3)
    val total = operators.Bpe.tokenCounts(docs, col("doc_id"), col("text"), merges)
      .agg(sum(col("n_bpe_tokens"))).collect()(0).getLong(0) + texts.length
    assert(packed.map(_._2.length).sum == (total / L) * L,
      s"packed ${packed.map(_._2.length).sum} vs stream $total")
    // the EOS id appears exactly once per fully-packed document and the
    // flattened stream is the doc_id-ordered concatenation: decoding
    // doc boundaries from EOS positions must give back per-doc counts
    val flat = packed.flatMap(_._2)
    val eos = flat.max // EOS is the largest id by construction
    val perDoc = operators.Bpe.tokenCounts(docs, col("doc_id"), col("text"), merges)
      .collect().map(r => r.getLong(0) -> r.getInt(1)).sortBy(_._1)
    var pos = 0
    perDoc.foreach { case (id, n) =>
      if (pos + n < flat.length) {
        assert(flat(pos + n) == eos, s"doc $id should end with EOS at ${pos + n}")
        pos += n + 1
      } else pos = flat.length // tail doc truncated by the dropped partial seq
    }
    // partitioning/bucketing invariance: tiny buckets == one big bucket
    val alt = operators.Bpe.packIds(spark, docs.repartition(7), col("doc_id"),
      col("text"), nMerges = 3, seqLen = L, bucketSpan = 2)
      .collect().map(r => r.getLong(0) -> r.getSeq[Int](1)).sortBy(_._1)
    assert(alt.toSeq == packed.toSeq, "bucketSpan and partitioning do not change output")
    // lifecycle: the encoded-token-stream persist must be RELEASED once
    // the pack materializes — a pinned InMemoryRelation per packIds call
    // accumulates output-sized caches across a long session (r9 advice)
    spark.catalog.clearCache()
    operators.Bpe.packIds(spark, docs, col("doc_id"), col("text"),
      nMerges = 3, seqLen = L).collect()
    assert(spark.sharedState.cacheManager.isEmpty,
      "packIds must not leave a pinned cache entry behind")
  }

  test("dsir weights rank target-like docs above off-domain docs") {
    import spark.implicits._
    val docs = Seq(
      (1L, "alpha beta alpha beta", true),
      (2L, "alpha beta gamma", true),
      (3L, "alpha beta alpha", false),  // target-like but not flagged
      (4L, "omega psi omega psi", false),
      (5L, "omega psi chi", false)).toDF("doc_id", "text", "tgt")
    val w = operators.Dsir.importanceWeights(docs, col("doc_id"), col("text"),
      col("tgt"), buckets = 64)
      .collect().map(r => r.getLong(0) -> r.getDouble(2)).toMap
    // docs made of target-domain grams score above off-domain docs,
    // whether or not they were in the flagged subset themselves —
    // weights are RELATIVE (the target is part of the raw pool being
    // selected from, so even pure-target docs sit near zero; only the
    // ordering drives resampling)
    assert(w(1L) > w(4L), s"target doc ${w(1L)} vs off-domain ${w(4L)}")
    assert(w(3L) > w(4L), s"target-LIKE doc ${w(3L)} vs off-domain ${w(4L)}")
    assert(w(3L) > w(5L), s"target-LIKE doc ${w(3L)} vs off-domain ${w(5L)}")
  }

  test("corpus_delta classifies every doc and near-dup-flags added docs") {
    import spark.implicits._
    val out = queries.LlmOps.corpus_delta(spark, sfDir)
      .collect().map(r => (r.getLong(0), r.getString(1),
        if (r.isNullAt(2)) None else Some(r.getLong(2))))
    val n = Tables(spark, sfDir, "documents").count()
    // exactly the union of the two snapshots is classified
    assert(out.length == (0L until n).count(i => i % 17 != 3 || i % 19 != 5))
    out.foreach { case (id, status, nd) =>
      val inOld = id % 17 != 3
      val inNew = id % 19 != 5
      status match {
        case "removed" => assert(inOld && !inNew)
        case "added" | "added_near_dup" => assert(!inOld && inNew)
        case "changed" => assert(inOld && inNew && id % 13 == 2)
        case "unchanged" => assert(inOld && inNew && id % 13 != 2)
      }
      // near_dup_of points at a RETAINED doc, only ever for added docs
      nd.foreach { d =>
        assert(status == "added_near_dup")
        assert(d % 17 != 3 && d % 19 != 5, s"near_dup_of $d not retained")
      }
    }
    // the synthetic near-dup families guarantee at least one added doc
    // whose family head/variant survives in the retained corpus
    assert(out.exists(_._2 == "added_near_dup"),
      "corpus should contain an added near-dup of a retained doc")
    assert(out.exists(_._2 == "removed") && out.exists(_._2 == "changed"))
  }

  test("corpus_delta_stream drains to exactly the batch delta") {
    val batch = queries.LlmOps.corpus_delta(spark, sfDir)
      .collect().map(r => (r.getLong(0), r.getString(1),
        if (r.isNullAt(2)) None else Some(r.getLong(2)))).toSet
    val streamed = queries.LlmOps.corpus_delta_stream(spark, sfDir)
      .collect().map(r => (r.getLong(0), r.getString(1),
        if (r.isNullAt(2)) None else Some(r.getLong(2)))).toSet
    assert(streamed == batch,
      s"stream/batch diverge: only-stream=${streamed -- batch} only-batch=${batch -- streamed}")
  }

  test("cross-side pair state pairs across batches in either arrival order") {
    import spark.implicits._
    // one retained/added near-dup pair split so the RETAINED doc
    // arrives in a LATER batch than the added doc (range staging by id
    // puts 5 before 100): the bucket state must complete the pair
    // regardless of which side arrives first
    val words = (1 to 40).map(i => s"tok$i")
    val a = words.mkString(" ")
    val b = (words.dropRight(1) :+ "tokX").mkString(" ")
    val oldDocs = Seq((100L, a)).toDF("doc_id", "text")
    val newDocs = Seq((100L, a), (5L, b)).toDF("doc_id", "text")
    val out = graft.streaming.StreamingDedup.runDelta(spark, oldDocs, newDocs,
      batches = 2)
      .collect().map(r => (r.getLong(0), r.getString(1))).toMap
    assert(out(5L) == "added_near_dup", s"added doc not linked: $out")
    assert(out(100L) == "unchanged")
  }

  test("bloom decontamination has no false negatives vs exact overlap") {
    val d = Tables(spark, sfDir, "documents")
    val pred = operators.Sampling.bucket(col("doc_id"), 100) >= 98
    val exact = operators.Contamination.evalOverlap(d, pred, k = 5)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val bloom = operators.Contamination.bloomOverlap(d, pred, k = 5)
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(exact.nonEmpty, "fixture corpus should contain contamination")
    // one-sided error: every exactly-contaminated doc is flagged with
    // at least as many hits (bloom can only ADD false-positive grams)
    exact.foreach { case (id, n) =>
      assert(bloom.contains(id), s"doc $id lost by bloom (false negative)")
      assert(bloom(id) >= n, s"doc $id bloom hits ${bloom(id)} < exact $n")
    }
    // and at 2^17 bits / ~small eval set the FP rate is tiny: flagged
    // docs should not explode beyond the exact set
    assert(bloom.size <= exact.size * 2, s"bloom ${bloom.size} vs exact ${exact.size}")
  }

  test("containment finds asymmetric near-supersets that jaccard misses") {
    import spark.implicits._
    val small = "the quick brown fox jumps over the lazy dog again and again"
    val filler = (1 to 80).map(i => s"filler$i word$i token$i").mkString(" ")
    val docs = Seq(
      (1L, small),
      (2L, small + " " + filler),  // contains all of doc 1 + much more
      (3L, filler)).toDF("doc_id", "text")
    val pairs = operators.Dedup.containment(docs, k = 3, threshold = 0.9)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    // 1→2 is full containment; jaccard(1,2) is tiny so symmetric dedup
    // would never pair them
    assert(pairs.exists(p => p._1 == 1L && p._2 == 2L && p._3 == 1.0),
      s"expected (1,2,1.0) in ${pairs.mkString(",")}")
    // 3→2 as well (doc 2 = doc1 + filler, so filler is contained too);
    // but nothing is contained in doc 1 or doc 3 besides themselves
    assert(!pairs.exists(p => p._2 == 1L), s"nothing fits in doc 1: ${pairs.mkString(",")}")
    val j = operators.Dedup.ngramJaccard(docs, k = 3, threshold = 0.9).collect()
    assert(!j.exists(r => r.getLong(0) == 1L && r.getLong(1) == 2L),
      "jaccard at the same threshold must NOT pair (1,2) — that asymmetry is the point")
  }

  test("quality classifier learns the label and trains deterministically") {
    val d = Tables(spark, sfDir, "documents")
    val label = col("n_chars") >= 300
    val w1 = operators.QualityClassifier.train(d, col("doc_id"), col("text"), label)
    val w2 = operators.QualityClassifier.train(d, col("doc_id"), col("text"), label)
    assert(java.util.Arrays.equals(w1, w2), "training must be bit-reproducible")
    val out = operators.QualityClassifier.score(d, col("doc_id"), col("text"), label, w1)
      .collect().map(r => (r.getInt(1), r.getInt(3)))
    val acc = out.count(p => p._1 == p._2).toDouble / out.length
    val majority = math.max(out.count(_._1 == 1), out.count(_._1 == 0)).toDouble / out.length
    assert(acc > majority, s"train accuracy $acc should beat majority baseline $majority")
    assert(acc >= 0.7, s"train accuracy $acc too low for a separable label")
  }

  test("langid detects unsegmented Chinese and English correctly") {
    import spark.implicits._
    val df = Seq(
      (1L, "我是学生我不喜欢下雨的天气"),
      (2L, "the cat is on the mat and it is happy")).toDF("doc_id", "text")
    val preds = operators.TextAnalysis.withLangId(df, col("text"))
      .select("doc_id", "pred_lang").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(preds(1L) == "zh", s"expected zh, got ${preds(1L)}")
    assert(preds(2L) == "en", s"expected en, got ${preds(2L)}")
  }
}
