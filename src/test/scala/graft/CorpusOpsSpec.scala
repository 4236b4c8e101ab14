package graft

import graft.operators.{Dedup, Drift, Sampling, TextAnalysis}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Specs for the corpus-curation operators added in round 2b: Gopher
  * rule battery, corpus stats rollup, duplicated-span detection, and
  * the deterministic shard shuffle.
  */
class CorpusOpsSpec extends AnyFunSuite {
  import SparkTestSession._

  test("gopher rules: each rule fires on its designed violation") {
    import spark.implicits._
    val good = (1 to 60).map(i => if (i % 7 == 0) "the" else s"word$i").mkString(" ")
    val tooShort = "the quick brown fox and the dog"
    val noStops = (1 to 60).map(i => s"tok$i").mkString(" ")
    val symbols = (1 to 50).map(_ => "x#y").mkString(" ") + " the of and is on"
    val longWords = (1 to 60).map(_ => "pneumonoultramicroscopic").mkString(" ")
    val docs = Seq(
      (1L, good), (2L, tooShort), (3L, noStops), (4L, symbols), (5L, longWords)
    ).toDF("doc_id", "text")
    val r = TextAnalysis.withGopherRules(docs, col("text"))
      .select("doc_id", "pass_word_count", "pass_mean_word_len", "pass_alpha_frac",
        "pass_stopwords", "pass_symbol_ratio", "gopher_pass")
      .collect().map(x => x.getLong(0) ->
        (x.getBoolean(1), x.getBoolean(2), x.getBoolean(3), x.getBoolean(4), x.getBoolean(5), x.getBoolean(6)))
      .toMap
    assert(r(1L) == ((true, true, true, true, true, true)), s"good doc: ${r(1L)}")
    assert(!r(2L)._1 && !r(2L)._6, "short doc fails word count")
    assert(!r(3L)._4 && !r(3L)._6, "stopword-free doc fails stopword rule")
    assert(!r(4L)._5 && !r(4L)._6, "symbol-heavy doc fails symbol ratio")
    assert(!r(5L)._2 && !r(5L)._6, "long-word doc fails mean word length")
  }

  test("ks drift: hand-computed statistic; identical distribution gives zero") {
    import spark.implicits._
    // global cum at v=1..4: 2,3,6,8 (g=8); x cum: 2,3,4,4 (n=4)
    // -> sup|F_x - F| = |3/4 - 3/8| = 0.375; y symmetric
    val df = Seq(("x", 1), ("x", 1), ("x", 2), ("x", 3),
      ("y", 3), ("y", 3), ("y", 4), ("y", 4)).toDF("src", "v")
    val r = Drift.ksPerGroup(df, col("src"), col("v")).collect()
      .map(x => x.getString(0) -> ((x.getLong(1), x.getDouble(2)))).toMap
    assert(r("x") == ((4L, 0.375)), s"x: ${r("x")}")
    assert(r("y") == ((4L, 0.375)), s"y: ${r("y")}")
    val one = Drift.ksPerGroup(df.filter(col("src") === "x"), col("src"), col("v"))
      .collect()
    assert(one.length == 1 && one.head.getDouble(2) == 0.0,
      "a group that IS the corpus has zero drift")
  }

  test("corpus stats: exact totals and vocabulary per group") {
    import spark.implicits._
    val docs = Seq(
      (1L, "en", "web", "a b c"),
      (2L, "en", "web", "a b d e"),
      (3L, "de", "web", "x y")
    ).toDF("doc_id", "lang", "source", "text")
    val r = TextAnalysis.corpusStats(docs, col("lang"), col("source"), col("text"))
      .collect().map(x => (x.getString(0), x.getString(1)) ->
        (x.getLong(2), x.getLong(3), x.getLong(4), x.getDouble(5), x.getLong(6))).toMap
    assert(r(("en", "web")) == ((2L, 12L, 7L, 3.5, 5L)))
    assert(r(("de", "web")) == ((1L, 3L, 2L, 2.0, 2L)))
  }

  test("duplicated spans: cross-doc shared windows counted, unique docs zero") {
    import spark.implicits._
    val shared = "alpha beta gamma delta epsilon" // one exact 5-word window
    val docs = Seq(
      (1L, s"$shared one two three four five six"),
      (2L, s"seven eight nine ten eleven twelve $shared"),
      (3L, "completely different words with no overlap at all here")
    ).toDF("doc_id", "text")
    val r = Dedup.duplicatedSpans(docs, col("doc_id"), col("text"), w = 5)
      .collect().map(x => x.getLong(0) -> (x.getInt(1), x.getLong(2))).toMap
    // docs 1/2: 11 words -> 7 windows each; only the literal `shared`
    // window occurs in both
    assert(r(1L) == ((7, 1L)), s"doc1: ${r(1L)}")
    assert(r(2L) == ((7, 1L)), s"doc2: ${r(2L)}")
    assert(r(3L) == ((5, 0L)), s"doc3: ${r(3L)}")
  }

  test("duplicated spans: whole-doc dupes share every window") {
    import spark.implicits._
    val t = (1 to 20).map(i => s"w$i").mkString(" ")
    val docs = Seq((1L, t), (2L, t)).toDF("doc_id", "text")
    val r = Dedup.duplicatedSpans(docs, col("doc_id"), col("text"), w = 5)
      .collect().map(x => (x.getInt(1), x.getLong(2), x.getDouble(3))).toSet
    assert(r == Set((16, 16L, 1.0)))
  }

  test("span removal: cross-doc and within-doc duplicated windows cut") {
    import spark.implicits._
    val shared = "alpha beta gamma delta epsilon"
    val docs = Seq(
      (1L, s"$shared one two three four five six"),
      (2L, s"seven eight nine ten eleven twelve $shared"),
      (3L, "totally different words with no overlap at all here"),
      (4L, "x1 x2 x3 x4 x5 q x1 x2 x3 x4 x5") // within-doc repeat
    ).toDF("doc_id", "text")
    val r = Dedup.removeDuplicatedSpans(docs, col("doc_id"), col("text"), w = 5)
      .collect().map(x => x.getLong(0) -> (x.getInt(1), x.getInt(2), x.getString(3))).toMap
    def m(s: String) = java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    assert(r(1L) == ((11, 5, m("one two three four five six"))), s"doc1: ${r(1L)}")
    assert(r(2L) == ((11, 5, m("seven eight nine ten eleven twelve"))), s"doc2: ${r(2L)}")
    assert(r(3L)._2 == 0, "unique doc keeps everything")
    assert(r(4L) == ((11, 10, m("q"))), s"within-doc repeat: ${r(4L)}")
  }

  test("char windows kernel: rolling hash equals direct hash; strip merges intervals") {
    import org.apache.spark.unsafe.types.UTF8String
    val s = "the quick brown fox jumps over the lazy dog again and again"
    val L = 7
    def direct(sub: String): Long = {
      var h = 0L
      sub.foreach(c => h = h * 0x100000001b3L + c)
      h
    }
    val rolled = graft.functions.TextHashes.charWindows(UTF8String.fromString(s), L)
    assert(rolled.numElements() == s.length - L + 1)
    (0 until rolled.numElements()).foreach { i =>
      assert(rolled.getLong(i) == direct(s.substring(i, i + L)), s"offset $i")
    }
    // shorter than L -> empty
    assert(graft.functions.TextHashes.charWindows(UTF8String.fromString("abc"), L).numElements() == 0)
    // strip: spans [2,5) and [4,7) merge to [2,7)
    val pos = new org.apache.spark.sql.catalyst.util.GenericArrayData(Array(2, 4))
    assert(graft.functions.TextHashes.stripSpans(
      UTF8String.fromString("0123456789"), pos, 3).toString == "0178 9".replace(" ", ""))
  }

  test("char-span removal: shared 25-char run cut exactly, unique docs intact") {
    import spark.implicits._
    val S = "abcdefghijklmnopqrstuvwxy" // 25 chars
    val docs = Seq(
      (1L, S + "0123456789"),
      (2L, "987654321" + S),
      (3L, "totally unique text with no twenty-char overlap anywhere"),
      (4L, S + "q" + S) // within-doc repeat
    ).toDF("doc_id", "text")
    val r = Dedup.removeDuplicatedCharSpans(docs, col("doc_id"), col("text"), L = 20)
      .collect().map(x => x.getLong(0) -> (x.getInt(1), x.getInt(2), x.getString(3))).toMap
    def m(s: String) = java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    assert(r(1L) == ((35, 25, m("0123456789"))), s"doc1: ${r(1L)}")
    assert(r(2L) == ((34, 25, m("987654321"))), s"doc2: ${r(2L)}")
    assert(r(3L)._2 == 0, "unique doc keeps everything")
    assert(r(4L) == ((51, 50, m("q"))), s"within-doc repeat: ${r(4L)}")
  }

  test("mixture: integer rates copy exactly, fractional rates keep hash share") {
    import spark.implicits._
    val docs = (0L until 400L).map(i => (i, if (i < 100) "up" else "tail")).toDF("doc_id", "source")
    val rate = when(col("source") === "up", 3.0).otherwise(0.5)
    val m = Sampling.mixture(docs, col("doc_id"), rate)
    val perDoc = m.groupBy("doc_id", "source").count().collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    // rate 3.0: exactly 3 epochs, no fractional copy
    perDoc.filter(_._2 == "up").foreach { case (id, _, n) => assert(n == 3, s"doc $id") }
    // rate 0.5: deterministic ~half of the tail survives with 1 copy
    val tail = perDoc.filter(_._2 == "tail")
    assert(tail.forall(_._3 == 1))
    assert(tail.length > 100 && tail.length < 200, s"kept ${tail.length}/300")
    // epochs are a dense prefix 0..n-1 per doc
    val badEpochs = m.groupBy("doc_id")
      .agg(max("epoch").as("mx"), count(lit(1)).as("c"))
      .filter(col("mx") =!= col("c") - 1)
    assert(badEpochs.isEmpty)
    // pure function of (id, rate): partition-invariant
    val a = m.select("doc_id", "epoch").collect().toSet
    val b = Sampling.mixture(docs.repartition(7), col("doc_id"), rate)
      .select("doc_id", "epoch").collect().toSet
    assert(a == b)
  }

  test("component map: chains collapse to min-id families, singletons absent") {
    import spark.implicits._
    val pairs = Seq((1L, 2L), (2L, 3L), (5L, 6L)).toDF("doc_a", "doc_b")
    val fam = Dedup.componentMap(pairs)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(fam == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 5L -> 5L, 6L -> 5L))
  }

  test("quantiles: ordered per lang, and Spark percentile interpolates p*(n-1)") {
    val q = queries.LlmOps.quality_quantiles(spark, sfDir)
    val bad = q.filter(col("p25_words") > col("p50_words") ||
      col("p50_words") > col("p75_words") || col("p75_words") > col("p90_words"))
    assert(bad.isEmpty, "percentiles must be monotone")
    // pin the interpolation convention the DuckDB oracle mirrors
    import spark.implicits._
    val vals = Seq(10, 20, 30, 40).toDF("v")
      .agg(expr("percentile(v, array(0.25D, 0.9D))").as("p"))
      .select(element_at(col("p"), 1), element_at(col("p"), 2))
      .head()
    assert(vals.getDouble(0) == 17.5 && vals.getDouble(1) == 37.0)
  }

  test("ccnet buckets: balanced tertiles, head more fluent than tail") {
    val r = queries.LlmOps.text_ccnet_bucket(spark, sfDir)
    val counts = r.groupBy("lang", "ccnet_bucket").count().collect()
      .map(x => (x.getString(0), x.getString(1)) -> x.getLong(2)).toMap
    counts.keys.map(_._1).foreach { lang =>
      val h = counts.getOrElse((lang, "head"), 0L)
      val t = counts.getOrElse((lang, "tail"), 0L)
      assert(math.abs(h - t) <= 1, s"$lang tertiles unbalanced: head=$h tail=$t")
    }
    val agg = r.groupBy("ccnet_bucket").agg(avg("mean_surprisal").as("m")).collect()
      .map(x => x.getString(0) -> x.getDouble(1)).toMap
    assert(agg("head") < agg("tail"), "head bucket must be the fluent end")
  }

  test("tfidf keywords: hand-computed scores, rare terms outrank common") {
    import spark.implicits._
    val docs = Seq((1L, "a a b"), (2L, "a c"), (3L, "d d d")).toDF("doc_id", "text")
    val r = TextAnalysis.tfidfKeywords(docs, col("doc_id"), col("text"), k = 2)
      .collect().map(x => (x.getLong(0), x.getInt(1)) -> (x.getString(2), x.getDouble(3))).toMap
    // N=3; df: a=2, b=1, c=1, d=1
    assert(r((1L, 1)) == (("b", 1.0986)), "1*ln(3/1) beats 2*ln(3/2)")
    assert(r((1L, 2)) == (("a", 0.8109)))
    assert(r((3L, 1)) == (("d", 3.2958)))
    assert(r((2L, 1))._1 == "c" && r((2L, 2))._1 == "a")
  }

  test("pmi collocations: hand-computed scores, exclusive pairs outrank shared") {
    import spark.implicits._
    // 8 docs "new york common" + 8 docs "other thing common":
    // N=48 words, W=32 bigrams; c2=8 for all four pairs.
    // pmi(new,york) = ln(8*48*48/(32*8*8))  = ln 9   ≈ 2.197225
    // pmi(york,common) = ln(8*48*48/(32*8*16)) = ln 4.5 ≈ 1.504077
    val docs = ((1 to 8).map(i => (i.toLong, "new york common")) ++
      (9 to 16).map(i => (i.toLong, "other thing common"))).toDF("doc_id", "text")
    val r = TextAnalysis.pmiCollocations(docs, col("text"), minPair = 5)
      .collect().map(x => (x.getString(0), x.getString(1)) -> ((x.getLong(2), x.getDouble(3))))
      .toMap
    assert(r.size == 4)
    assert(r(("new", "york")) == ((8L, 2.197225)), s"${r(("new", "york"))}")
    assert(r(("other", "thing")) == ((8L, 2.197225)))
    assert(r(("york", "common")) == ((8L, 1.504077)))
    assert(r(("thing", "common")) == ((8L, 1.504077)))
    // support floor: pairs below minPair are dropped entirely
    val none = TextAnalysis.pmiCollocations(docs, col("text"), minPair = 9).count()
    assert(none == 0)
  }

  test("zipf report: exact power-law corpus fits slope -1, ranks by count desc") {
    import spark.implicits._
    // counts 12, 6, 4, 3 = 12/rank: the points lie exactly on
    // y = ln 12 - x, so the least-squares slope is exactly -1
    val words = Seq.fill(12)("alpha") ++ Seq.fill(6)("beta") ++
      Seq.fill(4)("gamma") ++ Seq.fill(3)("delta")
    val docs = Seq((1L, words.mkString(" "))).toDF("doc_id", "text")
    val r = TextAnalysis.zipfReport(docs, col("text"), top = 4)
      .collect().map(x => (x.getInt(0), x.getString(1), x.getLong(2), x.getDouble(3)))
    assert(r.map(t => (t._1, t._2, t._3)).toSeq ==
      Seq((1, "alpha", 12L), (2, "beta", 6L), (3, "gamma", 4L), (4, "delta", 3L)))
    assert(r.forall(_._4 == -1.0), s"slope: ${r.head._4}")
  }

  test("pipeline report: funnel counts are monotone and end at the clean corpus size") {
    val r = graft.queries.LlmOps.queries("pipeline_report")(spark, sfDir)
      .collect().map(x => x.getString(0) -> x.getLong(1))
    assert(r.map(_._1).toSeq == Seq("00_total", "01_lang", "02_quality",
      "03_holdout", "04_decontaminated", "05_deduped"))
    val ns = r.map(_._2)
    assert(ns.zip(ns.tail).forall { case (a, b) => a >= b }, s"not monotone: ${ns.toSeq}")
    assert(ns.head == Tables(spark, sfDir, "documents").count())
    val clean = graft.queries.LlmOps.queries("pipeline_clean")(spark, sfDir).count()
    assert(ns.last == clean, "final stage equals pipeline_clean's kept corpus")
  }

  test("shard shuffle: total, contiguous per-shard positions, partition-invariant") {
    val docs = Tables(spark, sfDir, "documents")
    val n = docs.count()
    val a = Sampling.shardShuffle(docs, col("doc_id"))
    assert(a.count() == n, "every row lands in exactly one shard slot")
    // positions within each shard are exactly 0..size-1
    val bad = a.groupBy("shard")
      .agg(count(lit(1)).as("c"), min("shard_pos").as("lo"), max("shard_pos").as("hi"))
      .filter(col("lo") =!= 0 || col("hi") =!= col("c") - 1)
    assert(bad.isEmpty, "per-shard positions must be dense 0..n-1")
    // pure function of id: identical under a different partitioning
    val x = a.select("doc_id", "shard", "shard_pos").collect().toSet
    val y = Sampling.shardShuffle(docs.repartition(7), col("doc_id"))
      .select("doc_id", "shard", "shard_pos").collect().toSet
    assert(x == y)
  }
}
