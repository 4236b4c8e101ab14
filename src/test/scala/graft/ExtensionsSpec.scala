package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** Config-only deployment path: a session created with
  * `spark.sql.extensions=graft.GraftExtensions` gets the graft SQL
  * functions with no code call — the way a cluster admin enables the
  * library fleet-wide.
  */
class ExtensionsSpec extends AnyFunSuite {

  test("GraftExtensions injects the graft SQL functions into a new session") {
    // `spark.sql.extensions=graft.GraftExtensions` is read from the
    // SparkCONTEXT conf, so under the suite's shared context the
    // config-only path can't bind here; `withExtensions` exercises the
    // SAME class through the builder's documented programmatic hook.
    // A fresh session (not the shared one) still proves injection is
    // per-session, which is what a cluster deployment relies on.
    val prevDefault = SparkSession.getDefaultSession
    val prevActive = SparkSession.getActiveSession
    SparkSession.clearDefaultSession()
    SparkSession.clearActiveSession()
    val s = SparkSession.builder()
      .master("local[2]")
      .appName("graft-ext-test")
      .withExtensions(new GraftExtensions)
      .config("spark.sql.shuffle.partitions", "2")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    try {
      val r = s.sql(
        """SELECT fnv1a64('spark') AS f, simhash64('a b c') AS sh,
          |  round(char_entropy('aabb'), 4) AS e,
          |  hash_embed('spark join', 8) AS v""".stripMargin).head()
      assert(r.getLong(0) == graft.functions.TextHashes.fnv1a64(
        org.apache.spark.unsafe.types.UTF8String.fromString("spark")))
      assert(!r.isNullAt(1))
      // entropy of aabb = ln 2
      assert(math.abs(r.getDouble(2) - 0.6931) < 1e-9)
      val v = r.getSeq[Float](3)
      assert(v.length == 8 && v.map(math.abs(_)).sum == 2.0f)
      // Bad dims fail at ANALYSIS time with a clear message — not an
      // ArithmeticException/NegativeArraySizeException at execution.
      for (bad <- Seq("0", "-4", "length('ab')")) {
        val e = intercept[org.apache.spark.sql.AnalysisException] {
          s.sql(s"SELECT hash_embed('x', $bad)").head()
        }
        assert(e.getMessage.contains("hash_embed"), s"dim=$bad: ${e.getMessage}")
      }
      // the full kernel surface from SQL text, one probe per function
      val k = s.sql(
        """SELECT shingles('a b c d', 3) AS sh,
          |  minhash_sig(array('x', 'y'), 4) AS mh,
          |  char_windows('abcdef', 3) AS cw,
          |  vec_dot(array(CAST(1.0 AS FLOAT), CAST(2.0 AS FLOAT)),
          |          array(CAST(3.0 AS FLOAT), CAST(4.0 AS FLOAT))) AS vd,
          |  vec_norm(array(CAST(3.0 AS FLOAT), CAST(4.0 AS FLOAT))) AS vn,
          |  jaccard_sorted_fp(array(1L, 2L, 3L), array(2L, 3L, 4L)) AS j,
          |  common_sorted_fp(array(1L, 2L, 3L), array(2L, 3L, 4L)) AS c""".stripMargin).head()
      assert(k.getSeq[String](0) == Seq("a b c", "b c d"))
      assert(k.getSeq[Long](1).length == 4)
      assert(k.getSeq[Long](2).length == 4) // 6 chars, L=3 -> 4 windows
      assert(k.getDouble(3) == 11.0)
      assert(k.getDouble(4) == 5.0)
      assert(math.abs(k.getDouble(5) - 0.5) < 1e-15)
      assert(k.getInt(6) == 2 || k.getLong(6) == 2L)
      // freq_ordered_prefix from SQL text with a RELATIONAL histogram
      // (the scalar-subquery form sql_shingle_jaccard uses); the hist
      // arrives unsorted to prove the conversion memo key-sorts it.
      // counts: 10->5, 20->9, 30/40 unseen->0; (cnt, fp) order =
      // 30,40,10,20; take = 4 - ceil(0.5*4) + 1 = 3
      val fop = s.sql(
        """SELECT freq_ordered_prefix(array(10L, 20L, 30L, 40L),
          |  (SELECT collect_list(struct(g, c))
          |   FROM VALUES (20L, 9L), (10L, 5L) AS h(g, c)), 0.5) AS p""".stripMargin).head()
      assert(fop.getSeq[Long](0) == Seq(30L, 40L, 10L))
      // the two aggregates from SQL text
      val agg = s.sql(
        """SELECT topk_agg(CAST(v AS DOUBLE), id, 2) AS top,
          |       spacesaving_topk(w, 2, 16) AS hh
          |FROM VALUES (1L, 10, 'a'), (2L, 30, 'b'), (3L, 20, 'b') AS t(id, v, w)""".stripMargin)
        .head()
      val top = agg.getSeq[org.apache.spark.sql.Row](0)
      assert(top.map(r => (r.getDouble(0), r.getLong(1))) == Seq((30.0, 2L), (20.0, 3L)))
      val hh = agg.getSeq[org.apache.spark.sql.Row](1)
      assert(hh.map(r => (r.getString(0), r.getLong(1))) == Seq(("b", 2L), ("a", 1L)))
      // one-pass fixed-point moments from SQL text: fp_bits=1 (fp=2),
      // vectors (1,2) and (3,4) -> n=2, s1=(8,12),
      // s2 upper-triangle = (2*1*1+2*3*3, 2*1*2+2*3*4, 2*2*2+2*4*4)
      val mm = s.sql(
        """SELECT vec_moments_fp(v, 1, 2, 1) AS m FROM VALUES
          |  (array(CAST(1.0 AS FLOAT), CAST(2.0 AS FLOAT))),
          |  (array(CAST(3.0 AS FLOAT), CAST(4.0 AS FLOAT))) AS t(v)""".stripMargin)
        .head().getStruct(0)
      assert(mm.getLong(0) == 2L)
      assert(mm.getSeq[Long](1) == Seq(8L, 12L))
      assert(mm.getSeq[Long](2) == Seq(20L, 28L, 40L))
      // literal validation applies across the surface, not just hash_embed
      val bad = intercept[org.apache.spark.sql.AnalysisException] {
        s.sql("SELECT shingles('a b', 0)").head()
      }
      assert(bad.getMessage.contains("shingles"))
      // fp_bits >= 63 would wrap (1L << n masks n to 6 bits) — must be
      // an analysis error, not a silently negative fixed-point scale
      val wrap = intercept[org.apache.spark.sql.AnalysisException] {
        s.sql("SELECT vec_moments_fp(array(CAST(1.0 AS FLOAT)), 63, 1, 0)").head()
      }
      assert(wrap.getMessage.contains("fp_bits"))
    } finally {
      // do not stop: the SparkContext is shared with the suite session
      s.catalog.clearCache()
      prevDefault.fold(SparkSession.clearDefaultSession())(SparkSession.setDefaultSession)
      prevActive.fold(SparkSession.clearActiveSession())(SparkSession.setActiveSession)
    }
  }
}
