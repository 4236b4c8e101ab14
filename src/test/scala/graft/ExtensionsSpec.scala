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
    } finally {
      // do not stop: the SparkContext is shared with the suite session
      s.catalog.clearCache()
      prevDefault.fold(SparkSession.clearDefaultSession())(SparkSession.setDefaultSession)
      prevActive.fold(SparkSession.clearActiveSession())(SparkSession.setActiveSession)
    }
  }
}
