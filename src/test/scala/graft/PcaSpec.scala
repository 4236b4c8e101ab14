package graft

import graft.operators.Pca
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Property checks for the deterministic PCA: the fixture gate proves
  * cross-engine equality; these prove the MATH — orthonormal loadings,
  * variance-ordered components, and a planted dominant direction
  * recovered.
  */
class PcaSpec extends AnyFunSuite {
  import SparkTestSession._

  private val dim = 16

  /** Deterministic pseudo-random corpus with variance concentrated on
    * a planted direction (components 0+1) plus small isotropic noise.
    */
  private def corpus(n: Int) = {
    import spark.implicits._
    (0 until n).map { i =>
      val amp = ((i * 2654435761L) % 1000).toDouble / 500.0 - 1.0
      val vec = Array.tabulate(dim) { j =>
        val noise = (((i * 31L + j * 17L) * 2654435761L) % 1000).toDouble / 50000.0
        val planted = if (j == 0) amp else if (j == 1) 0.5 * amp else 0.0
        (planted + noise).toFloat
      }
      (i.toLong, vec)
    }.toDF("vec_id", "embedding")
  }

  test("loadings are orthonormal and variance-ordered; planted direction recovered") {
    val emb = corpus(400)
    val (_, _, cov) = Pca.moments(emb, dim)
    val (vals, vecs) = Pca.jacobi(cov)
    val comps = Pca.topComponents(vals, vecs, 4)

    def dot(a: Array[Double], b: Array[Double]) =
      a.zip(b).map { case (x, y) => x * y }.sum
    comps.foreach(c => assert(math.abs(dot(c, c) - 1.0) < 1e-9, "unit norm"))
    for (i <- comps.indices; j <- comps.indices if i < j)
      assert(math.abs(dot(comps(i), comps(j))) < 1e-9, s"orthogonal $i,$j")

    // the planted direction is (1, 0.5, 0, ...) normalized
    val expect = {
      val n = math.sqrt(1.0 + 0.25)
      Array.tabulate(dim)(j => if (j == 0) 1.0 / n else if (j == 1) 0.5 / n else 0.0)
    }
    assert(math.abs(math.abs(dot(comps(0), expect)) - 1.0) < 0.01,
      s"top component aligns with planted direction: ${dot(comps(0), expect)}")

    // projections' empirical variance must be non-increasing in k
    val proj = Pca.project(emb, comps)
    val varByK = proj.groupBy(col("k"))
      .agg((sum(col("proj") * col("proj")) / count(lit(1)) -
        pow(sum(col("proj")) / count(lit(1)), 2)).as("v"))
      .collect().map(r => r.getInt(0) -> r.getDouble(1)).toMap
    for (k <- 0 until 3)
      assert(varByK(k) >= varByK(k + 1) - 1e-9, s"var($k) >= var(${k + 1})")
  }

  test("kmeans report: sizes total the corpus, ccos spread brackets the mean, partition-invariant") {
    val emb = Tables(spark, SparkTestSession.sfDir, "embeddings")
    val r = graft.operators.SemanticDedup.kmeansReport(emb).collect()
    assert(r.map(_.getLong(1)).sum == emb.count(), "every vector lands in one cluster")
    r.foreach { row =>
      val (inertia, mean, lo, hi) =
        (row.getDouble(2), row.getDouble(3), row.getDouble(4), row.getDouble(5))
      assert(inertia >= 0.0)
      assert(lo <= mean + 1e-6 && mean <= hi + 1e-6, s"mean outside [min,max]: $row")
    }
    val a = r.map(_.toString).toSeq
    val b = graft.operators.SemanticDedup.kmeansReport(emb.repartition(7))
      .collect().map(_.toString).toSeq
    assert(a == b, "report is a pure function of the corpus, not its partitioning")
  }

  test("pca output is identical across partitionings") {
    val emb = corpus(200)
    val a = Pca.pca(emb.repartition(1), dim, 3).orderBy("vec_id", "k").collect().toSeq
    val b = Pca.pca(emb.repartition(17), dim, 3).orderBy("vec_id", "k").collect().toSeq
    assert(a == b)
  }
}
