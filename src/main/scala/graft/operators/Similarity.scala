package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Similarity search over embedding columns (SURVEY.md §2D).
  *
  * Vectors are `array<float>` columns; all arithmetic runs through
  * codegen'd higher-order functions (`zip_with` + `aggregate`) in
  * double precision — no UDFs, no driver-side math.
  *
  * Scale paths:
  *  - brute-force top-k: broadcast the (small) query set against a
  *    scan of the corpus — zero shuffle for scoring, one shuffle for
  *    the per-query top-k (TakeOrdered via window row_number).
  *  - LSH top-k: random-hyperplane signatures bucket the corpus; only
  *    same-bucket pairs are scored. Signature planes are derived from
  *    xxhash64(bit, dim) so they are deterministic, identical on every
  *    executor, and never shipped.
  */
object Similarity {

  /** Dot product of two float-array columns, accumulated in double
    * (fixed left-to-right order → deterministic).
    */
  def dot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")),
      lit(0.0), (acc, x) => acc + x)

  def l2norm(a: Column): Column =
    sqrt(aggregate(a, lit(0.0), (acc, x) => acc + x.cast("double") * x.cast("double")))

  /** `bits`-bit random-hyperplane signature. Plane component (i, j) is
    * ±1 by the parity of xxhash64(i, ':', j) — deterministic pseudo-
    * randomness with no stored plane matrix.
    */
  def signature(vec: Column, bits: Int): Column = {
    val c = expr(
      s"""aggregate(sequence(0, ${bits - 1}), cast(0 as bigint), (acc, i) ->
         |  acc * 2 + if(
         |    aggregate(zip_with(embedding, sequence(0, size(embedding) - 1),
         |      (x, j) -> cast(x as double) * (cast(xxhash64(concat(cast(i as string), ':', cast(j as string))) % 2 as double) * 2 + 1)),
         |      cast(0 as double), (a, x) -> a + x) >= 0, 1, 0))""".stripMargin)
    c
  }

  /** Exact cosine top-k: every query vector against the full corpus.
    * `queries` must be small (it is broadcast).
    */
  def topKBruteForce(corpus: DataFrame, queries: DataFrame, k: Int): DataFrame = {
    val q = queries.select(col("vec_id").as("query_id"), col("embedding").as("_qe"))
    val c = corpus.select(col("vec_id").as("neighbor_id"), col("embedding").as("_ce"))
    val scored = c.join(broadcast(q), col("query_id") =!= col("neighbor_id"))
      .withColumn("cosine", dot(col("_qe"), col("_ce")) / (l2norm(col("_qe")) * l2norm(col("_ce"))))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cosine").desc, col("neighbor_id"))
    scored
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("rank"), col("neighbor_id"), round(col("cosine"), 4).as("cosine"))
  }

  /** Approximate top-k: score only within matching hyperplane-sign
    * buckets. Recall trades off with `bits`; at scale the bucket join
    * replaces the full cross product.
    */
  def topKLsh(corpus: DataFrame, queries: DataFrame, k: Int, bits: Int = 8): DataFrame = {
    val q = queries
      .withColumn("_sig", signature(col("embedding"), bits))
      .select(col("vec_id").as("query_id"), col("embedding").as("_qe"), col("_sig"))
    val c = corpus
      .withColumn("_sig", signature(col("embedding"), bits))
      .select(col("vec_id").as("neighbor_id"), col("embedding").as("_ce"), col("_sig"))
    val scored = c.join(broadcast(q), Seq("_sig"))
      .filter(col("query_id") =!= col("neighbor_id"))
      .withColumn("cosine", dot(col("_qe"), col("_ce")) / (l2norm(col("_qe")) * l2norm(col("_ce"))))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cosine").desc, col("neighbor_id"))
    scored
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("rank"), col("neighbor_id"), round(col("cosine"), 4).as("cosine"))
  }
}
