package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

import graft.functions.GraftFunctions

/** SQ8 scalar-quantization ANN: the third point on the
  * compression/recall curve next to PQ and IVF-PQ (operators/Pq.scala).
  * Each dimension is quantized independently onto a 256-point uniform
  * grid between the corpus per-dim min and max — 1 byte/dim, so a
  * 64-dim float32 embedding column shrinks 4× (8× vs double arrays)
  * through the persisted index and every scan, with NO codebook
  * training and exact, partitioning-independent parameters (min/max
  * are order-free aggregates, unlike k-means).
  *
  * Search = norm-corrected ADC against the codes (the query side stays
  * full precision; the reconstruction never materializes — one fused
  * codegen kernel per candidate), then exact cosine re-rank of the
  * ADC top-(rerankMult·k), the same re-rank tail as PQ.
  *
  * 100 TB shape: the grid relation is 2·d doubles (broadcast as
  * expression constants); the corpus contributes one map-side-combined
  * min/max aggregate and then never shuffles — candidates leave the
  * scan as (query_id, neighbor_id, adc) partials into the bounded-heap
  * top-k aggregate, and only the re-rank fetch-join touches true
  * vectors for rerankMult·k·nq rows.
  */
object Sq8 {

  /** The grid as a RELATION — (j, mn, mx), `dim` rows — the persisted
    * form of the SQ8 parameters ([[gridFrom]] rehydrates the arrays;
    * doubles roundtrip parquet exactly, so a persisted grid serves
    * bit-identical searches).
    */
  def gridRelation(corpus: DataFrame): DataFrame =
    corpus
      .select(posexplode(col("embedding")).as(Seq("j", "v")))
      .groupBy(col("j"))
      .agg(min(col("v").cast("double")).as("mn"), max(col("v").cast("double")).as("mx"))

  /** (mins, scales) arrays from a [[gridRelation]] (live or persisted) —
    * a `dim`-row bounded collect.
    */
  private[graft] def gridFrom(rel: DataFrame, dim: Int): (Array[Double], Array[Double]) = {
    val mins = new Array[Double](dim)
    val scales = new Array[Double](dim)
    rel.select(col("j"), col("mn"), col("mx")).collect().foreach { r =>
      val j = r.getInt(0)
      mins(j) = r.getDouble(1)
      scales(j) = (r.getDouble(2) - r.getDouble(1)) / 255.0
    }
    (mins, scales)
  }

  /** Per-dimension (min, scale) grid from one exact corpus aggregate. */
  private[graft] def grid(corpus: DataFrame, dim: Int): (Array[Double], Array[Double]) =
    gridFrom(gridRelation(corpus), dim)

  /** The persisted SQ8 serving relation: 1-byte/dim codes + the
    * reconstruction norm per vector.
    */
  def codedIndex(corpus: DataFrame, mins: Array[Double], scales: Array[Double]): DataFrame =
    corpus.select(col("vec_id").as("neighbor_id"),
        GraftFunctions.sq8Encode(col("embedding"), mins, scales).as("codes"))
      .withColumn("_vn", GraftFunctions.sq8ReconNorm(col("codes"), mins, scales))

  def topKSq8(corpus: DataFrame, queries: DataFrame, k: Int,
      dim: Int = 64, rerankMult: Int = 8): DataFrame = {
    val (mins, scales) = grid(corpus, dim)
    val index = codedIndex(corpus, mins, scales)
      .persist(StorageLevel.MEMORY_AND_DISK)
    topKSq8OnIndex(index, corpus, queries, k, mins, scales, rerankMult)
  }

  /** SQ8 search over a PREBUILT (typically persisted) [[codedIndex]]
    * relation under a known grid — zero corpus aggregates at query
    * time; exact vectors enter only through the re-rank fetch-join.
    */
  def topKSq8OnIndex(index: DataFrame, corpus: DataFrame, queries: DataFrame, k: Int,
      mins: Array[Double], scales: Array[Double], rerankMult: Int = 8): DataFrame = {
    val q = queries.select(col("vec_id").as("query_id"), col("embedding").as("_qe"),
      GraftFunctions.vecNorm(col("embedding")).as("_qn"))
    val adc = index.join(broadcast(q), col("query_id") =!= col("neighbor_id"))
      .withColumn("cosine",
        GraftFunctions.sq8Adc(col("_qe"), col("codes"), mins, scales) /
          (col("_qn") * col("_vn")))
    val qnorms = queries.select(col("vec_id").as("query_id"),
      GraftFunctions.vecNorm(col("embedding")).as("_qn"))
    Pq.rerankTopK(adc, corpus, queries, qnorms, k, rerankMult)
  }
}
