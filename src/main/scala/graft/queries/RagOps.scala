package graft.queries

import graft.Tables
import graft.functions.GraftFunctions
import graft.operators.Mmr
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Retrieval/serving-side operators (SURVEY.md §2D, round-4b): the
  * chunk → embed → retrieve → diversify path a RAG or retrieval-
  * augmented training pipeline runs downstream of curation.
  */
object RagOps {

  type Q = (SparkSession, String) => DataFrame

  private val W = 50 // chunk window (words)
  private val S = 30 // chunk stride (words) -> 20-word overlap

  /** The chunk relation (unordered) — shared by [[chunk_overlap]] and
    * [[pipeline_rag_index]].
    */
  private def chunksOf(docs: DataFrame): DataFrame =
    docs
      .select(col("doc_id"), split(rtrim(col("text")), " ").as("ws"))
      .withColumn("n", size(col("ws")).cast("long"))
      .select(col("doc_id"), col("n"), col("ws"),
        explode(sequence(lit(1L), col("n"), lit(S.toLong))).as("s"))
      .filter(col("s") === 1L || col("s") + lit((W - S - 1).toLong) < col("n"))
      .select(col("doc_id"),
        expr(s"cast((s - 1) div $S as int)").as("chunk_id"),
        col("s").as("start_word"),
        least(lit(W.toLong), col("n") - col("s") + 1).as("n_words"),
        array_join(slice(col("ws"), col("s").cast("int"), lit(W)), " ").as("chunk_text"))

  /** Overlapping word-window chunking (window 50, stride 30): the
    * standard RAG splitter shape. Pure shuffle-free scan — `sequence`
    * enumerates chunk starts inside the row, `slice`+`array_join`
    * assemble each chunk, all codegen built-ins. Tail rule: a start is
    * emitted iff it is the first OR the previous window did not
    * already reach the end of the doc (`s + W−S−1 < n`), so the last
    * chunk always covers the tail and no chunk is a suffix of its
    * predecessor. chunk_id = (s−1) div S stays consecutive after the
    * tail drop. At 100 TB this is the map-side explode that feeds the
    * embedding UDF batches — rows grow ~n_words/S per doc, no
    * exchange anywhere.
    */
  def chunk_overlap(spark: SparkSession, dir: String): DataFrame =
    chunksOf(Tables(spark, dir, "documents"))
      .orderBy(col("doc_id"), col("chunk_id"))

  /** MMR-diversified retrieval (λ=0.7, top-5 from the exact top-20
    * pool) — see operators/Mmr.scala for the scale shape. Fixture-
    * gated against make_expected.gen_sim_mmr_rerank.
    */
  def sim_mmr_rerank(spark: SparkSession, dir: String): DataFrame = {
    val emb = Tables(spark, dir, "embeddings")
    Mmr.rerank(emb, emb.filter(col("vec_id") < 8), kCand = 20, k = 5, lambda = 0.7)
      .orderBy(col("query_id"), col("rank"))
  }

  /** Query-STREAM ANN serving over the static corpus (see
    * streaming/StreamingAnn.scala) — drained ≡ batch
    * [[LlmOps.sim_topk_bruteforce]], gated by the same fixture.
    */
  def sim_topk_stream(spark: SparkSession, dir: String): DataFrame = {
    GraftFunctions.register(spark)
    graft.streaming.StreamingAnn.runTopK(spark, Tables(spark, dir, "embeddings"))
      .orderBy(col("query_id"), col("rank"))
  }

  /** The full chunk-level retrieval path in ONE Catalyst plan: chunk →
    * feature-hash embed (hashing-trick bag-of-words, the real
    * technique — a learned encoder would slot into the same column) →
    * exact cosine top-5 chunks per keyword query. Everything stays in
    * the scan: chunking is a `sequence`/`slice` explode, embedding is
    * one codegen kernel per chunk, queries are a broadcast 4-row
    * relation, and ranking is the bounded-heap aggregate on a packed
    * (doc_id«32 | chunk_id) key — the corpus never shuffles, the only
    * exchange carries per-query heap partials. All arithmetic is
    * exact-integer-in-double (hash counts, correctly-rounded sqrt), so
    * the committed fixture is reproduced bit-for-bit by the pure-Python
    * mirror (make_expected.gen_pipeline_rag_index).
    */
  def pipeline_rag_index(spark: SparkSession, dir: String): DataFrame = {
    import graft.operators.Similarity
    val dim = 16
    val chunks = chunksOf(Tables(spark, dir, "documents"))
      .withColumn("_ce", GraftFunctions.hashEmbed(col("chunk_text"), dim))
      .withColumn("_cn", Similarity.l2norm(col("_ce")))
      .filter(col("_cn") > 0) // hash-cancelled chunks have no direction
      // Pack (doc_id, chunk_id) into one long for the top-k heap: doc_id
      // in the high 32 bits, chunk_id in the low 32. chunk_id is an Int
      // (< 2^31, i.e. any document under ~2^31 words chunks safely) and
      // the pack supports doc_id < 2^31 — wide enough for billions of
      // docs; beyond that the id would need a struct key, not a long.
      .withColumn("_cid", shiftleft(col("doc_id"), 32) + col("chunk_id"))
    val q = {
      import spark.implicits._
      graft.operators.Bm25.defaultQueries.toDF("query_id", "qtext")
        .withColumn("_qe", GraftFunctions.hashEmbed(col("qtext"), dim))
        .withColumn("_qn", Similarity.l2norm(col("_qe")))
    }
    val scored = chunks.crossJoin(broadcast(q))
      .withColumn("cosine",
        Similarity.dot(col("_qe"), col("_ce")) / (col("_qn") * col("_cn")))
    scored
      .groupBy(col("query_id"))
      .agg(GraftFunctions.topKAgg(col("cosine"), col("_cid"), 5).as("_top"))
      .select(col("query_id"), posexplode(col("_top")).as(Seq("_pos", "_t")))
      .select(col("query_id"), (col("_pos") + 1).as("rank"),
        shiftrightunsigned(col("_t.id"), 32).as("doc_id"),
        col("_t.id").bitwiseAND(lit(0xFFFFFFFFL)).cast("int").as("chunk_id"),
        round(col("_t.score"), 4).as("cosine"))
      .orderBy(col("query_id"), col("rank"))
  }

  val queries: Map[String, Q] = Map(
    "pipeline_rag_index" -> (pipeline_rag_index _),
    "chunk_overlap" -> (chunk_overlap _),
    "sim_mmr_rerank" -> (sim_mmr_rerank _),
    "sim_topk_stream" -> (sim_topk_stream _))

  val oracles: Map[String, String] = Map(
    // identical start enumeration / slice bounds / tail rule on both
    // engines; chunk text assembled from the same word list
    "chunk_overlap" ->
      s"""WITH d AS (SELECT doc_id, string_split(rtrim(text), ' ') AS ws FROM documents),
         |s AS (SELECT doc_id, ws, len(ws)::bigint AS n, u.s::bigint AS s
         |      FROM d, unnest(range(1, len(ws)+1, $S)) AS u(s))
         |SELECT doc_id, ((s - 1) // $S)::int AS chunk_id, s AS start_word,
         |  least($W, n - s + 1) AS n_words,
         |  array_to_string(ws[s : least(s + ${W - 1}, n)], ' ') AS chunk_text
         |FROM s WHERE s = 1 OR s + ${W - S - 1} < n
         |ORDER BY doc_id, chunk_id""".stripMargin,
    "sim_mmr_rerank" -> LlmOps.fixtureSql("sim_mmr_rerank", "embeddings"),
    "pipeline_rag_index" -> LlmOps.fixtureSql("pipeline_rag_index", "documents"),
    // the streaming drain must equal batch brute force exactly
    "sim_topk_stream" -> LlmOps.fixtureSql("sim_topk_bruteforce", "embeddings"))
}
