package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Graph analytics over the duplicate-pair graph (Brin/Page PageRank;
  * the connected-components side lives in Dedup.resolve). Ranking the
  * near-dup graph surfaces template/boilerplate hubs: a page whose
  * text near-matches many others concentrates mass, exactly the docs
  * a curation pass should inspect first.
  *
  * Determinism contract (hash-gated against an UNROLLED DuckDB
  * oracle, no fixture): within an iteration every neighbor
  * contribution `pr/deg` and the dangling mass are summed as
  * decimal(38,20) — partition-order independent — and the update
  * `0.15/n + 0.85·(Σ + m/n)` is written as the same expression tree
  * on both engines, so each iteration's doubles are bit-identical.
  *
  * Scale: per iteration ONE exchange keyed by dst carrying
  * (8B id, 16B decimal) contribution partials (map-side combined);
  * the n / dangling-mass relations are 1-row broadcasts; the rank
  * vector materializes per iteration (localCheckpoint) exactly like a
  * Pregel superstep, keeping the plan shallow instead of compounding
  * 10 joins into one tree. Edges are the LSH-verified near-dup pairs
  * — O(true duplicates), never corpus².
  */
object Graph {

  /** `iters` fixed PageRank iterations (d = 0.85) over the undirected
    * pair graph; every corpus doc is a node (dangling mass uniform).
    * Output: (doc_id, deg, pr) with pr rounded to 8 decimals.
    */
  def pageRank(docs: DataFrame, pairs: DataFrame, iters: Int = 10): DataFrame = {
    val nodes = docs.select(col("doc_id"))
    val edges = pairs.select(col("doc_a").as("src"), col("doc_b").as("dst"))
      .unionByName(pairs.select(col("doc_b").as("src"), col("doc_a").as("dst")))
      .localCheckpoint()
    val degRel = edges.groupBy(col("src")).agg(count(lit(1)).as("deg"))
    val nodeDeg = nodes
      .join(degRel, col("doc_id") === col("src"), "left")
      .select(col("doc_id"), coalesce(col("deg"), lit(0L)).as("deg"))
      .localCheckpoint()
    val st = nodes.agg(count(lit(1)).as("n"))

    val decZero = lit(0).cast("decimal(38,20)")
    var pr = nodeDeg.crossJoin(broadcast(st))
      .select(col("doc_id"), col("deg"), (lit(1.0) / col("n")).as("pr"))
      .localCheckpoint()
    for (_ <- 1 to iters) {
      val contrib = edges
        .join(pr.select(col("doc_id").as("src"),
          col("pr").as("_pr"), col("deg").as("_deg")), "src")
        .groupBy(col("dst"))
        .agg(sum((col("_pr") / col("_deg")).cast("decimal(38,20)")).as("s"))
      val dangling = pr.filter(col("deg") === 0)
        .agg(coalesce(sum(col("pr").cast("decimal(38,20)")), decZero).as("m"))
      pr = nodeDeg
        .join(contrib, col("doc_id") === col("dst"), "left")
        .crossJoin(broadcast(st))
        .crossJoin(broadcast(dangling))
        .select(col("doc_id"), col("deg"),
          (lit(0.15) / col("n") + lit(0.85) *
            (coalesce(col("s"), decZero).cast("double") +
              col("m").cast("double") / col("n"))).as("pr"))
        .localCheckpoint()
    }
    pr.select(col("doc_id"), col("deg"), round(col("pr"), 8).as("pr"))
  }

  /** The matching unrolled oracle iterations; `edgeCte` must provide
    * CTEs `ed(src, dst)` and run inside a WITH chain that already
    * defined `documents`.
    */
  def pageRankOracleSql(edgeCte: String, iters: Int = 10): String = {
    val sb = new StringBuilder
    sb.append(edgeCte)
    sb.append(
      """,
        |dg AS MATERIALIZED (SELECT src, count(*)::bigint AS deg FROM ed GROUP BY 1),
        |nd AS MATERIALIZED (SELECT doc_id, coalesce(dg.deg, 0) AS deg
        |       FROM documents LEFT JOIN dg ON doc_id = dg.src),
        |st AS MATERIALIZED (SELECT count(*)::bigint AS n FROM documents),
        |p0 AS MATERIALIZED (SELECT doc_id, deg, 1e0 / st.n AS pr FROM nd CROSS JOIN st)""".stripMargin)
    for (i <- 1 to iters) {
      val prev = s"p${i - 1}"
      sb.append(
        s""",
           |c$i AS MATERIALIZED (SELECT e.dst, sum(cast(p.pr / p.deg AS decimal(38,20))) AS s
           |        FROM ed e JOIN $prev p ON e.src = p.doc_id GROUP BY 1),
           |d$i AS MATERIALIZED (SELECT coalesce(sum(cast(pr AS decimal(38,20))),
           |                        cast(0 AS decimal(38,20))) AS m
           |        FROM $prev WHERE deg = 0),
           |p$i AS MATERIALIZED (SELECT nd.doc_id, nd.deg,
           |         0.15e0 / st.n + 0.85e0 *
           |           (cast(coalesce(c$i.s, cast(0 AS decimal(38,20))) AS double)
           |            + cast(d$i.m AS double) / st.n) AS pr
           |        FROM nd LEFT JOIN c$i ON nd.doc_id = c$i.dst
           |        CROSS JOIN st CROSS JOIN d$i)""".stripMargin)
    }
    sb.append(s"\nSELECT doc_id, deg, round(pr, 8) AS pr FROM p$iters ORDER BY doc_id")
    sb.result()
  }
}
