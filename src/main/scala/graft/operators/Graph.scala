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
    // Pin the edge layout ON src ONCE: localCheckpoint preserves the
    // repartition's hash partitioning in the LogicalRDD, so every
    // superstep's contribution join reuses it instead of re-shuffling
    // the O(edges) relation per iteration (at 10× corpus the edge
    // re-shuffle dominated the 34.6 s wall). The rank relation arrives
    // hash-partitioned on doc_id (aliased to src) from the previous
    // superstep, so the only per-superstep exchange left is the
    // dst-keyed contribution aggregate.
    val edges = pairs.select(col("doc_a").as("src"), col("doc_b").as("dst"))
      .unionByName(pairs.select(col("doc_b").as("src"), col("doc_a").as("dst")))
      .repartition(col("src"))
      .localCheckpoint()
    val degRel = edges.groupBy(col("src")).agg(count(lit(1)).as("deg"))
    // nodeDeg pinned on doc_id for the same reason: the per-superstep
    // rank update joins it with the dst-partitioned contribution
    // relation on doc_id === dst — compatible layouts, zero exchange.
    val nodeDeg = nodes
      .join(degRel, col("doc_id") === col("src"), "left")
      .select(col("doc_id"), coalesce(col("deg"), lit(0L)).as("deg"))
      .repartition(col("doc_id"))
      .localCheckpoint()
    // Dangling mass is a DRIVER-SIDE scalar recurrence, not a per-
    // superstep aggregate job: symmetrized edges mean a zero-out-degree
    // node also has zero in-degree, so every dangler carries the SAME
    // rank v_t (v_0 = 1/n; v_t = 0.15/n + 0.85·m_{t-1}/n) and the
    // oracle's decimal(38,20) sum over danglers is exactly
    // D × dec(v_t) — reproduced below with Spark's own Decimal cast so
    // the doubles stay bit-identical to the old aggregate (and to the
    // unchanged unrolled DuckDB oracle). This removes two jobs per
    // superstep (the dangling aggregate + its broadcast); the remaining
    // per-superstep exchange is the one O(edges) contribution shuffle.
    val cnts = nodeDeg.agg(count(lit(1)).as("n"),
      count(when(col("deg") === 0, 1)).as("d")).head()
    val n = cnts.getLong(0)
    val nDangling = cnts.getLong(1)
    // m_t as the oracle computes it: per-dangler cast to decimal(38,20)
    // (Spark Cast semantics via types.Decimal), exact sum, cast back to
    // double for the update expression.
    def danglingMassDouble(v: Double): Double =
      if (nDangling == 0L) 0.0
      else {
        val d = org.apache.spark.sql.types.Decimal(v)
        d.changePrecision(38, 20)
        d.toJavaBigDecimal
          .multiply(java.math.BigDecimal.valueOf(nDangling))
          .doubleValue()
      }

    val decZero = lit(0).cast("decimal(38,20)")
    var v = 1.0 / n // every dangler's current rank
    var pr = nodeDeg.select(col("doc_id"), col("deg"), lit(v).as("pr"))
    var sinceCheckpoint = 0
    for (_ <- 1 to iters) {
      val contrib = edges
        .join(pr.select(col("doc_id").as("src"),
          col("pr").as("_pr"), col("deg").as("_deg")), "src")
        .groupBy(col("dst"))
        .agg(sum((col("_pr") / col("_deg")).cast("decimal(38,20)")).as("s"))
      val mOverN = danglingMassDouble(v) / n
      // same expression tree as the oracle's
      //   0.15/n + 0.85·(coalesce(s,0)::double + m::double/n)
      // with the row-constant terms folded on the driver (identical
      // IEEE ops, so each iteration's doubles are unchanged)
      val base = 0.15 / n
      pr = nodeDeg
        .join(contrib, col("doc_id") === col("dst"), "left")
        .select(col("doc_id"), col("deg"),
          (lit(base) + lit(0.85) *
            (coalesce(col("s"), decZero).cast("double") + lit(mOverN))).as("pr"))
      v = base + 0.85 * (0.0 + mOverN)
      sinceCheckpoint += 1
      // truncate lineage every few supersteps instead of every one —
      // rank rows are consumed exactly once per superstep, so the only
      // cost of a deeper plan is analysis time, not recompute
      if (sinceCheckpoint >= 3) {
        pr = pr.localCheckpoint(true)
        sinceCheckpoint = 0
      }
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
