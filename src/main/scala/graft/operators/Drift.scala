package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Distribution-drift monitoring for corpus curation: the exact
  * two-sample Kolmogorov–Smirnov statistic of each group's value
  * distribution against the whole corpus — "did src7's document-length
  * profile shift away from the corpus?" is the standard gate before a
  * new crawl snapshot is admitted into a training mix.
  *
  * Scale shape (100 TB): the ONLY corpus-sized job is the first
  * map-side-combinable histogram aggregate on (group, value); every
  * exchange after it carries histogram rows bounded by
  * |groups| × |distinct values| (document lengths: ≤ a few 10⁵ rows
  * regardless of corpus bytes). The per-group ECDF window partitions by
  * group — each partition is one group's distinct-value list, never its
  * rows — and the global ECDF window runs on the distinct-value
  * relation alone. No global sort of data, no all-pairs anything.
  *
  * Exactness: the KS sup |F_g(x) − F(x)| over the reals is attained at
  * a jump point of either ECDF, and every group's jump points are a
  * subset of the corpus's value set, so evaluating at each global
  * distinct value after its jump is exact, not a grid approximation.
  * All cumulative counts are integers; each quotient is one
  * correctly-rounded IEEE division of exact integers, so Spark and the
  * DuckDB oracle produce bit-identical doubles with no rounding step.
  */
object Drift {

  /** (group, n, ks): per-group exact KS statistic of `value` vs the
    * global distribution, with the group's row count.
    */
  def ksPerGroup(df: DataFrame, group: Column, value: Column): DataFrame = {
    val per = df.select(group.as("grp"), value.cast("long").as("v"))
      .groupBy(col("grp"), col("v")).agg(count(lit(1)).as("c"))
    // histogram-sized relations from here on
    val tot = per.groupBy(col("grp")).agg(sum(col("c")).as("n"))
    val glob = per.groupBy(col("v")).agg(sum(col("c")).as("gc"))
    // global ECDF over the distinct-value relation only
    val gcum = glob
      .withColumn("gcum", sum(col("gc")).over(Window.orderBy(col("v"))))
      .select(col("v"), col("gcum"))
    val gtot = per.agg(sum(col("c")).as("g")) // 1-row broadcast aggregate
    // every group evaluated at every global jump point
    val grid = per.select(col("grp")).distinct().crossJoin(broadcast(gcum))
    val wg = Window.partitionBy(col("grp")).orderBy(col("v"))
    grid
      .join(per, Seq("grp", "v"), "left")
      .na.fill(0L, Seq("c"))
      .withColumn("cs", sum(col("c")).over(wg))
      .crossJoin(broadcast(gtot))
      .join(broadcast(tot), "grp")
      .groupBy(col("grp"), col("n"))
      .agg(max(abs(col("cs").cast("double") / col("n").cast("double") -
        col("gcum").cast("double") / col("g").cast("double"))).as("ks"))
  }

  /** Per-group Pearson χ² of a CATEGORICAL column against the corpus
    * marginal (the companion of [[ksPerGroup]] for discrete features:
    * does source S's language mix drift from the corpus?). All counts
    * are exact integers; each expected cell `e = rowTot·colTot/grand`
    * is ONE double expression materialized as a column so both engines
    * square-and-divide the same stored double; per-group sums run in
    * decimal. Exchange = observed cells (groups × categories), never
    * rows. Output: (group, n, df, chi2).
    */
  def chi2PerGroup(df: DataFrame, group: Column, category: Column): DataFrame = {
    val cells = df.groupBy(group.as("grp"), category.as("cat"))
      .agg(count(lit(1)).as("o"))
    val rows = cells.groupBy(col("grp")).agg(sum(col("o")).as("rt"))
    val cols = cells.groupBy(col("cat")).agg(sum(col("o")).as("ct"))
    val grand = cells.agg(sum(col("o")).as("g"))
    val nCats = cells.select(col("cat")).distinct().count()
    // the full groups × categories grid: a group's MISSING categories
    // contribute (0 − e)²/e and must not be dropped
    rows.crossJoin(broadcast(cols))
      .join(cells, Seq("grp", "cat"), "left")
      .withColumn("o", coalesce(col("o"), lit(0L)))
      .crossJoin(broadcast(grand))
      .withColumn("e",
        col("rt").cast("double") * col("ct").cast("double") / col("g").cast("double"))
      .withColumn("_t",
        ((col("o").cast("double") - col("e")) * (col("o").cast("double") - col("e"))
          / col("e")).cast("decimal(28,12)"))
      .groupBy(col("grp"), col("rt"))
      .agg(sum(col("_t")).cast("double").as("chi2"))
      .select(col("grp"), col("rt").as("n"), lit(nCats - 1).as("df"),
        round(col("chi2"), 6).as("chi2"))
  }

  /** Per-group Population Stability Index of a pre-bucketed column vs
    * the corpus marginal: PSI = Σ_b (p_b − q_b)·ln(p_b/q_b) — the
    * banded-histogram drift number ops teams alarm on (>0.25 = major
    * shift), completing the family: KS (continuous), χ² (categorical),
    * PSI (banded). Zero cells are handled by the add-½ (Laplace)
    * smoothing on BOTH sides — p = (o+½)/(n+B/2) — which keeps every
    * log finite and is a pure function of exact integer counts, so
    * both engines evaluate the identical double expression tree;
    * per-group term sums run in decimal and round at 6.
    *
    * Scale shape: identical to [[chi2PerGroup]] — one corpus-sized
    * map-side-combinable cell aggregate, then everything is bounded by
    * groups × buckets (B is a fixed banding, e.g. 10 length bands).
    */
  def psiPerGroup(df: DataFrame, group: Column, bucket: Column): DataFrame = {
    val cells = df.groupBy(group.as("grp"), bucket.as("b"))
      .agg(count(lit(1)).as("o"))
    val rows = cells.groupBy(col("grp")).agg(sum(col("o")).as("n"))
    val glob = cells.groupBy(col("b")).agg(sum(col("o")).as("gb"))
    val grand = cells.agg(sum(col("o")).as("g"))
    val nB = cells.select(col("b")).distinct().count()
    val half = lit(nB.toDouble / 2.0)
    // full groups × observed-buckets grid: a group's EMPTY band is
    // exactly the drift signal, it must not be dropped
    val p = (col("o").cast("double") + lit(0.5)) / (col("n").cast("double") + half)
    val q = (col("gb").cast("double") + lit(0.5)) / (col("g").cast("double") + half)
    rows.crossJoin(broadcast(glob))
      .join(cells, Seq("grp", "b"), "left")
      .withColumn("o", coalesce(col("o"), lit(0L)))
      .crossJoin(broadcast(grand))
      .withColumn("_t", ((p - q) * log(p / q)).cast("decimal(28,12)"))
      .groupBy(col("grp"), col("n"))
      .agg(sum(col("_t")).cast("double").as("psi"))
      .select(col("grp"), col("n"), lit(nB).as("n_buckets"),
        round(col("psi"), 6).as("psi"))
  }
}
