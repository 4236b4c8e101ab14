package graft.queries

import graft.Tables
import graft.operators.AsOfJoin
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import QueryUtil._

/** SQL operator surface, part C (SURVEY.md §2A extensions): exact
  * percentiles, grouping sets/cube, pivot, inline VALUES, full outer
  * join, explode/lateral, JSON functions, as-of join, approx distinct.
  */
object SqlSurfaceC {

  type Q = (SparkSession, String) => DataFrame

  /** Exact percentiles (linear interpolation) per group. */
  def q26_percentile(spark: SparkSession, dir: String): DataFrame =
    Tables(spark, dir, "lineitem")
      .groupBy(col("l_returnflag"))
      .agg(expr("percentile(l_quantity, array(0.25, 0.5, 0.75))").as("_q"))
      .select(col("l_returnflag"),
        round(element_at(col("_q"), 1), 4).as("p25"),
        round(element_at(col("_q"), 2), 4).as("p50"),
        round(element_at(col("_q"), 3), 4).as("p75"))
      .orderBy(col("l_returnflag"))

  /** GROUP BY GROUPING SETS with grouping markers. */
  def q27_grouping_sets(spark: SparkSession, dir: String): DataFrame = {
    Tables.registerAll(spark, dir)
    spark.sql(
      """SELECT l_returnflag, l_linestatus,
        | grouping(l_returnflag) AS g_flag, grouping(l_linestatus) AS g_status,
        | count(*) AS n
        |FROM lineitem
        |GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), ())
        |ORDER BY g_flag, g_status, l_returnflag NULLS FIRST, l_linestatus NULLS FIRST""".stripMargin)
  }

  /** GROUP BY CUBE over two dimensions. */
  def q28_cube(spark: SparkSession, dir: String): DataFrame =
    Tables(spark, dir, "orders")
      .cube(col("o_orderstatus"), col("o_orderpriority"))
      .agg(count(lit(1)).as("n"), decSum(money(col("o_totalprice"))).as("total"))
      .orderBy(col("o_orderstatus").asc_nulls_first, col("o_orderpriority").asc_nulls_first)

  /** PIVOT (wide conditional aggregation). */
  def q29_pivot(spark: SparkSession, dir: String): DataFrame =
    Tables(spark, dir, "orders")
      .groupBy(col("o_orderpriority"))
      .pivot("o_orderstatus", Seq("F", "O", "P"))
      .agg(count(lit(1)))
      .select(col("o_orderpriority"),
        coalesce(col("F"), lit(0L)).as("F"),
        coalesce(col("O"), lit(0L)).as("O"),
        coalesce(col("P"), lit(0L)).as("P"))
      .orderBy(col("o_orderpriority"))

  /** Inline VALUES relation joined to a table. */
  def q30_values(spark: SparkSession, dir: String): DataFrame = {
    Tables.registerAll(spark, dir)
    spark.sql(
      """SELECT v.code, n.n_name
        |FROM (VALUES (0, 'ZERO'), (1, 'ONE'), (2, 'TWO')) AS v(nk, code)
        |JOIN nation n ON n.n_nationkey = v.nk
        |ORDER BY v.nk""".stripMargin)
  }

  /** Full outer join with nulls on both sides. */
  def q31_full_outer(spark: SparkSession, dir: String): DataFrame = {
    val c = Tables(spark, dir, "customer").filter(col("c_acctbal") > 9990.0)
      .groupBy(col("c_nationkey")).agg(count(lit(1)).as("c_cnt"))
    val s = Tables(spark, dir, "supplier")
      .groupBy(col("s_nationkey")).agg(count(lit(1)).as("s_cnt"))
    c.join(s, col("c_nationkey") === col("s_nationkey"), "full_outer")
      .select(coalesce(col("c_nationkey"), col("s_nationkey")).as("nk"),
        col("c_cnt"), col("s_cnt"))
      .orderBy(col("nk"))
  }

  /** explode / lateral unnest: global word frequencies. */
  def q32_explode(spark: SparkSession, dir: String): DataFrame =
    Tables(spark, dir, "documents")
      .select(explode(split(col("text"), " ")).as("word"))
      .groupBy(col("word"))
      .agg(count(lit(1)).as("cnt"))
      .orderBy(col("cnt").desc, col("word"))
      .limit(20)

  /** JSON extraction from a string column. */
  def q33_json(spark: SparkSession, dir: String): DataFrame =
    Tables(spark, dir, "events")
      .withColumn("k_val", get_json_object(col("props"), "$.k").cast("int"))
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n"),
        sum(col("k_val").cast("long")).as("k_sum"),
        count(when(col("k_val") > 50, 1)).as("k_gt50"))
      .orderBy(col("event_type"))

  /** As-of join: each event gets the user's most recent order at or
    * before the event time (AsOfJoin operator — one shuffle, no
    * expansion).
    */
  def q34_asof_join(spark: SparkSession, dir: String): DataFrame = {
    val events = Tables(spark, dir, "events")
      .filter(col("event_id") < 5000)
      .select(col("event_id"), col("user_id"), col("ts"))
    val orders = Tables(spark, dir, "orders")
      .select(col("o_custkey"), col("o_orderdate"), col("o_orderkey"), col("o_totalprice"))
    AsOfJoin.asOf(
      events, col("user_id"), col("ts"),
      orders, col("o_custkey"), col("o_orderdate"),
      rightPayload = Seq("o_orderkey", "o_totalprice"), rightTiebreak = "o_orderkey")
      .select(col("event_id"), col("user_id"),
        col("o_orderkey").as("last_orderkey"),
        col("o_totalprice").cast("double").as("last_totalprice"))
      .orderBy(col("event_id"))
  }

  /** Banded time-range join (RangeJoin operator): for each error
    * event, the count and value-sum of click events by the same user
    * within ±2 hours.
    */
  def q36_range_join(spark: SparkSession, dir: String): DataFrame = {
    import graft.operators.RangeJoin
    val events = Tables(spark, dir, "events")
    val errors = events.filter(col("event_type") === "error")
      .select(col("event_id"), col("user_id"), col("ts"))
    val clicks = events.filter(col("event_type") === "click")
      .select(col("user_id").as("c_user"), col("ts").as("c_ts"),
        col("value").as("c_value"))
    RangeJoin.timeRangeJoin(
      errors, col("user_id"), col("ts"),
      clicks, col("c_user"), col("c_ts"), windowSec = 7200)
      .groupBy(col("event_id"), col("user_id"))
      .agg(count(lit(1)).as("n_clicks"),
        sum(col("c_value").cast(org.apache.spark.sql.types.DecimalType(18, 6))).cast("double").as("click_value"))
      .orderBy(col("event_id"))
  }

  /** INTERSECT / EXCEPT set operations (distinct semantics). */
  def q35_set_ops(spark: SparkSession, dir: String): DataFrame = {
    val custNations = Tables(spark, dir, "customer")
      .filter(col("c_acctbal") > 5000.0)
      .select(col("c_nationkey").as("nk"))
    val suppNations = Tables(spark, dir, "supplier")
      .select(col("s_nationkey").as("nk"))
    custNations.intersect(suppNations).withColumn("op", lit("intersect"))
      .unionByName(custNations.except(suppNations).withColumn("op", lit("except")))
      .select(col("op"), col("nk"))
      .orderBy(col("op"), col("nk"))
  }

  /** Disjunctive multi-clause predicate (TPC-H Q19 shape): OR of ANDs
    * across two tables — exercises CNF conversion / partial pushdown.
    */
  def q37_disjunctive(spark: SparkSession, dir: String): DataFrame = {
    val li = Tables(spark, dir, "lineitem")
    val p = Tables(spark, dir, "part")
    li.join(broadcast(p), col("l_partkey") === col("p_partkey"))
      .filter(
        (col("p_brand") === "Brand#12" && col("l_quantity").between(1, 11) && col("p_size").between(1, 5)) ||
          (col("p_brand") === "Brand#23" && col("l_quantity").between(10, 20) && col("p_size").between(1, 10)) ||
          (col("p_brand") === "Brand#34" && col("l_quantity").between(20, 30) && col("p_size").between(1, 15)))
      .agg(decSum(money(col("l_extendedprice")) * factor(lit(1) - col("l_discount"))).as("revenue"),
        count(lit(1)).as("n_rows"))
  }

  /** TPC-H Q22 shape: scalar-subquery threshold + anti join + substring
    * grouping (customers with above-average balance and no orders).
    */
  def q38_q22_shape(spark: SparkSession, dir: String): DataFrame = {
    val cust = Tables(spark, dir, "customer")
    val avgBal = cust.filter(col("c_acctbal") > 0.0)
      .agg(decAvg(money(col("c_acctbal"))).as("thr"))
    val orders = Tables(spark, dir, "orders").select(col("o_custkey"))
    cust.join(broadcast(avgBal))
      .filter(col("c_acctbal") > col("thr"))
      .join(orders.filter(col("o_custkey") % 3 === 0), // sparse order set → anti join keeps rows
        col("c_custkey") === col("o_custkey"), "left_anti")
      .groupBy(substring(col("c_name"), 10, 1).as("cntry"))
      .agg(count(lit(1)).as("numcust"),
        decSum(money(col("c_acctbal"))).as("totacctbal"))
      .orderBy(col("cntry"))
  }

  /** INTERSECT ALL / EXCEPT ALL — bag (multiset) set-op semantics,
    * preserving duplicate multiplicities (min for intersect,
    * difference for except).
    */
  def q39_set_ops_all(spark: SparkSession, dir: String): DataFrame = {
    val custNations = Tables(spark, dir, "customer")
      .filter(col("c_acctbal") > 5000.0)
      .select(col("c_nationkey").as("nk"))
    val suppNations = Tables(spark, dir, "supplier")
      .select(col("s_nationkey").as("nk"))
    custNations.intersectAll(suppNations).withColumn("op", lit("intersect_all"))
      .unionByName(custNations.exceptAll(suppNations).withColumn("op", lit("except_all")))
      .groupBy(col("op"), col("nk")).agg(count(lit(1)).as("multiplicity"))
      .orderBy(col("op"), col("nk"))
  }

  /** UNPIVOT (wide → long): per-order measure columns melted into
    * (measure, value) rows via `stack` — the inverse of q29_pivot.
    */
  def q40_unpivot(spark: SparkSession, dir: String): DataFrame =
    Tables(spark, dir, "orders")
      .filter(col("o_orderkey") <= 200)
      .select(col("o_orderkey"),
        expr("stack(2, 'totalprice', cast(cast(o_totalprice as decimal(12,2)) as double), " +
          "'custkey', cast(o_custkey as double)) as (measure, value)"))
      .orderBy(col("o_orderkey"), col("measure"))

  /** Window navigation functions: lag/lead with defaults, first/last
    * value over a running frame, nth_value — per-customer order
    * timeline.
    */
  def q41_window_nav(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("o_custkey"))
      .orderBy(col("o_orderdate"), col("o_orderkey"))
    val wRun = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    Tables(spark, dir, "orders")
      .filter(col("o_custkey") <= 300)
      .select(col("o_custkey"), col("o_orderkey"), col("o_orderdate"),
        lag(col("o_orderkey"), 1, -1L).over(w).as("prev_key"),
        lead(col("o_orderkey"), 1, -1L).over(w).as("next_key"),
        first(col("o_orderkey")).over(wRun).as("first_key"),
        nth_value(col("o_orderkey"), 2).over(wRun).as("second_key"),
        datediff(col("o_orderdate").cast("date"),
          lag(col("o_orderdate"), 1).over(w).cast("date")).as("days_since_prev"))
      .orderBy(col("o_custkey"), col("o_orderdate"), col("o_orderkey"))
  }

  /** Correlation / covariance / stddev computed from exact decimal
    * power sums (Σx, Σy, Σx², Σxy, Σy²) combined in double with an
    * oracle-identical expression tree. Spark's own corr/stddev are
    * streaming merge formulas whose doubles depend on partial-agg
    * order — this form is the partition-order-DETERMINISTIC way to
    * ship second-moment statistics at scale (one map-side-combinable
    * aggregate, exchange = groups × 6 decimals).
    */
  def q42_corr_stats(spark: SparkSession, dir: String): DataFrame = {
    val qty = money(col("l_quantity"))
    val price = money(col("l_extendedprice"))
    val g = Tables(spark, dir, "lineitem")
      .groupBy(col("l_returnflag"))
      .agg(count(lit(1)).as("n"),
        sum(qty).as("_sx"), sum(price).as("_sy"),
        sum(qty * qty).as("_sxx"), sum(qty * price).as("_sxy"),
        sum(price * price).as("_syy"))
    val kd = col("n").cast("double")
    val (sx, sy) = (col("_sx").cast("double"), col("_sy").cast("double"))
    val (sxx, sxy, syy) =
      (col("_sxx").cast("double"), col("_sxy").cast("double"), col("_syy").cast("double"))
    // round(…, 6) on BOTH sides: the moments are exact decimals, but
    // their cast to double is engine-rounded — Spark goes through
    // BigDecimal.doubleValue, DuckDB through its own int128·10^-s
    // path — and a >2^53 moment can land one ulp apart (observed at
    // sf0.001: stddev_price …431945 vs …431952), flipping the strict
    // hash compare on data luck. Six decimals keeps the statistics
    // and absorbs the ulp.
    g.select(col("l_returnflag"), col("n"),
      round((kd * sxy - sx * sy) /
        (sqrt(kd * sxx - sx * sx) * sqrt(kd * syy - sy * sy)), 6).as("corr_qty_price"),
      round((kd * sxy - sx * sy) / (kd * kd), 6).as("covar_pop"),
      round(sqrt(kd * sxx - sx * sx) / kd, 6).as("stddev_qty"),
      round(sqrt(kd * syy - sy * sy) / kd, 6).as("stddev_price"))
      .orderBy(col("l_returnflag"))
  }

  /** Correlated LATERAL subquery with per-row ORDER BY/LIMIT — top-2
    * orders per customer without a window function; the same SQL text
    * runs on both engines (Spark plans a lateral join; DuckDB a
    * dependent join).
    */
  def q43_lateral(spark: SparkSession, dir: String): DataFrame = {
    graft.Tables.registerAll(spark, dir)
    spark.sql(
      """SELECT c_custkey, t.o_orderkey, t.o_totalprice
        |FROM customer, LATERAL (
        |  SELECT o_orderkey, o_totalprice FROM orders
        |  WHERE o_custkey = c_custkey
        |  ORDER BY o_totalprice DESC, o_orderkey LIMIT 2) t
        |WHERE c_custkey <= 200
        |ORDER BY c_custkey, o_totalprice DESC, o_orderkey""".stripMargin)
  }

  /** WITH RECURSIVE (new in Spark 4): a weekly calendar spine from the
    * events table's own bounds, left-joined to per-week signup counts —
    * gap weeks appear as zero rows. The same SQL text runs on DuckDB.
    */
  def q44_recursive(spark: SparkSession, dir: String): DataFrame = {
    graft.Tables.registerAll(spark, dir)
    spark.sql(
      """WITH RECURSIVE bounds AS (
        |  SELECT cast(floor(cast(min(ts) as double) / 604800) as bigint) AS w0,
        |         cast(floor(cast(max(ts) as double) / 604800) as bigint) AS w1
        |  FROM events),
        |spine(w) AS (
        |  SELECT w0 FROM bounds
        |  UNION ALL
        |  SELECT w + 1 FROM spine, bounds WHERE w < w1),
        |su AS (
        |  SELECT cast(floor(cast(ts as double) / 604800) as bigint) AS w,
        |         count(*) AS n
        |  FROM events WHERE event_type = 'signup' GROUP BY 1)
        |SELECT spine.w AS week, coalesce(su.n, 0) AS n_signups
        |FROM spine LEFT JOIN su ON spine.w = su.w
        |ORDER BY week""".stripMargin)
  }

  /** Window DISTRIBUTION functions — percent_rank / cume_dist /
    * ntile — over each nation's customer balances (dense_rank breaks
    * the (balance) tie for a deterministic ntile); completes the §2A
    * window family next to q14 (ranking) and q41 (navigation).
    */
  def q45_window_dist(spark: SparkSession, dir: String): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("c_nationkey"))
      .orderBy(col("c_acctbal"), col("c_custkey"))
    Tables(spark, dir, "customer")
      .filter(col("c_custkey") <= 300)
      .select(col("c_nationkey"), col("c_custkey"), col("c_acctbal"),
        round(percent_rank().over(w), 4).as("pr"),
        round(cume_dist().over(w), 4).as("cd"),
        ntile(4).over(w).as("quartile"))
      .orderBy(col("c_nationkey"), col("c_acctbal"), col("c_custkey"))
  }

  /** RANGE window frame (value-based, not row-based): per customer, a
    * 30-day trailing spend window over the order timeline. RANGE
    * frames include all PEER rows of the current order date, so the
    * result is deterministic under ties without a row-order
    * tie-break — the frame semantics row/range differ on is exactly
    * what this query pins. Day numbers are epoch-day via datediff
    * from 1970-01-01 (tz-free — o_orderdate is TIMESTAMP_NTZ); the
    * sum runs in exact decimal. One customer-keyed shuffle; the
    * frame is evaluated partition-locally.
    */
  def q46_range_frame(spark: SparkSession, dir: String): DataFrame = {
    val day = datediff(col("o_orderdate").cast("date"),
      to_date(lit("1970-01-01"))).cast("long")
    val w = Window.partitionBy(col("o_custkey")).orderBy(col("day"))
      .rangeBetween(-30, Window.currentRow)
    Tables(spark, dir, "orders")
      .filter(col("o_custkey") <= 300)
      .withColumn("day", day)
      .select(col("o_custkey"), col("o_orderkey"), col("day"),
        sum(money(col("o_totalprice"))).over(w).cast("double").as("spend_30d"),
        count(lit(1)).over(w).as("n_orders_30d"))
      .orderBy(col("o_custkey"), col("day"), col("o_orderkey"))
  }

  /** Array aggregation surface: collect_set → sort_array → array_join
    * (the LISTAGG/string_agg shape) plus size and element_at over the
    * assembled array — per-nation supplier rosters. The array is
    * assembled once per group (map-side combinable set agg) and only
    * its scalar projections ship in the result, so the oracle compare
    * stays scalar-typed.
    */
  def q47_array_agg(spark: SparkSession, dir: String): DataFrame =
    Tables(spark, dir, "supplier")
      .groupBy(col("s_nationkey").cast("int").as("nationkey"))
      .agg(sort_array(collect_set(col("s_name"))).as("_names"))
      .select(col("nationkey"),
        size(col("_names")).as("n_suppliers"),
        element_at(col("_names"), 1).as("first_supplier"),
        element_at(col("_names"), -1).as("last_supplier"),
        array_join(col("_names"), ",").as("supplier_csv"))
      .orderBy(col("nationkey"))

  /** IGNORE NULLS window modifier — last-observation-carried-forward
    * (LOCF) gap-fill, the standard sparse-time-series repair: carry
    * each user's most recent purchase value onto every later event
    * (`last(..., ignoreNulls)` over an unbounded-preceding ROWS
    * frame), plus the strictly-previous purchase via `lag(...,
    * ignoreNulls)`. The window order (ts, event_id) is total, so the
    * fill is deterministic; values are carried verbatim (no
    * arithmetic), so the compare is exact. One user-keyed shuffle,
    * partition-local frames — at 100 TB this is the per-entity
    * timeline shape that scales with users, not time.
    */
  def q48_ignore_nulls(spark: SparkSession, dir: String): DataFrame = {
    val purchase = when(col("event_type") === "purchase", col("value"))
    val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
    val locf = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    Tables(spark, dir, "events")
      .select(col("user_id"), col("event_id"), col("event_type"),
        last(purchase, ignoreNulls = true).over(locf).as("last_purchase_value"),
        lag(purchase, 1, null, ignoreNulls = true).over(w).as("prev_purchase_value"))
      .orderBy(col("user_id"), col("event_id"))
  }

  /** TRY/ANSI-safety surface — at 100 TB malformed values are a
    * statistical certainty, and the TRY family turns per-row failures
    * into NULLs instead of job aborts: `try_cast` over a corrupt
    * numeric string, `try_divide` at zero denominators,
    * `try_element_at` past an array bound. Each NULL site is
    * deterministic (keyed off l_orderkey arithmetic), so the oracle
    * mirrors the semantics with guard expressions; the division is a
    * single correctly-rounded double op on both engines.
    */
  def q49_try_safety(spark: SparkSession, dir: String): DataFrame =
    Tables(spark, dir, "lineitem")
      .filter(col("l_orderkey") <= 2000)
      .select(col("l_orderkey"), col("l_linenumber"),
        expr("try_cast(CASE WHEN l_orderkey % 3 = 0 THEN concat('x', l_orderkey) " +
          "ELSE cast(l_orderkey AS string) END AS bigint)").as("safe_key"),
        expr("round(try_divide(cast(l_extendedprice AS double), " +
          "cast(l_orderkey % 5 AS double)), 6)").as("safe_ratio"),
        expr("try_element_at(array(l_returnflag, l_linestatus), l_linenumber)")
          .as("safe_elem"))
      .orderBy(col("l_orderkey"), col("l_linenumber"))

  /** Higher-order array functions — the lambda surface (`aggregate`
    * fold, `filter`, `exists`, `transform`) over per-order quantity
    * arrays. Assembled once per group (sort_array makes the array a
    * deterministic value), then every HOF is a scalar projection —
    * the row never explodes back out. All-integer arithmetic
    * (l_quantity is integral; values cast to bigint), so the compare
    * is exact. Note for the hot path: Spark evaluates HOF lambdas
    * interpreted per element — fine for bounded per-group arrays like
    * these, but corpus-sized inner loops belong in codegen kernels
    * (see graftglue; measured ~1000× in SURVEY §4.1).
    */
  def q50_higher_order(spark: SparkSession, dir: String): DataFrame =
    Tables(spark, dir, "lineitem")
      .filter(col("l_orderkey") <= 2000)
      .groupBy(col("l_orderkey").as("o_orderkey"))
      .agg(sort_array(collect_list(col("l_quantity").cast("long"))).as("_q"))
      .select(col("o_orderkey"),
        size(col("_q")).as("n_items"),
        aggregate(col("_q"), lit(0L), (acc, x) => acc + x).as("total_qty"),
        size(filter(col("_q"), x => x >= 25)).as("n_heavy"),
        exists(col("_q"), x => x === 50).as("has_max"),
        element_at(transform(col("_q"), x => x * 2), 1).as("first_doubled"))
      .orderBy(col("o_orderkey"))

  /** HLL approximate distinct, HARD-gated: the raw HLL++ estimate is a
    * function of the value SET (register maxes — order- and
    * partitioning-independent) but not DuckDB-reproducible, so the
    * gated columns are the exact count plus a Spark-side
    * within-tolerance boolean the oracle pins to `true` (the
    * quality_quantiles_approx convention). 3× the default 5% rsd
    * bounds the estimate at ~3 standard errors — a real HLL regression
    * (wrong hashing, dropped registers) trips it, ulp luck can't.
    */
  def approx_distinct(spark: SparkSession, dir: String): DataFrame =
    Tables(spark, dir, "lineitem")
      .groupBy(col("l_returnflag"))
      .agg(approx_count_distinct(col("l_partkey")).as("_approx"),
        countDistinct(col("l_partkey")).as("exact_parts"))
      .select(col("l_returnflag"), col("exact_parts"),
        (abs(col("_approx") - col("exact_parts")) <=
          col("exact_parts") * lit(0.15)).as("within_tol"))
      .orderBy(col("l_returnflag"))

  val queries: Map[String, Q] = Map(
    "q26_percentile" -> (q26_percentile _),
    "q39_set_ops_all" -> (q39_set_ops_all _),
    "q42_corr_stats" -> (q42_corr_stats _),
    "q43_lateral" -> (q43_lateral _),
    "q44_recursive" -> (q44_recursive _),
    "q45_window_dist" -> (q45_window_dist _),
    "q46_range_frame" -> (q46_range_frame _),
    "q47_array_agg" -> (q47_array_agg _),
    "q48_ignore_nulls" -> (q48_ignore_nulls _),
    "q49_try_safety" -> (q49_try_safety _),
    "q50_higher_order" -> (q50_higher_order _),
    "q40_unpivot" -> (q40_unpivot _),
    "q41_window_nav" -> (q41_window_nav _),
    "q27_grouping_sets" -> (q27_grouping_sets _),
    "q28_cube" -> (q28_cube _),
    "q29_pivot" -> (q29_pivot _),
    "q30_values" -> (q30_values _),
    "q31_full_outer" -> (q31_full_outer _),
    "q32_explode" -> (q32_explode _),
    "q33_json" -> (q33_json _),
    "q34_asof_join" -> (q34_asof_join _),
    "q35_set_ops" -> (q35_set_ops _),
    "q36_range_join" -> (q36_range_join _),
    "q37_disjunctive" -> (q37_disjunctive _),
    "q38_q22_shape" -> (q38_q22_shape _),
    "approx_distinct" -> (approx_distinct _))

  val oracles: Map[String, String] = Map(
    // all-integer lambdas; Spark aggregate(0, +) == DuckDB list_reduce
    // on the same non-empty sorted bigint arrays
    "q50_higher_order" ->
      """SELECT o_orderkey,
        |  cast(len(q) as int) AS n_items,
        |  list_reduce(q, (a, b) -> a + b) AS total_qty,
        |  cast(len(list_filter(q, x -> x >= 25)) as int) AS n_heavy,
        |  len(list_filter(q, x -> x = 50)) > 0 AS has_max,
        |  list_transform(q, x -> x * 2)[1] AS first_doubled
        |FROM (SELECT l_orderkey AS o_orderkey,
        |        list_sort(list(l_quantity::bigint)) AS q
        |      FROM lineitem WHERE l_orderkey <= 2000 GROUP BY 1)
        |ORDER BY o_orderkey""".stripMargin,
    "q49_try_safety" ->
      """SELECT l_orderkey, l_linenumber,
        |  try_cast(CASE WHEN l_orderkey % 3 = 0 THEN 'x' || l_orderkey
        |           ELSE l_orderkey::varchar END AS bigint) AS safe_key,
        |  round(CASE WHEN l_orderkey % 5 = 0 THEN NULL
        |        ELSE l_extendedprice::double / (l_orderkey % 5)::double END, 6) AS safe_ratio,
        |  [l_returnflag, l_linestatus][l_linenumber] AS safe_elem
        |FROM lineitem WHERE l_orderkey <= 2000
        |ORDER BY l_orderkey, l_linenumber""".stripMargin,
    "q48_ignore_nulls" ->
      """SELECT user_id, event_id, event_type,
        |  last_value(CASE WHEN event_type = 'purchase' THEN value END IGNORE NULLS)
        |    OVER (PARTITION BY user_id ORDER BY ts, event_id
        |          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS last_purchase_value,
        |  lag(CASE WHEN event_type = 'purchase' THEN value END IGNORE NULLS)
        |    OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_purchase_value
        |FROM events
        |ORDER BY user_id, event_id""".stripMargin,
    "q45_window_dist" ->
      """SELECT c_nationkey, c_custkey, c_acctbal,
        |  round(percent_rank() OVER w, 4) AS pr,
        |  round(cume_dist() OVER w, 4) AS cd,
        |  ntile(4) OVER w AS quartile
        |FROM customer WHERE c_custkey <= 300
        |WINDOW w AS (PARTITION BY c_nationkey ORDER BY c_acctbal, c_custkey)
        |ORDER BY c_nationkey, c_acctbal, c_custkey""".stripMargin,
    "q44_recursive" ->
      """WITH RECURSIVE bounds AS (
        |  SELECT cast(floor(epoch(min(ts)) / 604800) as bigint) AS w0,
        |         cast(floor(epoch(max(ts)) / 604800) as bigint) AS w1
        |  FROM events),
        |spine(w) AS (
        |  SELECT w0 FROM bounds
        |  UNION ALL
        |  SELECT w + 1 FROM spine, bounds WHERE w < w1),
        |su AS (
        |  SELECT cast(floor(epoch(ts) / 604800) as bigint) AS w, count(*) AS n
        |  FROM events WHERE event_type = 'signup' GROUP BY 1)
        |SELECT spine.w AS week, coalesce(su.n, 0) AS n_signups
        |FROM spine LEFT JOIN su ON spine.w = su.w
        |ORDER BY week""".stripMargin,
    "q43_lateral" ->
      """SELECT c_custkey, t.o_orderkey, t.o_totalprice
        |FROM customer, LATERAL (
        |  SELECT o_orderkey, o_totalprice FROM orders
        |  WHERE o_custkey = c_custkey
        |  ORDER BY o_totalprice DESC, o_orderkey LIMIT 2) t
        |WHERE c_custkey <= 200
        |ORDER BY c_custkey, o_totalprice DESC, o_orderkey""".stripMargin,
    // exact decimal power sums -> double combination with the same
    // expression tree as the Spark side: deterministic, no tolerance
    "q42_corr_stats" ->
      """WITH g AS (
        |  SELECT l_returnflag, count(*) AS n,
        |    cast(sum(cast(l_quantity as decimal(12,2))) as double) AS sx,
        |    cast(sum(cast(l_extendedprice as decimal(12,2))) as double) AS sy,
        |    cast(sum(cast(l_quantity as decimal(12,2)) * cast(l_quantity as decimal(12,2))) as double) AS sxx,
        |    cast(sum(cast(l_quantity as decimal(12,2)) * cast(l_extendedprice as decimal(12,2))) as double) AS sxy,
        |    cast(sum(cast(l_extendedprice as decimal(12,2)) * cast(l_extendedprice as decimal(12,2))) as double) AS syy
        |  FROM lineitem GROUP BY 1)
        |SELECT l_returnflag, n,
        |  round((cast(n as double) * sxy - sx * sy)
        |    / (sqrt(cast(n as double) * sxx - sx * sx) * sqrt(cast(n as double) * syy - sy * sy)), 6) AS corr_qty_price,
        |  round((cast(n as double) * sxy - sx * sy) / (cast(n as double) * cast(n as double)), 6) AS covar_pop,
        |  round(sqrt(cast(n as double) * sxx - sx * sx) / cast(n as double), 6) AS stddev_qty,
        |  round(sqrt(cast(n as double) * syy - sy * sy) / cast(n as double), 6) AS stddev_price
        |FROM g ORDER BY l_returnflag""".stripMargin,
    "q39_set_ops_all" ->
      """WITH c AS (SELECT c_nationkey AS nk FROM customer WHERE c_acctbal > 5000.0),
        |s AS (SELECT s_nationkey AS nk FROM supplier),
        |i AS (SELECT nk FROM c INTERSECT ALL SELECT nk FROM s),
        |e AS (SELECT nk FROM c EXCEPT ALL SELECT nk FROM s)
        |SELECT 'intersect_all' AS op, nk, count(*) AS multiplicity FROM i GROUP BY 1, 2
        |UNION ALL SELECT 'except_all' AS op, nk, count(*) FROM e GROUP BY 1, 2
        |ORDER BY 1, 2""".stripMargin,
    "q40_unpivot" ->
      """SELECT o_orderkey, measure, value FROM (
        |  SELECT o_orderkey, 'totalprice' AS measure,
        |         cast(cast(o_totalprice as decimal(12,2)) as double) AS value
        |  FROM orders WHERE o_orderkey <= 200
        |  UNION ALL
        |  SELECT o_orderkey, 'custkey', cast(o_custkey as double)
        |  FROM orders WHERE o_orderkey <= 200)
        |ORDER BY o_orderkey, measure""".stripMargin,
    "q41_window_nav" ->
      """SELECT o_custkey, o_orderkey, o_orderdate,
        |  lag(o_orderkey, 1, -1) OVER w AS prev_key,
        |  lead(o_orderkey, 1, -1) OVER w AS next_key,
        |  first_value(o_orderkey) OVER wr AS first_key,
        |  nth_value(o_orderkey, 2) OVER wr AS second_key,
        |  cast(date_diff('day', cast(lag(o_orderdate, 1) OVER w as date),
        |                 cast(o_orderdate as date)) as int) AS days_since_prev
        |FROM orders WHERE o_custkey <= 300
        |WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey),
        |       wr AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
        |              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
        |ORDER BY o_custkey, o_orderdate, o_orderkey""".stripMargin,
    "q46_range_frame" ->
      """SELECT o_custkey, o_orderkey, day,
        |  cast(sum(cast(o_totalprice as decimal(12,2))) OVER w as double) AS spend_30d,
        |  count(*) OVER w AS n_orders_30d
        |FROM (SELECT o_custkey, o_orderkey, o_totalprice,
        |        cast(date_diff('day', DATE '1970-01-01', cast(o_orderdate as date)) as bigint) AS day
        |      FROM orders WHERE o_custkey <= 300)
        |WINDOW w AS (PARTITION BY o_custkey ORDER BY day
        |             RANGE BETWEEN 30 PRECEDING AND CURRENT ROW)
        |ORDER BY o_custkey, day, o_orderkey""".stripMargin,
    "q47_array_agg" ->
      """SELECT cast(s_nationkey as int) AS nationkey,
        |  cast(len(ns) as int) AS n_suppliers,
        |  ns[1] AS first_supplier,
        |  ns[-1] AS last_supplier,
        |  array_to_string(ns, ',') AS supplier_csv
        |FROM (SELECT s_nationkey, list_sort(list(DISTINCT s_name)) AS ns
        |      FROM supplier GROUP BY s_nationkey)
        |ORDER BY nationkey""".stripMargin,
    "q26_percentile" ->
      """SELECT l_returnflag,
        | round((quantile_cont(l_quantity, [0.25, 0.5, 0.75]))[1], 4) AS p25,
        | round((quantile_cont(l_quantity, [0.25, 0.5, 0.75]))[2], 4) AS p50,
        | round((quantile_cont(l_quantity, [0.25, 0.5, 0.75]))[3], 4) AS p75
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,
    "q27_grouping_sets" ->
      """SELECT l_returnflag, l_linestatus,
        | grouping(l_returnflag) AS g_flag, grouping(l_linestatus) AS g_status,
        | count(*) AS n
        |FROM lineitem
        |GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), ())
        |ORDER BY g_flag, g_status, l_returnflag NULLS FIRST, l_linestatus NULLS FIRST""".stripMargin,
    "q28_cube" ->
      s"""SELECT o_orderstatus, o_orderpriority, count(*) AS n,
         | ${oDecSum(oMoney("o_totalprice"))} AS total
         |FROM orders GROUP BY CUBE (o_orderstatus, o_orderpriority)
         |ORDER BY o_orderstatus NULLS FIRST, o_orderpriority NULLS FIRST""".stripMargin,
    "q29_pivot" ->
      """SELECT o_orderpriority,
        | count(CASE WHEN o_orderstatus = 'F' THEN 1 END) AS "F",
        | count(CASE WHEN o_orderstatus = 'O' THEN 1 END) AS "O",
        | count(CASE WHEN o_orderstatus = 'P' THEN 1 END) AS "P"
        |FROM orders GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin,
    "q30_values" ->
      """SELECT v.code, n.n_name
        |FROM (VALUES (0, 'ZERO'), (1, 'ONE'), (2, 'TWO')) AS v(nk, code)
        |JOIN nation n ON n.n_nationkey = v.nk
        |ORDER BY v.nk""".stripMargin,
    "q31_full_outer" ->
      """WITH c AS (
        |  SELECT c_nationkey, count(*) AS c_cnt FROM customer
        |  WHERE c_acctbal > 9990.0 GROUP BY c_nationkey),
        |s AS (
        |  SELECT s_nationkey, count(*) AS s_cnt FROM supplier GROUP BY s_nationkey)
        |SELECT coalesce(c_nationkey, s_nationkey) AS nk, c_cnt, s_cnt
        |FROM c FULL OUTER JOIN s ON c_nationkey = s_nationkey
        |ORDER BY nk""".stripMargin,
    "q32_explode" ->
      """SELECT u.word, count(*) AS cnt
        |FROM documents, unnest(string_split(text, ' ')) AS u(word)
        |GROUP BY u.word ORDER BY cnt DESC, u.word LIMIT 20""".stripMargin,
    "q33_json" ->
      """SELECT event_type, count(*) AS n,
        | cast(sum(cast(json_extract_string(props, '$.k') as bigint)) as bigint) AS k_sum,
        | count(CASE WHEN cast(json_extract_string(props, '$.k') as int) > 50 THEN 1 END) AS k_gt50
        |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin,
    "q34_asof_join" ->
      """SELECT e.event_id, e.user_id,
        | o.o_orderkey AS last_orderkey,
        | cast(o.o_totalprice as double) AS last_totalprice
        |FROM events e LEFT JOIN LATERAL (
        |  SELECT o_orderkey, o_totalprice FROM orders
        |  WHERE o_custkey = e.user_id AND o_orderdate <= e.ts
        |  ORDER BY o_orderdate DESC, o_orderkey DESC LIMIT 1) o ON true
        |WHERE e.event_id < 5000
        |ORDER BY e.event_id""".stripMargin,
    "q35_set_ops" ->
      """WITH cn AS (SELECT c_nationkey AS nk FROM customer WHERE c_acctbal > 5000.0),
        |sn AS (SELECT s_nationkey AS nk FROM supplier)
        |SELECT 'intersect' AS op, nk FROM (SELECT nk FROM cn INTERSECT SELECT nk FROM sn)
        |UNION ALL
        |SELECT 'except' AS op, nk FROM (SELECT nk FROM cn EXCEPT SELECT nk FROM sn)
        |ORDER BY op, nk""".stripMargin,
    "q36_range_join" ->
      """SELECT e.event_id, e.user_id, count(*) AS n_clicks,
        | cast(sum(cast(c.value as decimal(18,6))) as double) AS click_value
        |FROM events e JOIN events c
        |  ON c.user_id = e.user_id AND c.event_type = 'click'
        | AND abs(epoch_us(e.ts) - epoch_us(c.ts)) <= cast(7200 as bigint) * 1000000
        |WHERE e.event_type = 'error'
        |GROUP BY e.event_id, e.user_id ORDER BY e.event_id""".stripMargin,
    "q37_disjunctive" ->
      s"""SELECT ${oDecSum(s"${oMoney("l_extendedprice")} * ${oFactor("1 - l_discount")}")} AS revenue,
         | count(*) AS n_rows
         |FROM lineitem JOIN part ON l_partkey = p_partkey
         |WHERE (p_brand = 'Brand#12' AND l_quantity BETWEEN 1 AND 11 AND p_size BETWEEN 1 AND 5)
         |   OR (p_brand = 'Brand#23' AND l_quantity BETWEEN 10 AND 20 AND p_size BETWEEN 1 AND 10)
         |   OR (p_brand = 'Brand#34' AND l_quantity BETWEEN 20 AND 30 AND p_size BETWEEN 1 AND 15)""".stripMargin,
    "q38_q22_shape" ->
      s"""SELECT substr(c_name, 10, 1) AS cntry, count(*) AS numcust,
         | ${oDecSum(oMoney("c_acctbal"))} AS totacctbal
         |FROM customer
         |WHERE c_acctbal > (
         |  SELECT ${oDecSum(oMoney("c_acctbal"))} / count(*) FROM customer WHERE c_acctbal > 0.0)
         |  AND NOT EXISTS (
         |    SELECT 1 FROM orders WHERE o_custkey = c_custkey AND o_custkey % 3 = 0)
         |GROUP BY 1 ORDER BY 1""".stripMargin,
    // the HLL estimate itself is engine-specific; the gate pins the
    // exact count and that Spark's estimate landed within tolerance
    "approx_distinct" ->
      """SELECT l_returnflag, count(DISTINCT l_partkey) AS exact_parts,
        | true AS within_tol
        |FROM lineitem GROUP BY 1 ORDER BY 1""".stripMargin)
}
