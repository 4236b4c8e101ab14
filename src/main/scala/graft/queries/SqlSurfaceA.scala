package graft.queries

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import QueryUtil._

/** SQL operator surface, part A (SURVEY.md §2A q01–q13).
  *
  * The reference delegates the whole ANSI SELECT surface to DataFusion
  * (reference: src/controllers.rs:25-105, src/data_source/context.rs).
  * Here each operator family is declared with the DataFrame API so
  * Catalyst plans it (pushdown, partial agg, broadcast); the paired
  * DuckDB oracle SQL in `oracles` is the correctness contract.
  */
object SqlSurfaceA {

  type Q = (SparkSession, String) => DataFrame

  /** TPC-H Q1 shape: scan-heavy groupBy with many aggregates.
    * Map-side partial aggregation; only 4 groups → tiny shuffle.
    */
  def q01_agg(spark: SparkSession, dir: String): DataFrame =
    Tables(spark, dir, "lineitem")
      .filter(col("l_shipdate") <= lit("2000-09-02").cast("timestamp"))
      .groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(
        decSum(money(col("l_quantity"))).as("sum_qty"),
        decSum(money(col("l_extendedprice"))).as("sum_base_price"),
        decSum(money(col("l_extendedprice")) * factor(lit(1) - col("l_discount"))).as("sum_disc_price"),
        decSum(money(col("l_extendedprice")) * factor(lit(1) - col("l_discount")) * factor(lit(1) + col("l_tax"))).as("sum_charge"),
        decAvg(money(col("l_quantity"))).as("avg_qty"),
        decAvg(money(col("l_extendedprice"))).as("avg_price"),
        decAvg(factor(col("l_discount"))).as("avg_disc"),
        count(lit(1)).as("count_order"))
      .orderBy(col("l_returnflag"), col("l_linestatus"))

  /** Filter + projection; both must reach the parquet scan. */
  def q02_filter_project(spark: SparkSession, dir: String): DataFrame =
    Tables(spark, dir, "orders")
      .filter(col("o_orderstatus") === "O" && col("o_totalprice") > 400000.0)
      .select(col("o_orderkey"), col("o_custkey"), col("o_totalprice"))
      .orderBy(col("o_orderkey"))

  /** TPC-H Q3 shape: 3-way join, agg, top-k. customer side is filtered
    * then broadcast; lineitem⋈orders shuffles once on the order key.
    */
  def q03_join_agg_topk(spark: SparkSession, dir: String): DataFrame = {
    val cust = Tables(spark, dir, "customer").filter(col("c_mktsegment") === "BUILDING")
    val ord = Tables(spark, dir, "orders").filter(col("o_orderdate") < lit("1998-03-15").cast("timestamp"))
    val li = Tables(spark, dir, "lineitem").filter(col("l_shipdate") > lit("1998-03-15").cast("timestamp"))
    li.join(ord, col("l_orderkey") === col("o_orderkey"))
      .join(broadcast(cust), col("o_custkey") === col("c_custkey"))
      .groupBy(col("l_orderkey"), col("o_orderdate"))
      .agg(decSum(money(col("l_extendedprice")) * factor(lit(1) - col("l_discount"))).as("revenue"))
      .select(col("l_orderkey"), date_format(col("o_orderdate"), "yyyy-MM-dd").as("o_orderdate"), col("revenue"))
      .orderBy(col("revenue").desc, col("l_orderkey"))
      .limit(10)
  }

  /** EXISTS → left-semi join (TPC-H Q4 shape). */
  def q04_exists_semijoin(spark: SparkSession, dir: String): DataFrame = {
    val ord = Tables(spark, dir, "orders")
      .filter(col("o_orderdate") >= lit("1996-07-01").cast("timestamp") &&
        col("o_orderdate") < lit("1996-10-01").cast("timestamp"))
    val late = Tables(spark, dir, "lineitem").filter(col("l_quantity") > 45)
    ord.join(late, col("o_orderkey") === col("l_orderkey"), "left_semi")
      .groupBy(col("o_orderpriority"))
      .agg(count(lit(1)).as("order_count"))
      .orderBy(col("o_orderpriority"))
  }

  /** TPC-H Q5 shape: 6-table join; all dims broadcast, single shuffle
    * on the lineitem⋈orders key.
    */
  def q05_multijoin(spark: SparkSession, dir: String): DataFrame = {
    val region = Tables(spark, dir, "region").filter(col("r_name") === "ASIA")
    val nation = Tables(spark, dir, "nation")
    val cust = Tables(spark, dir, "customer")
    val ord = Tables(spark, dir, "orders")
      .filter(col("o_orderdate") >= lit("1996-01-01").cast("timestamp") &&
        col("o_orderdate") < lit("1997-01-01").cast("timestamp"))
    val li = Tables(spark, dir, "lineitem")
    val supp = Tables(spark, dir, "supplier")
    li.join(ord, col("l_orderkey") === col("o_orderkey"))
      .join(broadcast(supp), col("l_suppkey") === col("s_suppkey"))
      .join(broadcast(cust), col("o_custkey") === col("c_custkey") && col("c_nationkey") === col("s_nationkey"))
      .join(broadcast(nation), col("s_nationkey") === col("n_nationkey"))
      .join(broadcast(region), col("n_regionkey") === col("r_regionkey"))
      .groupBy(col("n_name"))
      .agg(decSum(money(col("l_extendedprice")) * factor(lit(1) - col("l_discount"))).as("revenue"))
      .orderBy(col("revenue").desc, col("n_name"))
  }

  /** TPC-H Q6 shape: highly selective scan + single global aggregate. */
  def q06_selective_agg(spark: SparkSession, dir: String): DataFrame =
    Tables(spark, dir, "lineitem")
      .filter(col("l_shipdate") >= lit("1996-01-01").cast("timestamp") &&
        col("l_shipdate") < lit("1997-01-01").cast("timestamp") &&
        col("l_discount") >= 0.05 && col("l_discount") <= 0.07 &&
        col("l_quantity") < 24)
      .agg(decSum(money(col("l_extendedprice")) * factor(col("l_discount"))).as("revenue"),
        count(lit(1)).as("n_rows"))

  /** Left outer join + null-aware aggregates (customers with 0 orders kept). */
  def q07_outer_join(spark: SparkSession, dir: String): DataFrame = {
    val cust = Tables(spark, dir, "customer")
    val ord = Tables(spark, dir, "orders").filter(col("o_totalprice") > 350000.0)
    cust.join(ord, col("c_custkey") === col("o_custkey"), "left_outer")
      .groupBy(col("c_custkey"))
      .agg(count(col("o_orderkey")).as("order_count"),
        coalesce(decSum(money(col("o_totalprice"))), lit(0.0)).as("total_spent"))
      .filter(col("c_custkey") <= 200)
      .orderBy(col("c_custkey"))
  }

  /** CTE reused twice (TPC-H Q15 shape): revenue per supplier, then the
    * max — exact-decimal revenue so the max-equality join is stable.
    */
  def q08_cte(spark: SparkSession, dir: String): DataFrame = {
    val revenue = Tables(spark, dir, "lineitem")
      .filter(col("l_shipdate") >= lit("1996-01-01").cast("timestamp") &&
        col("l_shipdate") < lit("1996-04-01").cast("timestamp"))
      .groupBy(col("l_suppkey"))
      .agg(decSum(money(col("l_extendedprice")) * factor(lit(1) - col("l_discount"))).as("total_rev"))
    val maxRev = revenue.agg(max(col("total_rev")).as("max_rev"))
    val supp = Tables(spark, dir, "supplier")
    revenue.join(broadcast(maxRev), col("total_rev") === col("max_rev"))
      .join(broadcast(supp), col("l_suppkey") === col("s_suppkey"))
      .select(col("s_suppkey"), col("s_name"), col("total_rev"))
      .orderBy(col("s_suppkey"))
  }

  /** UNION ALL then DISTINCT across two sources. */
  def q09_union(spark: SparkSession, dir: String): DataFrame = {
    val c = Tables(spark, dir, "customer").select(col("c_nationkey").as("nk"))
    val s = Tables(spark, dir, "supplier").select(col("s_nationkey").as("nk"))
    c.unionAll(s).distinct().orderBy(col("nk"))
  }

  /** Global sort + limit (top-k): TakeOrderedAndProject, no full sort. */
  def q10_orderby_limit(spark: SparkSession, dir: String): DataFrame =
    Tables(spark, dir, "orders")
      .select(col("o_orderkey"), col("o_totalprice"))
      .orderBy(col("o_totalprice").desc, col("o_orderkey"))
      .limit(15)

  /** Aggregate + HAVING (post-aggregation filter). */
  def q11_having(spark: SparkSession, dir: String): DataFrame =
    Tables(spark, dir, "lineitem")
      .groupBy(col("l_partkey"))
      .agg(decSum(money(col("l_quantity"))).as("sum_qty"), count(lit(1)).as("n"))
      .filter(col("sum_qty") > 750.0)
      .orderBy(col("l_partkey"))

  /** CASE WHEN + conditional aggregation (TPC-H Q12 shape) by month. */
  def q12_case_when(spark: SparkSession, dir: String): DataFrame =
    Tables(spark, dir, "orders")
      .filter(col("o_orderdate") >= lit("1997-01-01").cast("timestamp") &&
        col("o_orderdate") < lit("1998-01-01").cast("timestamp"))
      .groupBy(date_format(col("o_orderdate"), "yyyy-MM").as("order_month"))
      .agg(
        count(when(col("o_orderpriority").isin("1-URGENT", "2-HIGH"), 1)).as("high_count"),
        count(when(!col("o_orderpriority").isin("1-URGENT", "2-HIGH"), 1)).as("low_count"),
        decSum(money(col("o_totalprice"))).as("month_total"))
      .orderBy(col("order_month"))

  /** COUNT(DISTINCT …) — multiple distinct aggregates in one pass. */
  def q13_count_distinct(spark: SparkSession, dir: String): DataFrame =
    Tables(spark, dir, "lineitem")
      .groupBy(col("l_returnflag"))
      .agg(
        countDistinct(col("l_partkey")).as("n_parts"),
        countDistinct(col("l_suppkey")).as("n_supps"),
        countDistinct(col("l_orderkey")).as("n_orders"),
        count(lit(1)).as("n_rows"))
      .orderBy(col("l_returnflag"))

  val queries: Map[String, Q] = Map(
    "q01_agg" -> (q01_agg _),
    "q02_filter_project" -> (q02_filter_project _),
    "q03_join_agg_topk" -> (q03_join_agg_topk _),
    "q04_exists_semijoin" -> (q04_exists_semijoin _),
    "q05_multijoin" -> (q05_multijoin _),
    "q06_selective_agg" -> (q06_selective_agg _),
    "q07_outer_join" -> (q07_outer_join _),
    "q08_cte" -> (q08_cte _),
    "q09_union" -> (q09_union _),
    "q10_orderby_limit" -> (q10_orderby_limit _),
    "q11_having" -> (q11_having _),
    "q12_case_when" -> (q12_case_when _),
    "q13_count_distinct" -> (q13_count_distinct _))

  private val discPrice = s"${oMoney("l_extendedprice")} * ${oFactor("1 - l_discount")}"

  val oracles: Map[String, String] = Map(
    "q01_agg" ->
      s"""SELECT l_returnflag, l_linestatus,
         | ${oDecSum(oMoney("l_quantity"))} AS sum_qty,
         | ${oDecSum(oMoney("l_extendedprice"))} AS sum_base_price,
         | ${oDecSum(discPrice)} AS sum_disc_price,
         | ${oDecSum(s"$discPrice * ${oFactor("1 + l_tax")}")} AS sum_charge,
         | ${oDecAvg(oMoney("l_quantity"))} AS avg_qty,
         | ${oDecAvg(oMoney("l_extendedprice"))} AS avg_price,
         | ${oDecAvg(oFactor("l_discount"))} AS avg_disc,
         | count(*) AS count_order
         |FROM lineitem WHERE l_shipdate <= TIMESTAMP '2000-09-02'
         |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,
    "q02_filter_project" ->
      """SELECT o_orderkey, o_custkey, o_totalprice FROM orders
        |WHERE o_orderstatus = 'O' AND o_totalprice > 400000.0
        |ORDER BY o_orderkey""".stripMargin,
    "q03_join_agg_topk" ->
      s"""SELECT l_orderkey, strftime(o_orderdate, '%Y-%m-%d') AS o_orderdate,
         | ${oDecSum(discPrice)} AS revenue
         |FROM lineitem
         |JOIN orders ON l_orderkey = o_orderkey
         |JOIN customer ON o_custkey = c_custkey
         |WHERE c_mktsegment = 'BUILDING'
         |  AND o_orderdate < TIMESTAMP '1998-03-15'
         |  AND l_shipdate > TIMESTAMP '1998-03-15'
         |GROUP BY l_orderkey, o_orderdate
         |ORDER BY revenue DESC, l_orderkey LIMIT 10""".stripMargin,
    "q04_exists_semijoin" ->
      """SELECT o_orderpriority, count(*) AS order_count FROM orders
        |WHERE o_orderdate >= TIMESTAMP '1996-07-01' AND o_orderdate < TIMESTAMP '1996-10-01'
        |  AND EXISTS (SELECT 1 FROM lineitem WHERE l_orderkey = o_orderkey AND l_quantity > 45)
        |GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin,
    "q05_multijoin" ->
      s"""SELECT n_name, ${oDecSum(discPrice)} AS revenue
         |FROM lineitem
         |JOIN orders ON l_orderkey = o_orderkey
         |JOIN supplier ON l_suppkey = s_suppkey
         |JOIN customer ON o_custkey = c_custkey AND c_nationkey = s_nationkey
         |JOIN nation ON s_nationkey = n_nationkey
         |JOIN region ON n_regionkey = r_regionkey
         |WHERE r_name = 'ASIA'
         |  AND o_orderdate >= TIMESTAMP '1996-01-01' AND o_orderdate < TIMESTAMP '1997-01-01'
         |GROUP BY n_name ORDER BY revenue DESC, n_name""".stripMargin,
    "q06_selective_agg" ->
      s"""SELECT ${oDecSum(s"${oMoney("l_extendedprice")} * ${oFactor("l_discount")}")} AS revenue,
         | count(*) AS n_rows
         |FROM lineitem
         |WHERE l_shipdate >= TIMESTAMP '1996-01-01' AND l_shipdate < TIMESTAMP '1997-01-01'
         |  AND l_discount >= 0.05 AND l_discount <= 0.07 AND l_quantity < 24""".stripMargin,
    "q07_outer_join" ->
      s"""SELECT c_custkey, count(o_orderkey) AS order_count,
         | coalesce(${oDecSum(oMoney("o_totalprice"))}, 0.0) AS total_spent
         |FROM customer LEFT JOIN orders
         |  ON c_custkey = o_custkey AND o_totalprice > 350000.0
         |GROUP BY c_custkey HAVING c_custkey <= 200 ORDER BY c_custkey""".stripMargin,
    "q08_cte" ->
      s"""WITH revenue AS (
         |  SELECT l_suppkey, ${oDecSum(discPrice)} AS total_rev
         |  FROM lineitem
         |  WHERE l_shipdate >= TIMESTAMP '1996-01-01' AND l_shipdate < TIMESTAMP '1996-04-01'
         |  GROUP BY l_suppkey)
         |SELECT s_suppkey, s_name, total_rev
         |FROM revenue JOIN supplier ON l_suppkey = s_suppkey
         |WHERE total_rev = (SELECT max(total_rev) FROM revenue)
         |ORDER BY s_suppkey""".stripMargin,
    "q09_union" ->
      """SELECT DISTINCT nk FROM (
        |  SELECT c_nationkey AS nk FROM customer
        |  UNION ALL
        |  SELECT s_nationkey AS nk FROM supplier)
        |ORDER BY nk""".stripMargin,
    "q10_orderby_limit" ->
      """SELECT o_orderkey, o_totalprice FROM orders
        |ORDER BY o_totalprice DESC, o_orderkey LIMIT 15""".stripMargin,
    "q11_having" ->
      s"""SELECT l_partkey, ${oDecSum(oMoney("l_quantity"))} AS sum_qty, count(*) AS n
         |FROM lineitem GROUP BY l_partkey
         |HAVING ${oDecSum(oMoney("l_quantity"))} > 750.0
         |ORDER BY l_partkey""".stripMargin,
    "q12_case_when" ->
      s"""SELECT strftime(o_orderdate, '%Y-%m') AS order_month,
         | count(CASE WHEN o_orderpriority IN ('1-URGENT','2-HIGH') THEN 1 END) AS high_count,
         | count(CASE WHEN o_orderpriority NOT IN ('1-URGENT','2-HIGH') THEN 1 END) AS low_count,
         | ${oDecSum(oMoney("o_totalprice"))} AS month_total
         |FROM orders
         |WHERE o_orderdate >= TIMESTAMP '1997-01-01' AND o_orderdate < TIMESTAMP '1998-01-01'
         |GROUP BY 1 ORDER BY 1""".stripMargin,
    "q13_count_distinct" ->
      """SELECT l_returnflag,
        | count(DISTINCT l_partkey) AS n_parts,
        | count(DISTINCT l_suppkey) AS n_supps,
        | count(DISTINCT l_orderkey) AS n_orders,
        | count(*) AS n_rows
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin)
}
