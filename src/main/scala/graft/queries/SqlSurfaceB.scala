package graft.queries

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import QueryUtil._

/** SQL operator surface, part B (SURVEY.md §2A q14–q25): window
  * functions, subquery forms, scalar function families, grouping sets.
  * Reference executes these via DataFusion SQL (src/controllers.rs:36).
  */
object SqlSurfaceB {

  type Q = (SparkSession, String) => DataFrame

  /** rank/dense_rank over a partition (ties are value-deterministic). */
  def q14_window_rank(spark: SparkSession, dir: String): DataFrame = {
    val byBal = Window.partitionBy(col("c_nationkey")).orderBy(col("acctbal").desc)
    Tables(spark, dir, "customer")
      .select(col("c_custkey"), col("c_nationkey"), money(col("c_acctbal")).cast("double").as("acctbal"))
      .withColumn("rnk", rank().over(byBal))
      .withColumn("drnk", dense_rank().over(byBal))
      .filter(col("rnk") <= 3)
      .orderBy(col("c_nationkey"), col("rnk"), col("c_custkey"))
  }

  /** Running sum + lag over a uniquely-ordered frame. */
  def q15_window_running(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("l_suppkey"))
      .orderBy(col("l_shipdate"), col("l_orderkey"), col("l_linenumber"))
    Tables(spark, dir, "lineitem")
      .filter(col("l_shipdate") >= lit("1996-01-01").cast("timestamp") &&
        col("l_shipdate") < lit("1996-02-01").cast("timestamp"))
      .select(col("l_suppkey"), col("l_orderkey"), col("l_linenumber"), col("l_quantity"), col("l_shipdate"))
      .withColumn("running_qty",
        sum(money(col("l_quantity"))).over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow)).cast("double"))
      .withColumn("prev_qty", lag(col("l_quantity"), 1).over(w))
      .withColumn("rn", row_number().over(w))
      .drop("l_shipdate")
      .orderBy(col("l_suppkey"), col("rn"))
  }

  /** IN (subquery) — planned as a semi join. */
  def q16_in_subquery(spark: SparkSession, dir: String): DataFrame = {
    val rich = Tables(spark, dir, "customer")
      .filter(col("c_acctbal") > 9000.0).select(col("c_custkey"))
    Tables(spark, dir, "orders")
      .filter(year(col("o_orderdate")) === 1996)
      .join(broadcast(rich), col("o_custkey") === col("c_custkey"), "left_semi")
      .select(col("o_orderkey"), col("o_custkey"), col("o_totalprice"))
      .orderBy(col("o_orderkey"))
  }

  /** Scalar subquery as a predicate threshold (exact-decimal avg). */
  def q17_scalar_subquery(spark: SparkSession, dir: String): DataFrame = {
    val ord = Tables(spark, dir, "orders")
    val threshold = ord.agg((decSum(money(col("o_totalprice"))) / count(lit(1)) * 1.8).as("thr"))
    ord.join(broadcast(threshold))
      .filter(col("o_totalprice") > col("thr"))
      .select(col("o_orderkey"), col("o_totalprice"))
      .orderBy(col("o_orderkey"))
  }

  /** NOT EXISTS → left-anti join (customers with no big-ticket orders). */
  def q18_not_exists_antijoin(spark: SparkSession, dir: String): DataFrame = {
    val big = Tables(spark, dir, "orders")
      .filter(col("o_totalprice") > 420000.0).select(col("o_custkey"))
    Tables(spark, dir, "customer")
      .join(big, col("c_custkey") === col("o_custkey"), "left_anti")
      .select(col("c_custkey"), col("c_name"))
      .orderBy(col("c_custkey"))
  }

  /** String function family (like/substr/upper/length/regexp/lpad/replace). */
  def q19_string_funcs(spark: SparkSession, dir: String): DataFrame =
    Tables(spark, dir, "part")
      .filter(col("p_name").like("%a%"))
      .select(
        col("p_partkey"),
        upper(col("p_name")).as("uname"),
        lower(col("p_type")).as("ltype"),
        substring(col("p_name"), 1, 6).as("name6"),
        length(col("p_name")).as("name_len"),
        regexp_extract(col("p_brand"), "#(\\d+)", 1).cast("int").as("brand_num"),
        lpad(col("p_size").cast("string"), 4, "0").as("size4"),
        regexp_replace(col("p_type"), " ", "_").as("type_u"),
        trim(concat(lit("  "), col("p_brand"), lit("  "))).as("brand_trim"),
        instr(col("p_name"), "a").as("first_a"))
      .orderBy(col("p_partkey"))

  /** Date/time function family (extract/trunc/add/diff/last_day). */
  def q20_date_funcs(spark: SparkSession, dir: String): DataFrame =
    Tables(spark, dir, "orders")
      .filter(col("o_orderkey") <= 2000)
      .select(
        col("o_orderkey"),
        year(col("o_orderdate")).as("y"),
        month(col("o_orderdate")).as("m"),
        dayofmonth(col("o_orderdate")).as("d"),
        quarter(col("o_orderdate")).as("q"),
        date_format(date_trunc("month", col("o_orderdate")), "yyyy-MM-dd").as("month_start"),
        date_format(col("o_orderdate") + expr("INTERVAL 1 MONTH"), "yyyy-MM-dd").as("plus_month"),
        date_format(last_day(col("o_orderdate")), "yyyy-MM-dd").as("month_end"),
        datediff(col("o_orderdate"), lit("1995-01-01").cast("timestamp")).as("days_since"))
      .orderBy(col("o_orderkey"))

  /** Math + null-handling family (abs/mod/floor/ceil/sqrt/power,
    * coalesce/nullif/greatest/least, casts).
    */
  def q21_math_null(spark: SparkSession, dir: String): DataFrame =
    Tables(spark, dir, "lineitem")
      .filter(col("l_orderkey") <= 1000)
      .select(
        col("l_orderkey"), col("l_linenumber"),
        abs(col("l_quantity") - 25.0).as("qty_dev"),
        (col("l_orderkey") % 7).as("key_mod"),
        floor(col("l_extendedprice")).cast("long").as("price_floor"),
        ceil(col("l_extendedprice")).cast("long").as("price_ceil"),
        sqrt(col("l_quantity")).as("qty_sqrt"),
        pow(lit(2.0), col("l_linenumber").cast("double")).as("two_pow"),
        coalesce(nullif(col("l_discount"), lit(0.0)), lit(-1.0)).as("disc_or_neg"),
        greatest(col("l_quantity"), col("l_tax") * 100).as("gst"),
        least(col("l_quantity"), col("l_extendedprice") / 1000.0).as("lst"),
        col("l_quantity").cast("int").as("qty_int"),
        signum(col("l_quantity") - 25.0).cast("int").as("qty_sign"))
      .orderBy(col("l_orderkey"), col("l_linenumber"))

  /** GROUP BY ROLLUP with grouping() markers. */
  def q22_rollup(spark: SparkSession, dir: String): DataFrame =
    Tables(spark, dir, "lineitem")
      .rollup(col("l_returnflag"), col("l_linestatus"))
      .agg(
        grouping(col("l_returnflag")).as("g_flag"),
        grouping(col("l_linestatus")).as("g_status"),
        count(lit(1)).as("n"),
        decSum(money(col("l_quantity"))).as("sum_qty"))
      .orderBy(col("g_flag"), col("g_status"),
        col("l_returnflag").asc_nulls_first, col("l_linestatus").asc_nulls_first)

  /** Cross join of small dims. */
  def q23_cross_join(spark: SparkSession, dir: String): DataFrame =
    Tables(spark, dir, "region")
      .crossJoin(Tables(spark, dir, "nation"))
      .select(col("r_name"), col("n_name"))
      .orderBy(col("r_name"), col("n_name"))

  /** Self join: order pairs per customer. */
  def q24_self_join(spark: SparkSession, dir: String): DataFrame = {
    val o1 = Tables(spark, dir, "orders").select(col("o_custkey").as("custkey"), col("o_orderkey").as("k1"))
    val o2 = Tables(spark, dir, "orders").select(col("o_custkey").as("custkey"), col("o_orderkey").as("k2"))
    o1.join(o2, Seq("custkey"))
      .filter(col("k1") < col("k2"))
      .groupBy(col("custkey"))
      .agg(count(lit(1)).as("n_pairs"))
      .filter(col("custkey") <= 100)
      .orderBy(col("custkey"))
  }

  /** SELECT DISTINCT over multiple columns. */
  def q25_distinct(spark: SparkSession, dir: String): DataFrame =
    Tables(spark, dir, "orders")
      .select(col("o_orderpriority"), col("o_orderstatus"))
      .distinct()
      .orderBy(col("o_orderpriority"), col("o_orderstatus"))

  val queries: Map[String, Q] = Map(
    "q14_window_rank" -> (q14_window_rank _),
    "q15_window_running" -> (q15_window_running _),
    "q16_in_subquery" -> (q16_in_subquery _),
    "q17_scalar_subquery" -> (q17_scalar_subquery _),
    "q18_not_exists_antijoin" -> (q18_not_exists_antijoin _),
    "q19_string_funcs" -> (q19_string_funcs _),
    "q20_date_funcs" -> (q20_date_funcs _),
    "q21_math_null" -> (q21_math_null _),
    "q22_rollup" -> (q22_rollup _),
    "q23_cross_join" -> (q23_cross_join _),
    "q24_self_join" -> (q24_self_join _),
    "q25_distinct" -> (q25_distinct _))

  val oracles: Map[String, String] = Map(
    "q14_window_rank" ->
      """SELECT * FROM (
        |  SELECT c_custkey, c_nationkey,
        |    cast(cast(c_acctbal as decimal(12,2)) as double) AS acctbal,
        |    rank() OVER (PARTITION BY c_nationkey ORDER BY cast(cast(c_acctbal as decimal(12,2)) as double) DESC) AS rnk,
        |    dense_rank() OVER (PARTITION BY c_nationkey ORDER BY cast(cast(c_acctbal as decimal(12,2)) as double) DESC) AS drnk
        |  FROM customer)
        |WHERE rnk <= 3 ORDER BY c_nationkey, rnk, c_custkey""".stripMargin,
    "q15_window_running" ->
      """SELECT l_suppkey, l_orderkey, l_linenumber, l_quantity,
        |  cast(sum(cast(l_quantity as decimal(12,2))) OVER w as double) AS running_qty,
        |  lag(l_quantity, 1) OVER w AS prev_qty,
        |  row_number() OVER w AS rn
        |FROM lineitem
        |WHERE l_shipdate >= TIMESTAMP '1996-01-01' AND l_shipdate < TIMESTAMP '1996-02-01'
        |WINDOW w AS (PARTITION BY l_suppkey ORDER BY l_shipdate, l_orderkey, l_linenumber
        |             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
        |ORDER BY l_suppkey, rn""".stripMargin,
    "q16_in_subquery" ->
      """SELECT o_orderkey, o_custkey, o_totalprice FROM orders
        |WHERE extract(year FROM o_orderdate) = 1996
        |  AND o_custkey IN (SELECT c_custkey FROM customer WHERE c_acctbal > 9000.0)
        |ORDER BY o_orderkey""".stripMargin,
    "q17_scalar_subquery" ->
      """SELECT o_orderkey, o_totalprice FROM orders
        |WHERE o_totalprice > (
        |  SELECT cast(sum(cast(o_totalprice as decimal(12,2))) as double) / count(*) * 1.8 FROM orders)
        |ORDER BY o_orderkey""".stripMargin,
    "q18_not_exists_antijoin" ->
      """SELECT c_custkey, c_name FROM customer
        |WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey AND o_totalprice > 420000.0)
        |ORDER BY c_custkey""".stripMargin,
    "q19_string_funcs" ->
      """SELECT p_partkey,
        |  upper(p_name) AS uname,
        |  lower(p_type) AS ltype,
        |  substr(p_name, 1, 6) AS name6,
        |  length(p_name) AS name_len,
        |  cast(regexp_extract(p_brand, '#(\d+)', 1) as int) AS brand_num,
        |  lpad(cast(p_size as varchar), 4, '0') AS size4,
        |  regexp_replace(p_type, ' ', '_', 'g') AS type_u,
        |  trim(concat('  ', p_brand, '  ')) AS brand_trim,
        |  position('a' in p_name) AS first_a
        |FROM part WHERE p_name LIKE '%a%' ORDER BY p_partkey""".stripMargin,
    "q20_date_funcs" ->
      """SELECT o_orderkey,
        |  extract(year FROM o_orderdate) AS y,
        |  extract(month FROM o_orderdate) AS m,
        |  extract(day FROM o_orderdate) AS d,
        |  extract(quarter FROM o_orderdate) AS q,
        |  strftime(date_trunc('month', o_orderdate), '%Y-%m-%d') AS month_start,
        |  strftime(o_orderdate + INTERVAL 1 MONTH, '%Y-%m-%d') AS plus_month,
        |  strftime(last_day(o_orderdate), '%Y-%m-%d') AS month_end,
        |  date_diff('day', TIMESTAMP '1995-01-01', o_orderdate) AS days_since
        |FROM orders WHERE o_orderkey <= 2000 ORDER BY o_orderkey""".stripMargin,
    "q21_math_null" ->
      """SELECT l_orderkey, l_linenumber,
        |  abs(l_quantity - 25.0) AS qty_dev,
        |  l_orderkey % 7 AS key_mod,
        |  cast(floor(l_extendedprice) as bigint) AS price_floor,
        |  cast(ceil(l_extendedprice) as bigint) AS price_ceil,
        |  sqrt(l_quantity) AS qty_sqrt,
        |  power(2.0, l_linenumber) AS two_pow,
        |  coalesce(nullif(l_discount, 0.0), -1.0) AS disc_or_neg,
        |  greatest(l_quantity, l_tax * 100) AS gst,
        |  least(l_quantity, l_extendedprice / 1000.0) AS lst,
        |  cast(l_quantity as int) AS qty_int,
        |  cast(sign(l_quantity - 25.0) as int) AS qty_sign
        |FROM lineitem WHERE l_orderkey <= 1000
        |ORDER BY l_orderkey, l_linenumber""".stripMargin,
    "q22_rollup" ->
      """SELECT l_returnflag, l_linestatus,
        |  grouping(l_returnflag) AS g_flag,
        |  grouping(l_linestatus) AS g_status,
        |  count(*) AS n,
        |  cast(sum(cast(l_quantity as decimal(12,2))) as double) AS sum_qty
        |FROM lineitem GROUP BY ROLLUP (l_returnflag, l_linestatus)
        |ORDER BY g_flag, g_status, l_returnflag NULLS FIRST, l_linestatus NULLS FIRST""".stripMargin,
    "q23_cross_join" ->
      """SELECT r_name, n_name FROM region CROSS JOIN nation
        |ORDER BY r_name, n_name""".stripMargin,
    "q24_self_join" ->
      """SELECT o1.o_custkey AS custkey, count(*) AS n_pairs
        |FROM orders o1 JOIN orders o2
        |  ON o1.o_custkey = o2.o_custkey AND o1.o_orderkey < o2.o_orderkey
        |GROUP BY 1 HAVING custkey <= 100 ORDER BY custkey""".stripMargin,
    "q25_distinct" ->
      """SELECT DISTINCT o_orderpriority, o_orderstatus FROM orders
        |ORDER BY o_orderpriority, o_orderstatus""".stripMargin)
}
