package graft.queries

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Helpers shared by the SQL-surface queries.
  *
  * Aggregates over doubles are order-dependent in the last bits, and the
  * driver hash-compares our results against a DuckDB oracle — so every
  * money/measure aggregate is computed in *exact decimal* (inputs are
  * 2-decimal doubles) and only the final value is cast back to double.
  * Both engines then produce bit-identical results regardless of
  * partitioning or row order. Precision budgets are chosen so no
  * intermediate exceeds decimal(38, s) (where Spark and DuckDB diverge
  * in precision-loss handling).
  */
object QueryUtil {
  /** A money-like column (2-decimal double, < 1e10) as exact decimal. */
  def money(c: Column): Column = c.cast(DecimalType(12, 2))

  /** A small factor like (1 - discount) as exact decimal. Compute the
    * arithmetic in double first (identical on both engines), then cast.
    */
  def factor(c: Column): Column = c.cast(DecimalType(8, 2))

  /** Exact decimal sum, surfaced as double (bit-identical both sides). */
  def decSum(c: Column): Column = sum(c).cast("double")

  /** avg as exact-sum / count, both in double — deterministic. */
  def decAvg(c: Column): Column = sum(c).cast("double") / count(lit(1))

  /** 2-D Morton (z-order) curve value by bit interleaving — the
    * multi-dimensional clustering key behind z-ordered lakehouse
    * layouts: range-partitioning + sorting by z co-locates rows close
    * in BOTH key dimensions, so parquet min/max stats prune box
    * queries on either column. Rendered as engine-portable SQL (CASE
    * on `&` masks, no shift operators) — the SAME string runs on
    * Spark and DuckDB, which is what lets the gate hash-compare the
    * layout key itself. 21 bits per key: ids up to 2^21 (any test SF),
    * z fits comfortably in int64.
    */
  def zorderSql(a: String, b: String, bits: Int = 21): String =
    (0 until bits).flatMap { i =>
      Seq(
        s"(CASE WHEN ($a & ${1L << i}) != 0 THEN ${1L << (2 * i)} ELSE 0 END)",
        s"(CASE WHEN ($b & ${1L << i}) != 0 THEN ${1L << (2 * i + 1)} ELSE 0 END)")
    }.mkString(" + ")

  /** Rank-bucketed 2-D z-order as one portable SQL query: each key is
    * first mapped to a `bucketBits`-bit RANK bucket over its distinct
    * values (raw-value interleaving is useless when the two keys span
    * different bit widths — one dimension's bits dominate the sort),
    * then the bucket numbers are interleaved with [[zorderSql]]'s CASE
    * form. The same string runs on Spark and DuckDB. At 100 TB the
    * distinct-rank dictionary becomes a sampled quantile table
    * (Delta/Iceberg z-order does exactly this); the bucketing join is
    * broadcast either way.
    */
  def zorderBucketedSql(keyA: String, keyB: String, table: String = "lineitem",
      where: String = "", bucketBits: Int = 8): String = {
    val nb = 1 << bucketBits
    val inter = (0 until bucketBits).flatMap { i =>
      Seq(
        s"(CASE WHEN (ba.bk & ${1L << i}) != 0 THEN ${1L << (2 * i)} ELSE 0 END)",
        s"(CASE WHEN (bb.bk & ${1L << i}) != 0 THEN ${1L << (2 * i + 1)} ELSE 0 END)")
    }.mkString(" + ")
    s"""WITH da AS (SELECT DISTINCT $keyA AS v FROM $table),
       |ra AS (SELECT v, row_number() OVER (ORDER BY v) - 1 AS r FROM da),
       |ca AS (SELECT count(*) AS c FROM da),
       |ba AS (SELECT v, cast(floor((r * cast($nb as double)) / c) as bigint) AS bk
       |       FROM ra CROSS JOIN ca),
       |db AS (SELECT DISTINCT $keyB AS v FROM $table),
       |rb AS (SELECT v, row_number() OVER (ORDER BY v) - 1 AS r FROM db),
       |cb AS (SELECT count(*) AS c FROM db),
       |bb AS (SELECT v, cast(floor((r * cast($nb as double)) / c) as bigint) AS bk
       |       FROM rb CROSS JOIN cb)
       |SELECT t.$keyA, t.$keyB, $inter AS z
       |FROM $table t JOIN ba ON t.$keyA = ba.v JOIN bb ON t.$keyB = bb.v
       |$where
       |ORDER BY z, t.$keyA, t.$keyB""".stripMargin
  }

  /** Oracle-side SQL fragments (DuckDB) mirroring the helpers above. */
  def oMoney(e: String): String = s"cast($e as decimal(12,2))"
  def oFactor(e: String): String = s"cast($e as decimal(8,2))"
  def oDecSum(e: String): String = s"cast(sum($e) as double)"
  def oDecAvg(e: String): String = s"cast(sum($e) as double) / count(*)"
}
