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

  /** Oracle-side SQL fragments (DuckDB) mirroring the helpers above. */
  def oMoney(e: String): String = s"cast($e as decimal(12,2))"
  def oFactor(e: String): String = s"cast($e as decimal(8,2))"
  def oDecSum(e: String): String = s"cast(sum($e) as double)"
  def oDecAvg(e: String): String = s"cast(sum($e) as double) / count(*)"
}
