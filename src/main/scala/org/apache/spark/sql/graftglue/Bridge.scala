package org.apache.spark.sql.graftglue

import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils
import org.apache.spark.sql.{Column, SparkSession}

/** Thin bridge into Spark's `private[sql]` surface — the sanctioned
  * extension-library pattern (a subpackage of org.apache.spark.sql so
  * `private[sql]` members resolve). Keeps ALL such access in one
  * package; everything under `graft.*` stays on public API.
  */
object Bridge {

  /** Wrap a raw Catalyst expression as a user-facing Column. */
  def column(e: Expression): Column = ExpressionUtils.column(e)

  /** The Catalyst expression behind a Column. */
  def expression(c: Column): Expression = ExpressionUtils.expression(c)

  /** Register a Catalyst expression builder as a SQL function for this
    * session (codegen-preserving, unlike spark.udf.register).
    */
  def registerFunction(
      spark: SparkSession,
      name: String,
      builder: Seq[Expression] => Expression): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      name, builder, "scala_udf")
}
