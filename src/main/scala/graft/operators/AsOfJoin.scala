package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of (backward-looking temporal) join: for every left row, attach
  * the most recent right row with `right.time <= left.time` on the
  * same key. An operator the reference lacks, composed from Spark
  * built-ins (SURVEY.md §2 preference order (a)):
  *
  * union the two sides tagged by origin, sort within each key
  * partition by (time, origin, tiebreak), and carry the latest right
  * payload forward with `last(ignoreNulls) over rows-unbounded-
  * preceding`. Cost: ONE shuffle on the key + a partition-local sort —
  * no row expansion, no per-left-row probing — which is the plan a
  * native as-of join would produce and what you want at 100 TB
  * (contrast: the naive join-filter-reaggregate expands every
  * (left, earlier-right) pair).
  *
  * Right rows sort before left rows at equal timestamps, so an exact
  * tie counts as "already happened" (<= semantics). Among equal-time
  * right rows the highest `rightTiebreak` wins.
  */
object AsOfJoin {

  def asOf(
      left: DataFrame, leftKey: Column, leftTime: Column,
      right: DataFrame, rightKey: Column, rightTime: Column,
      rightPayload: Seq[String], rightTiebreak: String): DataFrame = {

    val leftCols = left.columns.toSeq
    val payload = struct((rightPayload :+ rightTiebreak).distinct.map(col): _*)

    // null-timestamp right rows would sort FIRST (ASC null ordering)
    // and become phantom "most recent prior" matches — exclude them
    val rSel = right.filter(rightTime.isNotNull).select(
      rightKey.as("_k"), rightTime.as("_t"),
      lit(0).as("_origin"),
      col(rightTiebreak).cast("long").as("_tie"),
      payload.as("_rp"))
    val payloadType = rSel.schema("_rp").dataType

    val lSel = left.select(
      (leftCols.map(col) :+ leftKey.as("_k") :+ leftTime.as("_t") :+
        lit(1).as("_origin") :+ lit(0L).as("_tie") :+
        lit(null).cast(payloadType).as("_rp")): _*)

    val rAligned = rSel.select(
      (leftCols.map(c => lit(null).cast(left.schema(c).dataType).as(c)) ++
        Seq(col("_k"), col("_t"), col("_origin"), col("_tie"), col("_rp"))): _*)

    val w = Window.partitionBy(col("_k"))
      .orderBy(col("_t"), col("_origin"), col("_tie"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)

    lSel.unionByName(rAligned)
      .withColumn("_last_rp", last(col("_rp"), ignoreNulls = true).over(w))
      .filter(col("_origin") === 1)
      .select((leftCols.map(col) ++
        rightPayload.map(p => col(s"_last_rp.$p").as(p))): _*)
  }
}
