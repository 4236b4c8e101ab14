package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Banded time-range join: pair left rows with right rows on the same
  * key whose timestamps fall within ±`windowSec` — without the
  * key-only join + post-filter that explodes on hot keys.
  *
  * Each left row lands in one time bucket (bucket width = window);
  * each right row is replicated into its bucket and both neighbors,
  * so every in-range pair shares a bucket. The equi-join key becomes
  * (key, bucket): shuffle cardinality grows with time-span × keys,
  * keeping reducers uniform at 100 TB where a bare key join would put
  * one entity's whole history in a single task. The exact ±window
  * predicate (microsecond precision) filters within buckets.
  * (Preference order (a): composed from built-ins.)
  *
  * Caller supplies frames with non-colliding column names; the result
  * carries all columns from both sides.
  */
object RangeJoin {

  def timeRangeJoin(
      left: DataFrame, leftKey: Column, leftTime: Column,
      right: DataFrame, rightKey: Column, rightTime: Column,
      windowSec: Long): DataFrame = {
    val wUs = windowSec * 1000000L
    val l = left.withColumn("_lb", (unix_micros(leftTime) / wUs).cast("long"))
    val r = right.withColumn("_rb",
      explode(array((-1 to 1).map(d =>
        (unix_micros(rightTime) / wUs).cast("long") + d): _*)))
    l.join(r,
      col("_lb") === col("_rb") &&
        leftKey === rightKey &&
        abs(unix_micros(leftTime) - unix_micros(rightTime)) <= wUs)
      .drop("_lb", "_rb")
  }
}
