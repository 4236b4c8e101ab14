package graft

import graft.operators.AsOfJoin
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class AsOfJoinSpec extends AnyFunSuite {
  import SparkTestSession._

  private def ts(s: String) = java.sql.Timestamp.valueOf(s)

  test("asof: picks latest right <= left time; equal time matches; no match -> null") {
    import spark.implicits._
    val left = Seq(
      (1L, 10L, ts("2024-01-05 00:00:00")), // after both orders -> order 102
      (2L, 10L, ts("2024-01-02 00:00:00")), // exactly at order 101's time -> 101 (<= semantics)
      (3L, 10L, ts("2023-12-31 00:00:00")), // before all orders -> null
      (4L, 99L, ts("2024-01-05 00:00:00"))  // key with no right rows -> null
    ).toDF("event_id", "user_id", "ts")
    val right = Seq(
      (10L, ts("2024-01-02 00:00:00"), 101L, 11.0),
      (10L, ts("2024-01-03 00:00:00"), 102L, 22.0)
    ).toDF("o_custkey", "o_orderdate", "o_orderkey", "o_totalprice")

    val out = AsOfJoin.asOf(left, col("user_id"), col("ts"),
      right, col("o_custkey"), col("o_orderdate"),
      Seq("o_orderkey", "o_totalprice"), "o_orderkey")
      .orderBy("event_id").collect()

    assert(out(0).getLong(3) == 102L)
    assert(out(1).getLong(3) == 101L)
    assert(out(2).isNullAt(3))
    assert(out(3).isNullAt(3))
  }

  test("asof: equal-time right rows resolve to highest tiebreak") {
    import spark.implicits._
    val left = Seq((1L, 5L, ts("2024-06-01 00:00:00"))).toDF("event_id", "user_id", "ts")
    val right = Seq(
      (5L, ts("2024-05-01 00:00:00"), 7L, 1.0),
      (5L, ts("2024-05-01 00:00:00"), 9L, 2.0)
    ).toDF("o_custkey", "o_orderdate", "o_orderkey", "o_totalprice")
    val out = AsOfJoin.asOf(left, col("user_id"), col("ts"),
      right, col("o_custkey"), col("o_orderdate"),
      Seq("o_orderkey"), "o_orderkey").collect()
    assert(out.head.getLong(3) == 9L)
  }
}
