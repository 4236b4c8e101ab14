package graft

import graft.streaming.Events
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Specs for the round-4 events/format additions: hopping-window
  * aggregation and the ORC columnar roundtrip.
  */
class EventsOpsSpec extends AnyFunSuite {
  import SparkTestSession._

  test("sliding agg: each event lands in exactly the two hop windows covering it") {
    import spark.implicits._
    val ev = Seq(
      ("2024-01-01 10:30:00", "click", 1.0),
      ("2024-01-01 10:45:00", "click", 2.0),
      ("2024-01-01 12:05:00", "view", 4.0)
    ).toDF("ts_s", "event_type", "value")
      .select(col("ts_s").cast("timestamp").as("ts"), col("event_type"), col("value"))
    val r = Events.slidingAgg(ev).collect()
      .map(x => (x.getString(0), x.getString(1)) -> ((x.getLong(2), x.getDouble(3))))
      .toMap
    // clicks at 10:30/10:45 cover window starts 09 and 10; view at
    // 12:05 covers 11 and 12 — 2 windows per event, nothing else
    assert(r.size == 4, s"$r")
    assert(r(("2024-01-01 09", "click")) == ((2L, 3.0)))
    assert(r(("2024-01-01 10", "click")) == ((2L, 3.0)))
    assert(r(("2024-01-01 11", "view")) == ((1L, 4.0)))
    assert(r(("2024-01-01 12", "view")) == ((1L, 4.0)))
    // invariant: every event contributes size/slide = 2 window rows
    val total = Events.slidingAgg(ev).agg(sum("n")).head.getLong(0)
    assert(total == 2 * ev.count())
  }

  test("orc roundtrip: read-back equals the parquet source, filter pushed to the scan") {
    val got = graft.queries.EngineOps.fmt_orc_roundtrip(spark, sfDir)
    val want = Tables(spark, sfDir, "orders")
      .filter(col("o_orderkey") <= 2000)
      .select(col("o_orderkey"), col("o_custkey"), col("o_orderstatus"), col("o_totalprice"))
    assert(got.count() == want.count())
    assert(got.exceptAll(want).isEmpty && want.exceptAll(got).isEmpty)
    val plan = got.queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters") && plan.toLowerCase.contains("orc"),
      s"expected ORC scan with pushed filter:\n$plan")
  }
}
