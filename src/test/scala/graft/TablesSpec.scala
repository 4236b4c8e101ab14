package graft

import org.scalatest.funsuite.AnyFunSuite

/** Early-warning guard against driver testdata drift: the generator is
  * re-run between rounds and has changed physical types before
  * (events.ts went TIMESTAMP(NANOS) → TIMESTAMP(MICROS) between rounds
  * 3 and 4, silently failing all 13 events-path queries in that
  * round's gate). This loads every table at every shipped SF and pins
  * the schema contract the operators rely on.
  */
class TablesSpec extends AnyFunSuite {
  import SparkTestSession._

  private val sfs = Seq("sf0.001", "sf0.01", "sf0.1")

  test("every table loads with rows at every SF") {
    for (sf <- sfs; name <- Tables.names) {
      val df = Tables(spark, s"/root/testdata/$sf", name)
      assert(df.limit(1).count() == 1, s"$sf/$name must be readable and non-empty")
    }
  }

  test("events loader normalizes ts across testdata vintages") {
    for (sf <- sfs) {
      val ev = Tables(spark, s"/root/testdata/$sf", "events")
      val f = ev.schema.fields.map(f => f.name -> f.dataType.typeName).toMap
      assert(f("ts") == "timestamp", s"$sf ts: ${f("ts")}")
      assert(f("ts_ns") == "long", s"$sf ts_ns: ${f("ts_ns")}")
      val r = ev.selectExpr("count(*) n",
        "sum(cast(ts_ns div 1000 = unix_micros(ts) as int)) ok").head()
      assert(r.getLong(0) == r.getLong(1), s"$sf: ts_ns and ts must agree to the microsecond")
    }
  }

  test("key columns the operators depend on are present") {
    val dir = "/root/testdata/sf0.001"
    val expect = Map(
      "documents" -> Seq("doc_id", "text", "lang", "source", "n_chars"),
      "embeddings" -> Seq("vec_id", "embedding", "label"),
      "events" -> Seq("event_id", "ts", "user_id", "event_type", "value", "props"),
      "lineitem" -> Seq("l_orderkey", "l_partkey", "l_suppkey", "l_quantity",
        "l_extendedprice", "l_discount", "l_returnflag"),
      "orders" -> Seq("o_orderkey", "o_custkey", "o_totalprice", "o_orderdate"))
    for ((t, cols) <- expect) {
      val have = Tables(spark, dir, t).columns.toSet
      val missing = cols.filterNot(have)
      assert(missing.isEmpty, s"$t missing ${missing.mkString(",")} (have: $have)")
    }
  }
}
