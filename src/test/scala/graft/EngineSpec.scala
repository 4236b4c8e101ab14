package graft

import java.nio.file.Files

import graft.sql.{Engine, GraftSqlException, SqlClassify, CreateTableStatement, DmlStatement}
import org.scalatest.funsuite.AnyFunSuite

class EngineSpec extends AnyFunSuite {
  import SparkTestSession._

  private def freshEngine(): Engine =
    new Engine(spark, dataDir = sfDir,
      catalogDir = Files.createTempDirectory("graft-cat").toString)

  test("classify: DML vs DDL vs rejected") {
    assert(SqlClassify.classify("select 1") == DmlStatement("select 1"))
    assert(SqlClassify.classify("WITH x AS (select 1) select * from x").isInstanceOf[DmlStatement])
    val ddl = SqlClassify.classify(
      "create table user (id int, name string) comment 'people' location 'example/user.csv'")
    assert(ddl == CreateTableStatement("user",
      Seq(catalog.TableField("id", "int"), catalog.TableField("name", "string")),
      "example/user.csv", Some("people")))
    intercept[GraftSqlException](SqlClassify.classify("drop table x"))
    intercept[GraftSqlException](SqlClassify.classify("create view v as select 1"))
  }

  test("fetch caps rows at the limit inside the plan") {
    val eng = freshEngine()
    val res = eng.execute(s"select l_orderkey from '$sfDir/lineitem.parquet' order by l_orderkey", limit = 200)
    assert(res.rows.size == 200)
    assert(res.sqlType == "DML")
    assert(res.header == Seq("l_orderkey"))
  }

  test("nulls render as 'null' like the reference formatter") {
    val eng = freshEngine()
    val res = eng.execute("select cast(null as int) as a, 1 as b")
    assert(res.rows == Seq(Seq("null", "1")))
  }

  test("DDL registers in the persistent catalog; a second engine on the same dir sees it") {
    val dir = Files.createTempDirectory("graft-cat").toString
    val e1 = new Engine(spark, dataDir = sfDir, catalogDir = dir)
    val r = e1.execute("create table li_ext () location 'lineitem.parquet'")
    assert(r.sqlType == "DDL" && r.rows == Seq(Seq("successful")))
    val e2 = new Engine(spark, dataDir = sfDir, catalogDir = dir)
    val res = e2.execute("select count(*) as n from li_ext")
    assert(res.rows.head.head.toLong > 0)
    assert(e2.catalog.listTables.exists(_.tableRef == "li_ext"))
  }

  test("query history records status, newest first, capped") {
    val eng = freshEngine()
    eng.execute("select 1 as x")
    intercept[Exception](eng.execute("select * from no_such_table_zzz"))
    val h = eng.catalog.history(30)
    assert(h.head.sql.contains("no_such_table_zzz") && h.head.status == "fail")
    assert(h(1).status == "successful")
  }

  test("export writes a single CSV file with header") {
    val eng = freshEngine()
    val out = Files.createTempDirectory("graft-exp").toString + "/out.csv"
    val p = eng.exportFile(s"select n_nationkey, n_name from '$sfDir/nation.parquet' order by n_nationkey", "CSV", out)
    val lines = scala.io.Source.fromFile(p).getLines().toSeq
    assert(lines.head == "n_nationkey,n_name")
    assert(lines.size == 26)
  }

  test("direct-path with alias joins a catalog table in one statement") {
    val eng = freshEngine()
    eng.execute("create table ord_cat () location 'orders.parquet'")
    val res = eng.execute(
      s"""select count(*) as n
         |from '$sfDir/lineitem.parquet' as li
         |join ord_cat o on li.l_orderkey = o.o_orderkey
         |where o.o_totalprice > 450000.0""".stripMargin)
    assert(res.rows.head.head.toLong > 0)
  }

  test("direct-path quoted string in a predicate is NOT treated as a table") {
    val eng = freshEngine()
    val res = eng.execute("select 'x.csv' as lit_col")
    assert(res.rows == Seq(Seq("x.csv")))
  }
}
