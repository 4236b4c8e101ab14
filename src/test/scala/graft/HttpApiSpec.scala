package graft

import java.net.URI
import java.net.http.{HttpClient, HttpRequest, HttpResponse}
import java.nio.file.Files

import graft.server.HttpApi
import graft.sql.Engine
import org.scalatest.funsuite.AnyFunSuite

class HttpApiSpec extends AnyFunSuite {
  import SparkTestSession._

  private lazy val engine = new Engine(spark, dataDir = sfDir,
    catalogDir = Files.createTempDirectory("graft-http-cat").toString)
  private lazy val api = new HttpApi(engine, port = 0).start()
  private lazy val base = s"http://127.0.0.1:${api.boundPort}"
  private val client = HttpClient.newHttpClient()

  private def post(path: String, body: String): HttpResponse[String] =
    client.send(HttpRequest.newBuilder(URI.create(s"$base$path"))
      .header("Content-Type", "application/json")
      .POST(HttpRequest.BodyPublishers.ofString(body)).build(),
      HttpResponse.BodyHandlers.ofString())

  private def get(path: String): HttpResponse[String] =
    client.send(HttpRequest.newBuilder(URI.create(s"$base$path")).GET().build(),
      HttpResponse.BodyHandlers.ofString())

  test("/health responds with the success envelope") {
    val r = get("/health")
    assert(r.statusCode() == 200)
    assert(r.body().contains("\"resp_code\":0"))
  }

  test("/fetch runs SELECT over a direct path and wraps rows") {
    val r = post("/fetch", s"""{"sql": "select count(*) as n from '$sfDir/nation.parquet'"}""")
    assert(r.statusCode() == 200)
    assert(r.body().contains("\"header\":[\"n\"]"))
    assert(r.body().contains("\"rows\":[[\"25\"]]"))
    assert(r.body().contains("\"sql_type\":\"DML\""))
    assert(r.body().contains("\"query_time\""))
  }

  test("/fetch bucketed DDL creates a session-catalog table queryable by name") {
    spark.sql("drop table if exists api_li_bucketed")
    val ddl = post("/fetch",
      """{"sql": "create table api_li_bucketed () clustered by (l_orderkey) into 4 buckets location 'lineitem.parquet'"}""")
    assert(ddl.statusCode() == 200 && ddl.body().contains("\"sql_type\":\"DDL\""))
    assert(spark.catalog.tableExists("api_li_bucketed"))
    val sel = post("/fetch", """{"sql": "select count(*) as n from api_li_bucketed"}""")
    assert(sel.statusCode() == 200 && sel.body().contains("\"header\":[\"n\"]"))
    spark.sql("drop table if exists api_li_bucketed")
  }

  test("/fetch DDL then named query; /catalog lists the table") {
    val ddl = post("/fetch", """{"sql": "create table api_nation (n_nationkey int) comment 'api test' location 'nation.parquet'"}""")
    assert(ddl.body().contains("\"sql_type\":\"DDL\""))
    val sel = post("/fetch", """{"sql": "select count(*) as n from api_nation"}""")
    assert(sel.body().contains("\"rows\":[[\"25\"]]"))
    val cat = get("/catalog")
    assert(cat.body().contains("\"table_ref\":\"api_nation\""))
    assert(cat.body().contains("\"field\":\"n_nationkey\""))
  }

  test("/catalog carries entry kind and declared layout") {
    // a pointer table, a bucketed DDL table, and a standing-index
    // registration must each surface their kind; the bucketed entry
    // additionally exposes its physical layout
    post("/fetch", """{"sql": "create table api_kind_plain () location 'region.parquet'"}""")
    spark.sql("drop table if exists api_kind_bucketed")
    post("/fetch",
      """{"sql": "create table api_kind_bucketed () clustered by (s_suppkey) into 2 buckets location 'supplier.parquet'"}""")
    engine.catalog.register("idx_api_probe", "/tmp/idx_api_probe.parquet",
      Nil, Some("standing index artifact"), entryType = "INDEX")
    val body = get("/catalog").body()
    assert(body.contains("\"table_ref\":\"api_kind_plain\"") &&
      body.contains("\"entry_type\":\"MANAGED\""))
    assert(body.contains("\"table_ref\":\"api_kind_bucketed\"") &&
      body.contains("\"entry_type\":\"BUCKETED\""))
    assert(body.contains("\"bucket_by\":\"s_suppkey\"") &&
      body.contains("\"num_buckets\":2"))
    assert(body.contains("\"table_ref\":\"idx_api_probe\"") &&
      body.contains("\"entry_type\":\"INDEX\""))
    spark.sql("drop table if exists api_kind_bucketed")
  }

  test("/index/refresh rebuilds stale standing indexes and surfaces generations") {
    import java.nio.file.{Files => JFiles, Paths, StandardCopyOption}
    val dir = JFiles.createTempDirectory("graft-http-idx")
    try {
      // corpus v1 → refresh builds; a second refresh is a no-op; then
      // the corpus is REWRITTEN in place and refresh must rebuild so
      // served results match the live corpus (the full index lifecycle
      // over the HTTP surface)
      JFiles.copy(Paths.get("/root/testdata/sf0.001/embeddings.parquet"),
        dir.resolve("embeddings.parquet"))
      val r1 = post("/index/refresh", s"""{"dir": "${dir.toString}"}""")
      assert(r1.statusCode() == 200 && r1.body().contains("\"pq\":true"), r1.body())
      val r2 = post("/index/refresh", s"""{"dir": "${dir.toString}"}""")
      assert(r2.body().contains("\"pq\":false"), s"steady state must not rebuild: ${r2.body()}")
      // refreshed INDEX entries (with generation) are mirrored into the
      // engine catalog GET /catalog serves
      val cat = get("/catalog").body()
      assert(cat.contains("\"table_ref\":\"idx_ann_pq_coded\"") &&
        cat.contains("\"generation\":\""), cat.take(500))
      JFiles.copy(Paths.get("/root/testdata/sf0.01/embeddings.parquet"),
        dir.resolve("embeddings.parquet"), StandardCopyOption.REPLACE_EXISTING)
      val r3 = post("/index/refresh", s"""{"dir": "${dir.toString}"}""")
      assert(r3.body().contains("\"pq\":true"), s"rewrite must rebuild: ${r3.body()}")
      // served results now come from the new generation
      val served = graft.queries.IndexOps.sim_topk_pq_indexed(spark, dir.toString)
        .collect().map(_.toString).toSet
      val twin = graft.queries.LlmOps.queries("sim_topk_pq")(spark, dir.toString)
        .collect().map(_.toString).toSet
      assert(served == twin, "post-refresh serving must match the live corpus")
    } finally {
      import scala.jdk.CollectionConverters._
      JFiles.walk(dir).iterator().asScala.toSeq
        .sortBy(-_.getNameCount).foreach(JFiles.deleteIfExists(_))
    }
  }

  test("routing: prefix paths 404, wrong methods 405, bad JSON 400") {
    assert(post("/fetchanything", "{}").statusCode() == 404)
    assert(get("/fetch").statusCode() == 405)
    assert(post("/fetch", """{"sql": "select 1""").statusCode() == 400)
  }

  test("/fetch rejects non-SELECT/CREATE with resp_code 1") {
    val r = post("/fetch", """{"sql": "drop table x"}""")
    assert(r.statusCode() == 422)
    assert(r.body().contains("\"resp_code\":1"))
  }

  test("/query/export downloads CSV bytes") {
    val r = post("/query/export",
      s"""{"sql": "select r_regionkey, r_name from '$sfDir/region.parquet' order by r_regionkey", "file_type": "CSV"}""")
    assert(r.statusCode() == 200)
    val lines = r.body().linesIterator.toSeq
    assert(lines.head == "r_regionkey,r_name")
    assert(lines.size == 6)
    assert(r.headers().firstValue("attachment").isPresent)
  }

  test("/query/history returns recent queries newest-first") {
    post("/fetch", """{"sql": "select 42 as answer"}""")
    val r = get("/query/history")
    assert(r.body().contains("select 42 as answer"))
    assert(r.body().contains("\"status\":\"successful\""))
  }

  test("parallel /fetch + /query/export: every response intact, history consistent") {
    import java.util.concurrent.{Callable, Executors, TimeUnit}
    // FAIR mode + per-request pools is the serving posture under test
    assert(spark.sparkContext.getConf.get("spark.scheduler.mode") == "FAIR")
    val nFetch = 12
    val sqls = (0 until nFetch).map(i =>
      s"select $i as tag, count(*) as n from '$sfDir/nation.parquet' where n_nationkey >= 0")
    val clientPool = Executors.newFixedThreadPool(16)
    try {
      val fetches = sqls.map { s =>
        clientPool.submit(new Callable[java.net.http.HttpResponse[String]] {
          def call() = post("/fetch", s"""{"sql": "$s"}""")
        })
      }
      val exports = (0 until 4).map { _ =>
        clientPool.submit(new Callable[java.net.http.HttpResponse[String]] {
          def call() = post("/query/export",
            s"""{"sql": "select n_name from '$sfDir/nation.parquet' order by n_name", "file_type": "CSV"}""")
        })
      }
      // every fetch returns ITS OWN tag (no cross-thread result bleed
      // through the shared session) and the same nation count
      fetches.zipWithIndex.foreach { case (f, i) =>
        val r = f.get(180, TimeUnit.SECONDS)
        assert(r.statusCode() == 200, s"fetch $i: ${r.body().take(200)}")
        assert(r.body().contains("\"header\":[\"tag\",\"n\"]"), s"fetch $i header")
        assert(r.body().contains(s"""["$i","25"]"""), s"fetch $i rows: ${r.body().take(200)}")
      }
      exports.foreach { f =>
        val r = f.get(180, TimeUnit.SECONDS)
        assert(r.statusCode() == 200)
        assert(r.body().linesIterator.next() == "n_name")
      }
      // the synchronized history log absorbed every concurrent append
      // intact: all 12 fetch statements present, none torn
      val hist = get("/query/history").body()
      sqls.foreach(s => assert(hist.contains(s), s"history lost: $s"))
    } finally clientPool.shutdown()
  }
}
