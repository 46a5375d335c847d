package graft

import graft.operators.{Cohort, CohortQuery}
import graft.serve.WarehouseServer
import graft.sources.Snapshots
import org.json4s._
import org.json4s.jackson.JsonMethods

import java.net.URI
import java.net.http.{HttpClient, HttpRequest, HttpResponse}
import java.nio.charset.StandardCharsets.UTF_8

/** The serving layer: the reference is a service, so graft's REST
  * facade is checked end-to-end over real HTTP against the library
  * calls it fronts — same counts, same rows, bounded pages, typed
  * errors, allowlisted paths.
  */
class ServeSpec extends SparkSpec with org.scalatest.BeforeAndAfterAll {

  private lazy val storeRoot = tmpDir("serve-store")
  private var started = false
  private lazy val running = {
    started = true
    WarehouseServer.start(spark, WarehouseServer.Config(
      dataDir = sf, storeRoot = Some(storeRoot)))
  }

  override def afterAll(): Unit = {
    if (started) running.close()
    super.afterAll()
  }
  private lazy val base = s"http://127.0.0.1:${running.port}"
  private val client = HttpClient.newHttpClient()

  private def get(path: String): (Int, JValue) = {
    val r = client.send(
      HttpRequest.newBuilder(URI.create(s"$base$path")).GET().build(),
      HttpResponse.BodyHandlers.ofString())
    (r.statusCode(), JsonMethods.parse(r.body()))
  }

  private def post(path: String, body: String): (Int, JValue) = {
    val r = client.send(
      HttpRequest.newBuilder(URI.create(s"$base$path"))
        .POST(HttpRequest.BodyPublishers.ofString(body, UTF_8)).build(),
      HttpResponse.BodyHandlers.ofString())
    (r.statusCode(), JsonMethods.parse(r.body()))
  }

  private def rows(v: JValue): List[JValue] = (v \ "rows").asInstanceOf[JArray].arr
  private def longOf(v: JValue): Long = v match {
    case JInt(i)  => i.toLong
    case JLong(l) => l
    case other    => fail(s"expected an integer, got $other")
  }

  test("service document and health") {
    val (code, doc) = get("/")
    assert(code == 200)
    assert(doc \ "service" == JString("graft-warehouse"))
    val links = (doc \ "links").asInstanceOf[JArray].arr
    assert(links.exists(l => l \ "href" == JString("/cohort/query")))
    val (hc, health) = get("/health")
    assert(hc == 200 && health \ "status" == JString("ok"))
    assert(health \ "spark_version" == JString(spark.version))
  }

  test("tables listing is the allowlist with schemas") {
    val (code, v) = get("/tables")
    assert(code == 200)
    val names = v.asInstanceOf[JArray].arr.map(t => (t \ "name").asInstanceOf[JString].s)
    assert(names.size == 10 && names.contains("lineitem") && names.contains("events"))
    val li = v.asInstanceOf[JArray].arr.find(t => t \ "name" == JString("lineitem")).get
    val cols = (li \ "columns").asInstanceOf[JArray].arr.map(c => (c \ "name").asInstanceOf[JString].s)
    assert(cols.contains("l_quantity"))
  }

  test("cohort query over HTTP equals the library count") {
    val direct = CohortQuery.count(spark, sf, CohortQuery.demoSpec)
      .collect()(0).getLong(0)
    val (code, v) = post("/cohort/query", CohortQuery.demoSpec)
    assert(code == 200)
    assert(longOf(v \ "n_subjects") == direct)
  }

  test("cohort population pages and marks truncation") {
    val (code, v) = post("/cohort/population?limit=3", CohortQuery.demoSpec)
    assert(code == 200)
    assert(v \ "columns" == JArray(List(JString("subject"))))
    assert(rows(v).size == 3 && v \ "truncated" == JBool(true))
    // sorted ascending: the page is deterministic, not partition order
    val keys = rows(v).map(r => longOf(r \ "subject"))
    assert(keys == keys.sorted)
  }

  test("per-atom counts, including a zero-match atom") {
    val spec =
      """{"population": "subject", "atoms": [
           {"source": "orders", "field": "o_orderpriority", "op": "eq", "value": "1-URGENT"},
           {"source": "customer", "field": "c_acctbal", "op": "gt", "value": 99999999}
         ]}"""
    val (code, v) = post("/cohort/atom-counts", spec)
    assert(code == 200)
    val byAtom = rows(v).map(r => longOf(r \ "atom") -> longOf(r \ "n_subjects")).toMap
    val urgent = Tables.orders(spark, sf)
      .filter(org.apache.spark.sql.functions.col("o_orderpriority") === "1-URGENT")
      .select("o_custkey").distinct().count()
    assert(byAtom == Map(0L -> urgent, 1L -> 0L))
  }

  test("item stats endpoint equals the oracle-pinned q45 frame") {
    val direct = Cohort.itemStats(Tables.lineitem(spark, sf), "l_quantity", Some("l_returnflag"))
      .collect()
    val (code, v) = get("/items/stats?source=lineitem&field=l_quantity&by=l_returnflag")
    assert(code == 200)
    val got = rows(v)
    assert(got.size == direct.length)
    got.zip(direct).foreach { case (j, r) =>
      assert((j \ "l_returnflag").asInstanceOf[JString].s == r.getString(0))
      assert(longOf(j \ "n_obs") == r.getLong(6))
      assert((j \ "avg_q").asInstanceOf[JDouble].num == r.getDouble(3))
    }
  }

  test("singleton groups get null stddev instead of an ANSI divide-by-zero 500") {
    // region: 5 rows, 5 distinct names -> every group has n_obs = 1.
    // Sample stddev is undefined there; the endpoint must return the
    // other stats with std_q null, not fail the whole request.
    val (code, v) = get("/items/stats?source=region&field=r_regionkey&by=r_name")
    assert(code == 200)
    val got = rows(v)
    assert(got.size == 5)
    got.foreach { j =>
      assert(longOf(j \ "n_obs") == 1L)
      assert((j \ "std_q") == JNull)
      assert((j \ "avg_q").isInstanceOf[JDouble])
    }
  }

  test("histogram and frequencies endpoints") {
    val (hc, h) = get("/items/histogram?source=orders&field=o_totalprice&width=50000")
    assert(hc == 200 && rows(h).nonEmpty)
    val (fc, f) = get("/items/frequencies?source=orders&field=o_orderpriority")
    assert(fc == 200)
    val shares = rows(f).map(r => (r \ "share").asInstanceOf[JDouble].num)
    assert(math.abs(shares.sum - 1.0) < 1e-9)
  }

  test("metadata search by substring and by regex") {
    val direct = Cohort.metadataSearch(Tables.part(spark, sf), Some("blue")).count()
    val (code, v) = get("/metadata/search?q=blue")
    assert(code == 200 && longOf(v \ "row_count") == direct)
    val (rc, rv) = get("/metadata/search?regex=%5Esmall%20.*(bolt%7Crod)%24")
    assert(rc == 200)
    val reDirect = Cohort.metadataSearch(Tables.part(spark, sf),
      None, Some("^small .*(bolt|rod)$")).count()
    assert(longOf(rv \ "row_count") == reDirect)
  }

  test("named queries: discovery and bounded execution") {
    val (code, v) = get("/queries")
    assert(code == 200)
    val names = v.asInstanceOf[JArray].arr.map(q => (q \ "name").asInstanceOf[JString].s)
    assert(names.size == SparkEntry.defs.size && names.contains("q03_agg_group"))
    val (qc, qv) = post("/queries/q05_distinct", "")
    assert(qc == 200 && longOf(qv \ "row_count") == 5 && qv \ "truncated" == JBool(false))
    assert(post("/queries/nope", "")._1 == 404)
  }

  test("typed errors: bad JSON, unknown table, bad route, bad limit, bad method") {
    assert(post("/cohort/query", "{nope")._1 == 400)
    assert(get("/items/stats?source=shadow&field=x")._1 == 400)
    assert(get("/items/stats?source=lineitem&field=no_such_col")._1 == 400)
    assert(get("/nope")._1 == 404)
    assert(get("/metadata/search?q=blue&limit=-1")._1 == 400)
    val r = client.send(
      HttpRequest.newBuilder(URI.create(s"$base/health"))
        .method("DELETE", HttpRequest.BodyPublishers.noBody()).build(),
      HttpResponse.BodyHandlers.ofString())
    assert(r.statusCode() == 405)
    // known path, wrong verb: 405 (not 404)
    assert(post("/health", "")._1 == 405)
    assert(get("/cohort/query")._1 == 405)
  }

  test("store endpoints: import, versions, versioned read, path jail") {
    import org.apache.spark.sql.functions.col
    // stage an import batch under the store root (an allowed source)
    val src = s"$storeRoot/incoming"
    spark.range(5).select(col("id").as("k"), (col("id") * 10).as("v"))
      .write.parquet(src)
    val (cc, cv) = post("/store/commit", s"""{"source": "$src", "mode": "full"}""")
    assert(cc == 200 && longOf(cv \ "version") == 1L)
    val delta = s"$storeRoot/incoming2"
    spark.range(2).select((col("id") + 10).as("k"), col("id").as("v"))
      .write.parquet(delta)
    assert(post("/store/commit", s"""{"source": "$delta"}""")._1 == 200)
    val (vc, vv) = get("/store/versions")
    assert(vc == 200 && vv.asInstanceOf[JArray].arr.size == 2)
    val (rc, rv) = get("/store/read?keys=k")
    assert(rc == 200 && longOf(rv \ "row_count") == 7)
    val (ac, av) = get("/store/read?keys=k&version=1")
    assert(ac == 200 && longOf(av \ "row_count") == 5)
    // a source outside dataDir/storeRoot is refused, not read
    assert(post("/store/commit", """{"source": "/etc", "mode": "full"}""")._1 == 403)
  }

  test("concurrent requests share one session and stay independent") {
    val expected = CohortQuery.count(spark, sf, CohortQuery.demoSpec)
      .collect()(0).getLong(0)
    val freqRows = Cohort.valueFrequencies(Tables.orders(spark, sf), "o_orderpriority").count()
    import scala.concurrent.{Await, Future}
    import scala.concurrent.duration._
    implicit val ec = scala.concurrent.ExecutionContext.global
    // 8 in-flight requests against the server's shared SparkSession:
    // job groups are per-handler-thread, results must not cross-talk
    val futs = (0 until 8).map { i =>
      Future {
        if (i % 2 == 0) {
          val (c, v) = post("/cohort/query", CohortQuery.demoSpec)
          c == 200 && longOf(v \ "n_subjects") == expected
        } else {
          val (c, v) = get("/items/frequencies?source=orders&field=o_orderpriority")
          c == 200 && longOf(v \ "row_count") == freqRows
        }
      }
    }
    val results = Await.result(Future.sequence(futs), 120.seconds)
    assert(results.forall(identity))
  }

  test("a server without a store answers 404 on store routes, not 500") {
    val bare = WarehouseServer.start(spark, WarehouseServer.Config(dataDir = sf))
    try {
      val r = client.send(
        HttpRequest.newBuilder(
          URI.create(s"http://127.0.0.1:${bare.port}/store/versions")).GET().build(),
        HttpResponse.BodyHandlers.ofString())
      assert(r.statusCode() == 404)
    } finally bare.close()
  }
}
