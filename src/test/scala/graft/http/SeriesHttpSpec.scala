package graft.http

import graft.SparkSpec
import graft.sources.SeriesStore

import java.net.URI
import java.net.http.{HttpClient, HttpRequest, HttpResponse}
import java.nio.file.Files

/** End-to-end HTTP surface test: every route a seriesly client uses,
 * against the real store + engine (reference: main.go:80-110). */
class SeriesHttpSpec extends SparkSpec with org.scalatest.BeforeAndAfterAll {

  private lazy val store = new SeriesStore(spark,
    Files.createTempDirectory("graft-http").toString)
  private lazy val api = new SeriesHttp(store)
  private lazy val port = api.start()
  private lazy val client = HttpClient.newHttpClient()

  private def req(method: String, path: String, body: String = ""): (Int, String) = {
    val b = HttpRequest.newBuilder(URI.create(s"http://127.0.0.1:$port$path"))
    val r = method match {
      case "GET" => b.GET()
      case "DELETE" => b.DELETE()
      case m => b.method(m, HttpRequest.BodyPublishers.ofString(body))
    }
    val resp = client.send(r.build(), HttpResponse.BodyHandlers.ofString())
    (resp.statusCode(), resp.body())
  }

  test("full HTTP lifecycle: create, ingest, query, scan, delete") {
    assert(req("PUT", "/db1")._1 == 201)
    assert(req("GET", "/_all_dbs")._2 == """["db1"]""")

    // three documents at known keys (PUT /{db}/{key})
    assert(req("PUT", "/db1/2012-08-28T21:24:00Z", """{"v": 10}""")._1 == 201)
    assert(req("PUT", "/db1/2012-08-28T21:24:20Z",
      """{"v": 20, "sub": {"x": "a"}}""")._1 == 201)
    // POST with explicit ts param
    assert(req("POST", "/db1?ts=2012-08-28T21:24:40Z", """{"v": 25}""")._1 == 201)
    // invalid JSON rejected
    assert(req("PUT", "/db1/2012-08-28T21:25:00Z", "not json")._1 == 400)

    val (gc, doc) = req("GET", "/db1/2012-08-28T21:24:20Z")
    assert(gc == 200 && doc == """{"v": 20, "sub": {"x": "a"}}""")
    assert(req("GET", "/db1/2000-01-01T00:00:00Z")._1 == 404)

    val (ic, info) = req("GET", "/db1")
    assert(ic == 200 && info.contains("\"doc_count\":3"))

    // the analytical path (minimum E2E slice, SURVEY §7.2)
    val (qc, qbody) = req("GET",
      "/db1/_query?group=60000&ptr=/v&reducer=avg&f=/sub/x&fv=a")
    assert(qc == 200 && qbody == """{"1346189040000":[20]}""")

    // multi-reducer with _id pointer
    val (_, q2) = req("GET",
      "/db1/_query?group=60000&ptr=/v&ptr=_id&reducer=sum&reducer=any")
    assert(q2 == """{"1346189040000":[55,"2012-08-28T21:24:00Z"]}""")

    val (_, all) = req("GET", "/db1/_all?limit=2")
    assert(all == """{"2012-08-28T21:24:00Z": {"v": 10},"2012-08-28T21:24:20Z": {"v": 20, "sub": {"x": "a"}}}""")
    val (_, dump) = req("GET", "/db1/_dump?from=2012-08-28T21:24:30Z")
    assert(dump == """{"2012-08-28T21:24:40Z": {"v": 25}}""")

    // unimplemented routes mirror the reference's 501
    assert(req("GET", "/db1/_changes")._1 == 501)
    assert(req("DELETE", "/db1/2012-08-28T21:24:00Z")._1 == 501)

    // bad query params on an EXISTING db → 400, not 500
    assert(req("GET", "/db1/_query?ptr=/v&reducer=sum")._1 == 400)

    val (_, del) = req("DELETE", "/db1/_bulk?from=2012-08-28T21:24:00Z&to=2012-08-28T21:24:30Z")
    assert(del == """{"deleted":2}""")
    assert(req("POST", "/db1/_compact")._1 == 200)
    assert(req("GET", "/db1")._2.contains("\"doc_count\":1"))

    assert(req("DELETE", "/db1")._1 == 200)
    assert(req("GET", "/_all_dbs")._2 == "[]")
    assert(req("GET", "/db1")._1 == 404)

    // routes on a missing db → 404, matching the reference: scans and
    // queries, and crucially WRITES — parquet append would otherwise
    // silently re-create the dropped db
    assert(req("GET", "/db1/_query?group=60000&ptr=/v&reducer=sum")._1 == 404)
    assert(req("GET", "/db1/_all")._1 == 404)
    assert(req("POST", "/db1", """{"v": 1}""")._1 == 404)
    assert(req("PUT", "/db1/2012-08-28T21:24:00Z", """{"v": 1}""")._1 == 404)
    assert(req("GET", "/_all_dbs")._2 == "[]")
  }

  test("_query post-processing: fill + smooth + anomaly append derived values") {
    assert(req("PUT", "/pp")._1 == 201)
    // minute buckets 21:24 and 21:26 — 21:25 is a gap
    assert(req("PUT", "/pp/2012-08-28T21:24:00Z", """{"v": 10}""")._1 == 201)
    assert(req("PUT", "/pp/2012-08-28T21:26:00Z", """{"v": 30}""")._1 == 201)
    // fill alone: the gap bucket appears with a null reducer value,
    // base arity unchanged
    val (fc, fo) = req("GET", "/pp/_query?group=60000&ptr=/v&reducer=sum&fill=1")
    assert(fc == 200 && fo ==
      """{"1346189040000":[10],"1346189100000":[null],"1346189160000":[30]}""")
    // fill → smooth(roll 2, α=0.5, 2 lags) → anomaly(0.9) appends
    // [roll_mean, ewma, z, is_anomaly] after the reducer value:
    //   sums (10, null, 30); roll2 = 10, 10, 30; ewma = 10, 10, 30
    //   occupied stats m=20 σ=10 → z = -1, null, 1; |z| > 0.9 flags
    val (c, body) = req("GET", "/pp/_query?group=60000&ptr=/v&reducer=sum" +
      "&fill=1&smooth_roll=2&smooth_alpha=0.5&smooth_lags=2&anomaly=0.9")
    assert(c == 200 && body ==
      """{"1346189040000":[10,10,10,-1,true],""" +
        """"1346189100000":[null,10,10,null,false],""" +
        """"1346189160000":[30,30,30,1,true]}""")
    // smoothing a non-numeric reducer is a 400, not a plan explosion
    assert(req("GET",
      "/pp/_query?group=60000&ptr=/v&reducer=identity&smooth_roll=2")._1 == 400)
    assert(req("DELETE", "/pp")._1 == 200)
  }

  test("_query post-processing: seasonal + changepoint append derived values") {
    assert(req("PUT", "/pp2")._1 == 201)
    // perfectly periodic minute series, period 2: 10, 2, 10, 2
    assert(req("PUT", "/pp2/2012-08-28T21:24:00Z", """{"v": 10}""")._1 == 201)
    assert(req("PUT", "/pp2/2012-08-28T21:25:00Z", """{"v": 2}""")._1 == 201)
    assert(req("PUT", "/pp2/2012-08-28T21:26:00Z", """{"v": 10}""")._1 == 201)
    assert(req("PUT", "/pp2/2012-08-28T21:27:00Z", """{"v": 2}""")._1 == 201)
    // seasonal(2): phase means 10/2, residuals all 0. changepoint on
    // sums (10,2,10,2): μ=6, cusum 4,0,4,0 → earliest peak flags.
    // Derived emit order: seasonal_mean, residual, cusum, is_changepoint
    val (c, body) = req("GET", "/pp2/_query?group=60000&ptr=/v&reducer=sum" +
      "&seasonal=2&changepoint=1")
    assert(c == 200 && body ==
      """{"1346189040000":[10,10,0,4,true],""" +
        """"1346189100000":[2,2,0,0,false],""" +
        """"1346189160000":[10,10,0,4,false],""" +
        """"1346189220000":[2,2,0,0,false]}""", body)
    // changepoint on a non-numeric reducer is a 400
    assert(req("GET",
      "/pp2/_query?group=60000&ptr=/v&reducer=identity&changepoint=1")._1 == 400)
    // fill-only ignores a stray post_col (no numeric op dereferences
    // it) — must be a 200, not an index-out-of-bounds 500
    assert(req("GET",
      "/pp2/_query?group=60000&ptr=/v&reducer=sum&fill=1&post_col=5")._1 == 200)
    assert(req("DELETE", "/pp2")._1 == 200)
  }

  test("a _query past maxQueryTime is cancelled and returns an error") {
    // zero budget → deterministically past-deadline (the reference's
    // queryExecutor refuses already-late work the same way,
    // query.go:301-310); live mid-flight cancellation is covered by
    // QueryDeadlineSpec
    val timedOut = new SeriesHttp(store,
      maxQueryTime = scala.concurrent.duration.Duration.Zero)
    val tport = timedOut.start()
    try {
      req("PUT", "/slow")
      req("PUT", "/slow/2012-08-28T21:24:00Z", """{"v": 1}""")
      val resp = client.send(
        HttpRequest.newBuilder(URI.create(
          s"http://127.0.0.1:$tport/slow/_query?group=60000&ptr=/v&reducer=sum"))
          .GET().build(),
        HttpResponse.BodyHandlers.ofString())
      assert(resp.statusCode() == 500)
      assert(resp.body().contains("timed out"))
    } finally timedOut.stop()
  }

  test("gzip negotiation: Accept-Encoding gzip compresses the response") {
    req("PUT", "/gz")
    req("PUT", "/gz/2012-08-28T21:24:00Z", """{"v": 1}""")
    val r = client.send(
      HttpRequest.newBuilder(URI.create(s"http://127.0.0.1:$port/_all_dbs"))
        .header("Accept-Encoding", "gzip").GET().build(),
      HttpResponse.BodyHandlers.ofByteArray())
    assert(r.headers().firstValue("Content-Encoding").orElse("") == "gzip")
    val unzipped = new String(
      new java.util.zip.GZIPInputStream(
        new java.io.ByteArrayInputStream(r.body())).readAllBytes(), "UTF-8")
    assert(unzipped.contains("\"gz\""))
    // without the header, plain JSON
    val plain = req("GET", "/_all_dbs")
    assert(plain._2.contains("\"gz\""))
  }

  test("_all?version= time-travels to an older commit") {
    req("PUT", "/tt")
    req("PUT", "/tt/2012-08-28T21:24:00Z", """{"v": 1}""") // version 2
    req("PUT", "/tt/2012-08-28T21:24:10Z", """{"v": 2}""") // version 3
    val (c, now) = req("GET", "/tt/_all")
    assert(c == 200 && now.contains("\"v\": 1") && now.contains("\"v\": 2"))
    val (c2, old) = req("GET", "/tt/_all?version=2")
    assert(c2 == 200 && old.contains("\"v\": 1") && !old.contains("\"v\": 2"))
    val (_, dump) = req("GET", "/tt/_dump?version=2")
    assert(dump.trim == """{"2012-08-28T21:24:00Z": {"v": 1}}""")
  }

  test("_compact?grace_ms= controls the ride-along vacuum") {
    req("PUT", "/cg")
    req("PUT", "/cg/2012-08-28T21:24:00Z", """{"v": 1}""")
    req("PUT", "/cg/2012-08-28T21:24:10Z", """{"v": 2}""")
    // operator knows the store is quiescent: an explicit sub-default
    // grace reclaims the replaced append files in the same request
    // (default grace would keep them for 10 minutes)
    val (c, _) = req("POST", "/cg/_compact?grace_ms=-1000")
    assert(c == 200)
    val dbDir = java.nio.file.Paths.get(store.rootDir,
      "cg" + graft.sources.SeriesStore.dbExt)
    val s = java.nio.file.Files.list(dbDir)
    val parquets =
      try {
        val it = s.iterator(); var n = 0
        while (it.hasNext)
          if (it.next().getFileName.toString.endsWith(".parquet")) n += 1
        n
      } finally s.close()
    assert(parquets == 1) // only the compacted live file remains
    val (_, all) = req("GET", "/cg/_all")
    assert(all.contains("\"v\": 1") && all.contains("\"v\": 2"))
  }

  test("cache hits stream chunked and slow queries land in /_debug/vars") {
    val cached = new SeriesHttp(store,
      cache = Some(new graft.sources.QueryCache(store)),
      minQueryLogDuration = scala.concurrent.duration.Duration.Zero)
    val cport = cached.start()
    def creq(path: String): java.net.http.HttpResponse[String] = client.send(
      HttpRequest.newBuilder(URI.create(s"http://127.0.0.1:$cport$path"))
        .GET().build(), HttpResponse.BodyHandlers.ofString())
    try {
      req("PUT", "/qc")
      req("PUT", "/qc/2012-08-28T21:24:00Z", """{"v": 10}""")
      val q = "/qc/_query?group=60000&ptr=/v&reducer=sum"
      val miss = creq(q)
      val hit = creq(q)
      assert(miss.body() == """{"1346189040000":[10]}""")
      assert(hit.body() == miss.body())
      // both emits are chunked transfers: the cached response is
      // streamed, never buffered into a Content-Length send
      assert(hit.headers().firstValue("Transfer-encoding").orElse("")
        == "chunked")
      assert(!hit.headers().firstValue("Content-length").isPresent)
      // with a zero threshold both queries were logged as slow
      val vars = creq("/_debug/vars").body()
      assert(vars.contains(""""cache":{"hits":1,"misses":1}"""))
      // raw (memcached-transport) keyspace reports apart, untouched here
      assert(vars.contains(""""cache_raw":{"hits":0,"misses":0}"""))
      assert(""""slow_queries":(\d+)""".r.findFirstMatchIn(vars)
        .exists(_.group(1).toLong >= 2))
      assert(vars.contains("_query qc group=60000"))
      assert(vars.contains("elapsed_ms"))
    } finally cached.stop()
  }

  override def afterAll(): Unit = api.stop()
}
