package graft.http

import graft.SparkSpec
import graft.operators.SeriesEngine.SeriesQuery
import graft.sources.SeriesStore

import java.nio.file.Files

/** Client SDK against a live server: the serieslyclient surface
 * (list/create/delete, info/compact/dump, writes, _query), plus the
 * /_debug introspection endpoints. */
class SeriesClientSpec extends SparkSpec {

  private lazy val store = new SeriesStore(spark,
    Files.createTempDirectory("graft-client").toString)
  private lazy val api = new SeriesHttp(store)
  private lazy val port = api.start()
  private lazy val client = new SeriesClient(s"http://127.0.0.1:$port")

  test("client SDK round-trip: lifecycle, writes, query, dump") {
    client.create("cdb")
    assert(client.list() == Seq("cdb"))

    val db = client.db("cdb")
    db.put("2012-08-28T21:24:00Z", """{"v": 10, "t": "a"}""")
    db.put("2012-08-28T21:24:20Z", """{"v": 30, "t": "b"}""")
    val key = db.store("""{"v": 50, "t": "a"}""", ts = Some("2012-08-28T21:25:00Z"))
    assert(key == "2012-08-28T21:25:00Z")

    assert(db.info().docCount == 3)
    assert(db.get("2012-08-28T21:24:20Z").contains("""{"v": 30, "t": "b"}"""))
    assert(db.get("1999-01-01T00:00:00Z").isEmpty)

    val q = db.query(SeriesQuery(60000L, Seq("/v"), Seq("sum"),
      filters = Seq("/t" -> "a")))
    assert(q.get("1346189040000").get(0).asDouble() == 10.0)
    assert(q.get("1346189100000").get(0).asDouble() == 50.0)

    val dump = db.dump(from = Some("2012-08-28T21:24:30Z"))
    assert(dump.trim == """{"2012-08-28T21:25:00Z": {"v": 50, "t": "a"}}""")

    db.compact()
    assert(db.info().docCount == 3)

    client.delete("cdb")
    assert(client.list().isEmpty)
    intercept[client.HttpError] { client.db("cdb").info() }
  }

  test("cache-fronted _query serves repeats from cache and invalidates on write") {
    val cache = new graft.sources.QueryCache(store)
    val cachedApi = new SeriesHttp(store, cache = Some(cache))
    val cport = cachedApi.start()
    val cclient = new SeriesClient(s"http://127.0.0.1:$cport")
    try {
      cclient.create("qc")
      val db = cclient.db("qc")
      db.put("2012-08-28T21:24:00Z", """{"v": 7}""")
      val q = SeriesQuery(60000L, Seq("/v"), Seq("sum"))
      assert(db.query(q).get("1346189040000").get(0).asDouble() == 7.0)
      assert(db.query(q).get("1346189040000").get(0).asDouble() == 7.0)
      assert(cache.hits == 1 && cache.misses == 1)
      // a write changes the storage version: same query misses again
      db.put("2012-08-28T21:24:10Z", """{"v": 3}""")
      assert(db.query(q).get("1346189040000").get(0).asDouble() == 10.0)
      assert(cache.misses == 2)
    } finally cachedApi.stop()
  }

  test("debug endpoints expose per-db stats and active query scopes") {
    client.create("ddb")
    client.db("ddb").put("2012-08-28T21:24:00Z", """{"v": 1}""")
    client.db("ddb").query(SeriesQuery(60000L, Seq("/v"), Seq("count")))

    val vars = graft.functions.JsonPointersExpr.mapper.readTree(
      java.net.http.HttpClient.newHttpClient().send(
        java.net.http.HttpRequest.newBuilder(java.net.URI.create(
          s"http://127.0.0.1:$port/_debug/vars")).GET().build(),
        java.net.http.HttpResponse.BodyHandlers.ofString()).body())
    val ddb = vars.get("dbs").get("ddb")
    assert(ddb.get("written").asLong() >= 1)
    assert(ddb.get("queries").asLong() >= 1)
    assert(vars.get("memstats").get("heap_used").asLong() > 0)
    assert(vars.has("query_timeouts"))

    // /_debug/open returns a JSON object (empty when no query runs)
    val open = java.net.http.HttpClient.newHttpClient().send(
      java.net.http.HttpRequest.newBuilder(java.net.URI.create(
        s"http://127.0.0.1:$port/_debug/open")).GET().build(),
      java.net.http.HttpResponse.BodyHandlers.ofString()).body()
    assert(open.startsWith("{") && open.endsWith("}"))
  }
}
