package graft.sources

import graft.SparkSpec
import graft.operators.SeriesEngine.SeriesQuery
import java.nio.file.Files

class QueryCacheSpec extends SparkSpec {

  test("byte budget converges: replacement credits and looped eviction") {
    val store = new SeriesStore(spark,
      Files.createTempDirectory("graft-qcb").toString)
    store.create("db")
    (0 until 6).foreach(i =>
      store.store("db", Some(s"2012-08-28T21:2$i:00Z"), s"""{"v": $i}"""))
    // single-bucket responses (~48 bytes); the 160-byte budget fits 3,
    // so six distinct shapes force the eviction loop repeatedly
    def q(i: Int) = SeriesQuery(60000, Seq("/v"), Seq("sum"),
      from = Some("2012-08-28T21:20:00Z"), to = Some("2012-08-28T21:20:59Z"),
      filters = Seq("/v" -> s"$i"), names = Seq("s"))
    val cache = new QueryCache(store, capacity = 256, maxBytes = 160)
    (0 until 6).foreach(i => cache.queryJson("db", q(i)))
    // the LAST shape survived eviction → hit; the FIRST was evicted by
    // the byte bound → recomputes
    val missesBefore = cache.misses
    cache.queryJson("db", q(5))
    assert(cache.misses == missesBefore && cache.hits >= 1)
    cache.queryJson("db", q(0))
    assert(cache.misses == missesBefore + 1)
  }

  test("caches _query responses; any write invalidates via storage version (S11)") {
    val store = new SeriesStore(spark,
      Files.createTempDirectory("graft-qc").toString)
    store.create("db")
    store.store("db", Some("2012-08-28T21:24:00Z"), """{"v": 10}""")
    store.store("db", Some("2012-08-28T21:24:20Z"), """{"v": 30}""")
    val cache = new QueryCache(store)
    val q = SeriesQuery(60000, Seq("/v"), Seq("avg"), names = Seq("a"))

    val first = cache.queryJson("db", q)
    assert(first == """{"1346189040000":[20]}""")
    assert(cache.queryJson("db", q) == first)
    assert(cache.hits == 1 && cache.misses == 1)

    // different query shape misses
    cache.queryJson("db", q.copy(reducers = Seq("sum")))
    assert(cache.misses == 2)

    // a write changes the storage version: stale entry not served
    val v0 = cache.storageVersion("db")
    store.store("db", Some("2012-08-28T21:24:40Z"), """{"v": 50}""")
    assert(cache.storageVersion("db") != v0)
    assert(cache.queryJson("db", q) == """{"1346189040000":[30]}""")

    // compaction also rolls the version (files rewritten)
    val v1 = cache.storageVersion("db")
    store.compact("db")
    assert(cache.storageVersion("db") != v1)
    assert(cache.queryJson("db", q) == """{"1346189040000":[30]}""")
  }

  test("post-processed queries cache under distinct, invalidated keys") {
    import graft.operators.SeriesEngine.PostProcess
    val store = new SeriesStore(spark,
      Files.createTempDirectory("graft-qcp").toString)
    store.create("db")
    store.store("db", Some("2012-08-28T21:24:00Z"), """{"v": 10}""")
    store.store("db", Some("2012-08-28T21:26:00Z"), """{"v": 30}""")
    val cache = new QueryCache(store)
    val q = SeriesQuery(60000, Seq("/v"), Seq("sum"), names = Seq("s"))
    val post = PostProcess(fill = true)

    val filled = cache.queryJson("db", q, post)
    assert(filled ==
      """{"1346189040000":[10],"1346189100000":[null],"1346189160000":[30]}""")
    assert(cache.queryJson("db", q, post) == filled) // hit
    assert(cache.hits == 1 && cache.misses == 1)
    // base query is its own key (and its key is unchanged by the
    // PostProcess extension — a noop post behaves identically)
    assert(cache.queryJson("db", q) ==
      """{"1346189040000":[10],"1346189160000":[30]}""")
    assert(cache.misses == 2)
    // distinct post params → distinct entries
    cache.queryJson("db", q, PostProcess(fill = true, changepoint = true))
    assert(cache.misses == 3)
    // writes invalidate post-processed entries like any q# key
    store.store("db", Some("2012-08-28T21:25:00Z"), """{"v": 20}""")
    assert(cache.queryJson("db", q, post) ==
      """{"1346189040000":[10],"1346189100000":[20],"1346189160000":[30]}""")
    assert(cache.misses == 4)
  }

  test("rewrite invalidates even when file metadata is indistinguishable") {
    // the mtime-collision case: a rewrite landing in the same
    // filesystem timestamp tick with identical file names and sizes
    // must still change the storage version. The storage version is
    // the COMMIT-LOG version — every mutation class is exactly one
    // commit — so invalidation never consults (name, size, mtime)
    // metadata at all.
    val store = new SeriesStore(spark,
      Files.createTempDirectory("graft-qcm").toString)
    store.create("db")
    val cache = new QueryCache(store)

    // each mutation class advances the version
    val c0 = store.currentVersion("db")
    store.store("db", Some("2012-08-28T21:24:00Z"), """{"v": 10}""")
    val c1 = store.currentVersion("db")
    assert(c1 == c0 + 1)
    store.compact("db")
    val c2 = store.currentVersion("db")
    assert(c2 == c1 + 1)
    store.deleteRange("db", None, Some("2000-01-01T00:00:00Z"))
    assert(store.currentVersion("db") == c2 + 1)

    // two back-to-back compacts of identical rows produce
    // content-identical data files — metadata cannot tell the states
    // apart, the log version still can
    val v0 = cache.storageVersion("db")
    store.compact("db")
    assert(cache.storageVersion("db") != v0)
  }

  test("raw (memcached) keyspace tracks hits/misses apart from _query") {
    // the two keyspaces have different consistency contracts — q#
    // entries are version-invalidated, m# entries never are — so
    // conflated counters would muddy the observability signal
    val store = new SeriesStore(spark,
      Files.createTempDirectory("graft-qcr").toString)
    val cache = new QueryCache(store)
    assert(cache.getRaw("k").isEmpty)
    cache.putRaw("k", "v")
    assert(cache.getRaw("k").contains("v"))
    assert(cache.rawHits == 1 && cache.rawMisses == 1)
    assert(cache.hits == 0 && cache.misses == 0)
  }

  test("drop + recreate never serves the previous incarnation's results") {
    // the fresh log replays the same version NUMBERS (create=1,
    // first store=2), so version equality alone would alias the two
    // incarnations — the create manifest's UID breaks the tie
    val store = new SeriesStore(spark,
      Files.createTempDirectory("graft-qcd").toString)
    val cache = new QueryCache(store)
    val q = SeriesQuery(60000, Seq("/v"), Seq("sum"), names = Seq("s"))

    store.create("dr")
    store.store("dr", Some("2012-08-28T21:24:00Z"), """{"v": 10}""")
    val gen1 = store.tableState("dr")
    assert(cache.queryJson("dr", q) == """{"1346189040000":[10]}""")

    store.drop("dr")
    store.create("dr")
    store.store("dr", Some("2012-08-28T21:24:00Z"), """{"v": 30}""")
    val gen2 = store.tableState("dr")
    assert(gen1._2 == gen2._2, "test setup: versions must collide")
    assert(gen1._1 != gen2._1, "incarnation UIDs must differ")
    assert(cache.queryJson("dr", q) == """{"1346189040000":[30]}""")
  }

  test("queryJsonChunks: a miss streams before caching; exhaustion caches") {
    val store = new SeriesStore(spark,
      Files.createTempDirectory("graft-qcs").toString)
    store.create("db")
    (0 until 4).foreach(i =>
      store.store("db", Some(s"2012-08-28T21:2$i:00Z"), s"""{"v": $i}"""))
    val cache = new QueryCache(store)
    val q = SeriesQuery(60000, Seq("/v"), Seq("sum"), names = Seq("s"))
    val post = graft.operators.SeriesEngine.PostProcess()

    // MISS: chunks arrive per bucket; the first chunk leaves BEFORE
    // the response exists anywhere in full — nothing is cached until
    // the stream is exhausted (an abandoned client caches nothing)
    val it = cache.queryJsonChunks("db", q, post)
    val head = it.next()
    assert(head == "{")
    val missesMid = cache.misses
    val hitsMid = cache.hits
    assert(cache.queryJsonChunks("db", q, post).next() == "{")
    assert(cache.misses == missesMid + 1 && cache.hits == hitsMid,
      "partially-consumed stream must not have populated the cache")
    val full = (head +: it.toSeq).mkString
    assert(full == cache.queryJson("db", q)) // now a HIT on the teed entry
    assert(cache.hits == hitsMid + 1)
    // and the chunked surface hits too, slicing the stored string
    assert(cache.queryJsonChunks("db", q, post, chunkChars = 7)
      .mkString == full)
  }

  test("queryJsonChunks: over-budget responses stream whole, cache nothing") {
    val store = new SeriesStore(spark,
      Files.createTempDirectory("graft-qcx").toString)
    store.create("db")
    (0 until 4).foreach(i =>
      store.store("db", Some(s"2012-08-28T21:2$i:00Z"), s"""{"v": $i}"""))
    // budget smaller than any response: the tee buffer is dropped
    // mid-stream, the emit still completes, nothing enters the cache
    val cache = new QueryCache(store, maxBytes = 8)
    val q = SeriesQuery(60000, Seq("/v"), Seq("sum"), names = Seq("s"))
    val post = graft.operators.SeriesEngine.PostProcess()
    val full = cache.queryJsonChunks("db", q, post).mkString
    assert(full.startsWith("{") && full.endsWith("}"))
    val missesBefore = cache.misses
    cache.queryJsonChunks("db", q, post).foreach(_ => ())
    assert(cache.misses == missesBefore + 1, "nothing was cached")
  }
}
