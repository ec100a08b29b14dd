package graft.http

import com.sun.net.httpserver.{HttpExchange, HttpServer}
import graft.operators.SeriesEngine.SeriesQuery
import graft.sources.{QueryCache, QueryDeadline, QueryTimeoutException, SeriesStore}

import java.net.{InetSocketAddress, URLDecoder}
import java.nio.charset.StandardCharsets.UTF_8
import scala.concurrent.duration.{Duration, DurationInt}

/**
 * Thin HTTP façade over [[SeriesStore]] with the reference's route
 * surface (main.go:80-110, handlers.go) — a seriesly client can point
 * here and run every request it runs today:
 *
 *   GET    /_all_dbs                    list databases
 *   PUT    /{db}                        create
 *   DELETE /{db}                        drop
 *   GET    /{db}                        info
 *   POST   /{db}[?ts=]                  new document (ts defaults now)
 *   PUT    /{db}/{key}                  put document at key
 *   GET    /{db}/{key}                  point get
 *   GET    /{db}/_all[?from&to&limit]   range scan → one JSON object
 *   GET    /{db}/_dump[?from&to&limit]  range scan → JSON lines
 *   DELETE /{db}/_bulk?from&to          bulk range delete
 *   POST   /{db}/_compact               compaction
 *   GET    /{db}/_query?group&ptr&reducer[&f&fv&from&to]
 *                 [&fill&smooth_roll&smooth_alpha&smooth_lags&seasonal
 *                  &anomaly&changepoint&post_col]
 *                                       bucketed multi-reducer query;
 *                                       the optional post-processing
 *                                       params (beyond-reference) gap-
 *                                       fill the bucket grid and append
 *                                       roll_mean/ewma, seasonal_mean/
 *                                       residual (seasonal = period in
 *                                       buckets), z/is_anomaly, and
 *                                       cusum/is_changepoint to each
 *                                       bucket's array
 *
 * Built on the JDK server: the engine stays dependency-free, and the
 * façade is deliberately driver-side glue — every response is computed
 * by the same store/engine code the batch gates verify. `_changes` and
 * single-doc DELETE return 501 exactly like the reference
 * (handlers.go:453-461).
 */
/** `maxQueryTime` bounds the scan/query routes (_query, _all, _dump,
 * _bulk — the same four the reference wires its `-maxQueryTime` flag
 * into, main.go:88-94, default 5 min): past the deadline the query's
 * Spark job group is cancelled and the request errors.
 *
 * `cache` serves repeat `_query` responses without touching the
 * engine (the reference fronts queries with its memcached result
 * cache the same way, cache.go:54-172); cached responses stream out
 * chunked exactly like computed ones — hit/miss counts appear in
 * `/_debug/vars`.
 *
 * `minQueryLogDuration` is the reference's `-minQueryLogDuration`
 * (main.go:41-42, query.go:329-331): any `_query` slower than the
 * threshold is logged and lands in `/_debug/vars` under
 * `slow_queries` (count) and `slow_query_log` (most recent 32). */
/** `vacuumGraceMs` bounds the housekeeping vacuum that rides along
 * `POST /{db}/_compact`: files younger than the grace (or still being
 * staged by an in-process write — the store floors the cutoff under
 * its in-flight stages) are never deleted. Cross-JVM writers have no
 * in-flight registry, so this grace is their only protection and must
 * exceed the longest concurrent write; operators who know the store
 * is quiescent can pass `?grace_ms=` per request to reclaim sooner. */
class SeriesHttp(store: SeriesStore, port: Int = 0,
    maxQueryTime: Duration = 5.minutes,
    cache: Option[QueryCache] = None,
    minQueryLogDuration: Duration = 100.millis,
    vacuumGraceMs: Long = 10 * 60 * 1000L) {

  private val server = HttpServer.create(new InetSocketAddress(port), 0)
  // without an executor every request runs on the single dispatcher
  // thread and one slow streaming response head-of-line-blocks the
  // whole server
  server.setExecutor(java.util.concurrent.Executors.newCachedThreadPool(r => {
    val t = new Thread(r, "graft-http")
    t.setDaemon(true)
    t
  }))
  server.createContext("/", (ex: HttpExchange) => safely(ex))

  /** Starts the server; returns the bound port. */
  def start(): Int = { server.start(); server.getAddress.getPort }
  def stop(): Unit = server.stop(0)

  private val timeoutCount = new java.util.concurrent.atomic.LongAdder

  // slow-query observability: count + a bounded ring of the most
  // recent offenders (query description, elapsed ms, wall time)
  private val slowCount = new java.util.concurrent.atomic.LongAdder
  private val slowLog = new java.util.ArrayDeque[(String, Long, Long)]()
  private val logger = org.slf4j.LoggerFactory.getLogger(classOf[SeriesHttp])

  private def timedQuery[T](desc: String)(body: => T): T = {
    val t0 = System.nanoTime()
    try body
    finally {
      val ms = (System.nanoTime() - t0) / 1000000L
      if (ms >= minQueryLogDuration.toMillis) {
        slowCount.increment()
        logger.warn(s"slow query ($ms ms): $desc")
        slowLog.synchronized {
          if (slowLog.size >= slowLogSize) slowLog.removeFirst()
          slowLog.addLast((desc, ms, System.currentTimeMillis()))
        }
      }
    }
  }

  private def slowLogJson: String = {
    val entries = slowLog.synchronized {
      val it = slowLog.iterator(); val buf = Seq.newBuilder[(String, Long, Long)]
      while (it.hasNext) buf += it.next()
      buf.result()
    }
    entries.map { case (desc, ms, at) =>
      s"""{"query":${jstr(desc)},"elapsed_ms":$ms,"at_ms":$at}"""
    }.mkString("[", ",", "]")
  }

  private def safely(ex: HttpExchange): Unit =
    try route(ex)
    catch {
      case e: QueryTimeoutException =>
        timeoutCount.increment(); send(ex, 500, err(e.getMessage))
      case e: IllegalArgumentException => send(ex, 400, err(e.getMessage))
      case e: Exception => send(ex, 500, err(e.getMessage))
    } finally ex.close()

  /** Deadline scope for one request: body builds and streams the whole
   * response on this thread, so the group covers every job it submits
   * (including lazily-triggered toLocalIterator partitions). */
  private def deadlined[T](what: String)(body: => T): T =
    QueryDeadline.run(store.session, maxQueryTime, what)(body)

  private val dbRe = "^/([A-Za-z0-9_-]+)$".r
  private val dbSubRe = "^/([A-Za-z0-9_-]+)/(.+)$".r

  private def route(ex: HttpExchange): Unit = {
    val m = ex.getRequestMethod
    val path = ex.getRequestURI.getPath
    val p = params(ex)
    (m, path) match {
      case ("GET", "/_all_dbs") =>
        send(ex, 200, store.list().map(jstr).mkString("[", ",", "]"))
      // operational introspection (reference: /_debug/vars expvar +
      // /_debug/open handle list, debug.go, main.go:72-75)
      case ("GET", "/_debug/vars") =>
        val rt = Runtime.getRuntime
        // q# (version-invalidated) and m# (client-addressed, never
        // invalidated) keyspaces report apart — their hit rates mean
        // different things
        val cacheJson = cache.fold("")(c =>
          s""""cache":{"hits":${c.hits},"misses":${c.misses}},""" +
            s""""cache_raw":{"hits":${c.rawHits},"misses":${c.rawMisses}},""")
        send(ex, 200,
          s"""{"dbs":${store.statsJson},$cacheJson""" +
            s""""query_timeouts":${timeoutCount.sum()},""" +
            s""""slow_queries":${slowCount.sum()},""" +
            s""""slow_query_log":$slowLogJson,""" +
            s""""memstats":{"heap_used":${rt.totalMemory() - rt.freeMemory()},""" +
            s""""heap_total":${rt.totalMemory()},"heap_max":${rt.maxMemory()}}}""")
      case ("GET", "/_debug/open") =>
        val scopes = QueryDeadline.activeScopes().map { case (g, (desc, t0)) =>
          s"${jstr(g)}:{"+s""""desc":${jstr(desc)},"running_ms":${System.currentTimeMillis() - t0}}"""
        }
        send(ex, 200, scopes.mkString("{", ",", "}"))
      case (_, dbRe(db)) => dbRoute(ex, m, db, p)
      case (_, dbSubRe(db, sub)) => subRoute(ex, m, db, sub, p)
      case _ => send(ex, 404, err("no such route"))
    }
  }

  private def dbRoute(ex: HttpExchange, m: String, db: String,
      p: Map[String, Seq[String]]): Unit = m match {
    case "PUT" =>
      store.create(db); send(ex, 201, "{\"ok\":true}")
    case "DELETE" =>
      if (!store.exists(db)) send(ex, 404, err("no such database"))
      else { store.drop(db); send(ex, 200, "{\"ok\":true}") }
    case "GET" | "HEAD" =>
      if (!store.exists(db)) send(ex, 404, err("no such database"))
      else {
        val i = store.info(db)
        send(ex, 200, s"""{"doc_count":${i.docCount},"space_used":${i.spaceUsed},"last_seq":${i.lastSeq}}""")
      }
    case "POST" =>
      // the reference 404s writes to unknown DBs (handlers.go:56-61);
      // without the check, parquet SaveMode.Append would silently
      // create the directory
      if (!store.exists(db)) send(ex, 404, err("no such database"))
      else {
        val body = new String(ex.getRequestBody.readAllBytes(), UTF_8)
        val key = store.store(db, p.get("ts").map(_.head), body)
        send(ex, 201, s"""{"ok":true,"id":${jstr(key)}}""")
      }
    case _ => send(ex, 405, err("method not allowed"))
  }

  private def subRoute(ex: HttpExchange, m: String, db: String, sub: String,
      p: Map[String, Seq[String]]): Unit =
    // every sub-route (scan, query, doc write, point get) presupposes
    // the database: missing → 404, matching the reference, instead of
    // the 400 an engine-level require would surface as
    if (!store.exists(db)) send(ex, 404, err("no such database"))
    else (m, sub) match {
    case ("GET", "_query") => deadlined(s"_query $db")(query(ex, db, p))
    case ("GET", "_all") => deadlined(s"_all $db") {
      // streamed: rows arrive via toLocalIterator, the response leaves
      // in chunks — neither the driver nor the server buffers the scan.
      // `version` (beyond-reference) time-travels to an older commit.
      val rows = store.all(db, p.get("from").map(_.head), p.get("to").map(_.head),
          p.get("limit").map(_.head.toInt).getOrElse(Int.MaxValue),
          p.get("version").map(_.head.toLong))
        .select("key", "doc").toLocalIterator()
      var first = true
      sendStream(ex, Iterator.single("{") ++ new Iterator[String] {
        def hasNext: Boolean = rows.hasNext
        def next(): String = {
          val r = rows.next()
          val sep = if (first) { first = false; "" } else ","
          s"$sep${jstr(r.getString(0))}: ${r.getString(1)}"
        }
      } ++ Iterator.single("}"))
    }
    case ("GET", "_dump") => deadlined(s"_dump $db") {
      val lines = store.dump(db, p.get("from").map(_.head),
        p.get("to").map(_.head),
        p.get("limit").map(_.head.toInt).getOrElse(Int.MaxValue),
        p.get("version").map(_.head.toLong))
      sendStream(ex, lines.zipWithIndex.map { case (l, i) =>
        if (i == 0) l else "\n" + l })
    }
    case ("DELETE", "_bulk") => deadlined(s"_bulk $db") {
      val n = store.deleteRange(db, p.get("from").map(_.head), p.get("to").map(_.head))
      send(ex, 200, s"""{"deleted":$n}""")
    }
    case ("POST", "_compact") =>
      store.compact(db)
      // housekeeping ride-along: drop files no reader can still need
      // (grace protects in-flight snapshots and cross-JVM writers; the
      // store itself shields in-process stages). The compaction
      // already committed — a vacuum hiccup must not fail the request
      val grace = p.get("grace_ms").map(_.head.toLong).getOrElse(vacuumGraceMs)
      try store.vacuum(db, grace) catch { case _: Exception => () }
      send(ex, 200, "{\"ok\":true}")
    case (_, "_changes") => send(ex, 501, err("not implemented"))
    case ("PUT", key) =>
      val body = new String(ex.getRequestBody.readAllBytes(), UTF_8)
      val k = store.store(db, Some(key), body)
      send(ex, 201, s"""{"ok":true,"id":${jstr(k)}}""")
    case ("GET", key) =>
      store.get(db, key) match {
        case Some(doc) => send(ex, 200, doc)
        case None => send(ex, 404, err("not found"))
      }
    case ("DELETE", _) => send(ex, 501, err("not implemented"))
    case _ => send(ex, 405, err("method not allowed"))
  }

  /** GET /{db}/_query — parameter surface of handlers.go:113-166. */
  private def query(ex: HttpExchange, db: String,
      p: Map[String, Seq[String]]): Unit = {
    val group = p.get("group").map(_.head.toLong).getOrElse(
      throw new IllegalArgumentException("group is required"))
    val ptrs = p.getOrElse("ptr", Nil)
    val reds = p.getOrElse("reducer", Nil)
    val fs = p.getOrElse("f", Nil)
    val fvs = p.getOrElse("fv", Nil)
    require(fs.length == fvs.length, "f and fv counts must match")
    val q = SeriesQuery(group, ptrs, reds,
      from = p.get("from").map(_.head), to = p.get("to").map(_.head),
      filters = fs.zip(fvs))
    def truthy(k: String): Boolean =
      p.get(k).exists(v => v.head == "" || v.head == "1" || v.head == "true")
    val post = graft.operators.SeriesEngine.PostProcess(
      fill = truthy("fill"),
      smoothRoll = p.get("smooth_roll").map(_.head.toInt),
      smoothAlpha = p.get("smooth_alpha").map(_.head.toDouble).getOrElse(0.3),
      smoothLags = p.get("smooth_lags").map(_.head.toInt).getOrElse(8),
      anomaly = p.get("anomaly").map(_.head.toDouble),
      valueIndex = p.get("post_col").map(_.head.toInt).getOrElse(0),
      seasonalPeriod = p.get("seasonal").map(_.head.toInt),
      changepoint = truthy("changepoint"))
    // the timer wraps the full emit (compute + stream), matching the
    // reference's executeQuery timing (query.go:318-331). Both cache
    // hits AND misses stream chunked: a miss tees per-bucket chunks
    // into the cache as they leave (QueryCache.queryJsonChunks), so
    // enabling the cache never delays the first byte behind a full
    // materialization. Post-processed responses cache too — the key
    // mixes every PostProcess field.
    timedQuery(s"_query $db ${ex.getRequestURI.getQuery}") {
      cache match {
        case Some(c) =>
          sendStream(ex, c.queryJsonChunks(db, q, post, streamChunkChars))
        case _ => sendStream(ex, store.queryJsonChunks(db, q, post))
      }
    }
  }

  private def params(ex: HttpExchange): Map[String, Seq[String]] = {
    val raw = Option(ex.getRequestURI.getRawQuery).getOrElse("")
    raw.split("&").toSeq.filter(_.nonEmpty).map { kv =>
      kv.split("=", 2) match {
        case Array(k, v) => URLDecoder.decode(k, UTF_8) -> URLDecoder.decode(v, UTF_8)
        case Array(k) => URLDecoder.decode(k, UTF_8) -> ""
      }
    }.groupBy(_._1).map { case (k, vs) => k -> vs.map(_._2) }
  }

  // full JSON escaping (multi-line exception messages land in err())
  private def jstr(s: String): String = graft.sources.SeriesStore.jsonQuote(s)
  private def err(msg: String): String = s"""{"error":${jstr(Option(msg).getOrElse("internal"))}}"""

  private val slowLogSize = 32
  private val streamChunkChars = 8192

  /** Chunked-transfer streaming response (the reference streams scan
   * and query results as they materialize — handlers.go:170-227,
   * 331-420), gzip-wrapped when accepted. Response code is committed
   * before the first chunk, as in the reference (errors after first
   * byte truncate the stream). */
  private def sendStream(ex: HttpExchange, chunks: Iterator[String]): Unit = {
    val accepts = Option(ex.getRequestHeaders.getFirst("Accept-Encoding"))
      .exists(_.contains("gzip"))
    ex.getResponseHeaders.set("Content-Type", "application/json")
    if (accepts) ex.getResponseHeaders.set("Content-Encoding", "gzip")
    ex.sendResponseHeaders(200, 0) // chunked
    val raw = ex.getResponseBody
    val out = if (accepts) new java.util.zip.GZIPOutputStream(raw) else raw
    try chunks.foreach(c => out.write(c.getBytes(UTF_8)))
    finally out.close()
  }

  /** gzip-negotiated response (the reference gzips when the client
   * accepts it — handlers.go:300-329, handlers_test.go:8-28). */
  private def send(ex: HttpExchange, code: Int, body: String): Unit = {
    val plain = body.getBytes(UTF_8)
    val accepts = Option(ex.getRequestHeaders.getFirst("Accept-Encoding"))
      .exists(_.contains("gzip"))
    val bytes =
      if (accepts && plain.nonEmpty) {
        ex.getResponseHeaders.set("Content-Encoding", "gzip")
        val bos = new java.io.ByteArrayOutputStream()
        val gz = new java.util.zip.GZIPOutputStream(bos)
        gz.write(plain); gz.close()
        bos.toByteArray
      } else plain
    ex.getResponseHeaders.set("Content-Type", "application/json")
    if (ex.getRequestMethod == "HEAD") ex.sendResponseHeaders(code, -1)
    else {
      ex.sendResponseHeaders(code, if (bytes.isEmpty) -1 else bytes.length)
      if (bytes.nonEmpty) ex.getResponseBody.write(bytes)
    }
  }
}
