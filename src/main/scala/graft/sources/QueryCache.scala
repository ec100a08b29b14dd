package graft.sources

import graft.operators.SeriesEngine.SeriesQuery

import java.util.{Collections, LinkedHashMap, Map => JMap}

/**
 * Query-result cache (the reference's memcached result cache,
 * cache.go:54-172, S11): `_query` responses keyed by a 64-bit FNV-1a
 * hash of the query shape plus a **storage version** of the database.
 *
 * The reference keys on the bucket's DocumentInfos, which it has for
 * free mid-walk; recomputing that here would cost the very scan the
 * cache avoids. Instead the version is the store's committed log
 * identity — (table-incarnation UID, commit version) — no data or
 * metadata scan at all: every append/delete/compact is exactly one
 * commit, and the UID separates a dropped-and-recreated db from its
 * predecessor. Entries are LRU+byte-bounded. Correctness is
 * unaffected by eviction: a miss just recomputes through the engine.
 */
class QueryCache(store: SeriesStore, capacity: Int = 256,
    maxBytes: Long = 64L << 20) {

  // bounded by entry count AND total bytes: identity/any responses can
  // each be enormous, and 256 of those would pin gigabytes. Accounting
  // and eviction happen together under the map's monitor (see put path):
  // a removeEldestEntry hook would evict at most ONE entry per insert
  // (making maxBytes a soft bound), and lost-update races between put
  // and the byte counter would drift the budget permanently.
  private val bytesUsed = new java.util.concurrent.atomic.AtomicLong(0L)
  private val lru: JMap[String, String] = Collections.synchronizedMap(
    new LinkedHashMap[String, String](capacity, 0.75f, true))

  // the two keyspaces have different consistency contracts (q# entries
  // are version-invalidated, m# entries are client-addressed and never
  // invalidated), so their stats are tracked apart — conflated counts
  // would muddy exactly the observability signal they exist for
  private val hitCount = new java.util.concurrent.atomic.LongAdder
  private val missCount = new java.util.concurrent.atomic.LongAdder
  private val rawHitCount = new java.util.concurrent.atomic.LongAdder
  private val rawMissCount = new java.util.concurrent.atomic.LongAdder
  def hits: Long = hitCount.sum()
  def misses: Long = missCount.sum()
  def rawHits: Long = rawHitCount.sum()
  def rawMisses: Long = rawMissCount.sum()

  def queryJson(db: String, q: SeriesQuery): String =
    queryJson(db, q, graft.operators.SeriesEngine.PostProcess())

  /** Post-processed responses cache under a key that mixes every
   * [[graft.operators.SeriesEngine.PostProcess]] field — a smoothed
   * and an unsmoothed run of the same base query are distinct
   * entries, both version-invalidated like any other `q#` key. */
  def queryJson(db: String, q: SeriesQuery,
      post: graft.operators.SeriesEngine.PostProcess): String = {
    val key = "q#" + java.lang.Long.toUnsignedString(cacheKey(db, q, post))
    val cached = lru.get(key)
    if (cached != null) { hitCount.increment(); cached }
    else {
      missCount.increment()
      val result =
        if (post.isNoop) store.queryJson(db, q)
        else store.queryJsonChunks(db, q, post).mkString
      putEntry(key, result)
      result
    }
  }

  /**
   * Streaming form of [[queryJson]] — the `_query` HTTP emit path: a
   * cache HIT streams the stored response in `chunkChars` slices; a
   * MISS streams the engine's per-bucket chunks AS THEY ARRIVE while
   * teeing them into a side buffer, and the assembled response enters
   * the cache only when the stream is exhausted. First-byte latency
   * and server memory on a miss therefore match the uncached path
   * (the reference streams each bucket as it completes,
   * handlers.go:177-227) — the cache never forces the whole response
   * to materialize before the first chunk leaves. Responses that
   * outgrow the cache's byte budget stop teeing (the buffer is
   * dropped mid-stream), so a pathologically large identity scan
   * cannot pin response-sized memory just to fail [[putEntry]]'s
   * budget check at the end. An abandoned stream (client gone,
   * deadline hit) inserts nothing.
   */
  def queryJsonChunks(db: String, q: SeriesQuery,
      post: graft.operators.SeriesEngine.PostProcess,
      chunkChars: Int = 8192): Iterator[String] = {
    val key = "q#" + java.lang.Long.toUnsignedString(cacheKey(db, q, post))
    val cached = lru.get(key)
    if (cached != null) { hitCount.increment(); cached.grouped(chunkChars) }
    else {
      missCount.increment()
      val inner = store.queryJsonChunks(db, q, post)
      new Iterator[String] {
        private var buf: StringBuilder = new StringBuilder
        private var inserted = false
        def hasNext: Boolean = {
          val h = inner.hasNext
          if (!h && !inserted && buf != null) {
            inserted = true
            putEntry(key, buf.toString)
            buf = null
          }
          h
        }
        def next(): String = {
          val c = inner.next()
          if (buf != null) {
            if (2L * (buf.length + c.length) > maxBytes) buf = null // uncacheable
            else buf.append(c)
          }
          c
        }
      }
    }
  }

  /** Raw-keyed surface for the memcached transport ([[graft.http
   * .SeriesMc]]): a seriesly-style client GETs/SETQs query results
   * under its own content-derived keys (reference cache.go:157-172 —
   * `db#bucket#fnvhash`), sharing this cache's LRU + byte budget.
   * Like the reference's external memcached, raw entries have no
   * version-based invalidation: the client's keys are content-
   * addressed, so staleness is the CLIENT's contract. The `m#`/`q#`
   * namespaces keep the two keyspaces disjoint. */
  def getRaw(key: String): Option[String] = {
    val v = lru.get("m#" + key)
    if (v != null) { rawHitCount.increment(); Some(v) }
    else { rawMissCount.increment(); None }
  }

  def putRaw(key: String, value: String): Unit = putEntry("m#" + key, value)

  private def putEntry(key: String, result: String): Unit =
    if (2L * result.length <= maxBytes) { // never cache what busts the budget
      // one monitor for put + replaced-entry credit + eviction loop:
      // bytesUsed converges below maxBytes instead of drifting
      lru.synchronized {
        val prev = lru.put(key, result)
        if (prev != null) bytesUsed.addAndGet(-2L * prev.length)
        bytesUsed.addAndGet(2L * result.length)
        val it = lru.entrySet().iterator()
        while ((lru.size() > capacity || bytesUsed.get() > maxBytes) &&
            it.hasNext) {
          val e = it.next()
          if (e.getKey != key) { // never evict the entry just inserted
            bytesUsed.addAndGet(-2L * e.getValue.length)
            it.remove()
          }
        }
      }
    }

  def invalidateAll(): Unit = { lru.clear(); bytesUsed.set(0L) }

  private def cacheKey(db: String, q: SeriesQuery,
      post: graft.operators.SeriesEngine.PostProcess): Long = {
    var h = Fnv.offset
    def mix(s: String): Unit = { h = Fnv.mix(h, s); h = Fnv.mixByte(h, 0) }
    mix(db)
    mix(q.groupMs.toString)
    q.ptrs.foreach(mix); mix("|")
    q.reducers.foreach(mix); mix("|")
    q.filters.foreach { case (f, v) => mix(f); mix(v) }
    mix(q.from.getOrElse("")); mix(q.to.getOrElse(""))
    if (!post.isNoop) { // base-query keys unchanged by the extension
      mix(post.fill.toString)
      mix(post.smoothRoll.fold("")(_.toString))
      mix(post.smoothAlpha.toString); mix(post.smoothLags.toString)
      mix(post.anomaly.fold("")(_.toString))
      mix(post.valueIndex.toString)
      mix(post.seasonalPeriod.fold("")(_.toString))
      mix(post.changepoint.toString)
    }
    h = Fnv.mixLong(h, storageVersion(db))
    h
  }

  /** FNV over the db's (incarnation UID, committed version)
   * ([[SeriesStore.tableState]]): every mutation is exactly one
   * commit, so version equality within one incarnation IS table-state
   * equality, and the UID keeps a drop + recreate (whose fresh log
   * replays the same version numbers) from aliasing its predecessor.
   * No file metadata is consulted, so two rewrites landing in the
   * same filesystem timestamp tick with identical names and sizes
   * still invalidate. */
  private[sources] def storageVersion(db: String): Long = {
    val (uid, version) = store.tableState(db)
    Fnv.mixLong(Fnv.mix(Fnv.offset, uid), version)
  }
}

/** FNV-1a 64-bit (the reference's cache key hash, cache.go:157-172). */
private object Fnv {
  val offset: Long = 0xcbf29ce484222325L
  val prime: Long = 0x100000001b3L
  def mixByte(h: Long, b: Byte): Long = (h ^ (b & 0xffL)) * prime
  def mix(h: Long, s: String): Long = {
    var x = h
    s.getBytes("UTF-8").foreach(b => x = mixByte(x, b))
    x
  }
  def mixLong(h: Long, v: Long): Long = {
    var x = h
    var i = 0
    while (i < 8) { x = mixByte(x, ((v >>> (i * 8)) & 0xff).toByte); i += 1 }
    x
  }
}
