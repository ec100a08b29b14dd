package graft.sources

import graft.functions.JsonPointersExpr
import graft.operators.SeriesEngine
import graft.operators.SeriesEngine.SeriesQuery
import graft.timelib.TimeLib
import org.apache.spark.sql.{DataFrame, Row, SaveMode, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import java.nio.file.{Files, Path, Paths, StandardCopyOption}
import java.util.Comparator
import java.util.concurrent.atomic.AtomicLong

/**
 * Multi-tenant series storage: one parquet directory per named
 * database under a root, schema `(ts LONG epoch-ns, seq LONG, doc
 * STRING)` — the Spark-native shape of the reference's one-couchstore-
 * file-per-database layout (reference: database.go:25,57-59,76-93).
 *
 * The reference's B-tree key is the canonical timestamp string; here
 * the key is the ns timestamp itself, ordered by parquet min/max
 * statistics instead of a B-tree (range queries prune row groups).
 * Same-key overwrites (PUT twice) are resolved read-side by highest
 * `seq` wins, and rewritten physically by `compact()` — at cluster
 * scale this layer maps onto a transactional table format (Delta/
 * Iceberg MERGE + OPTIMIZE); the semantics here are identical.
 */
class SeriesStore(spark: SparkSession, root: String) {
  import SeriesStore._

  private[graft] def session: SparkSession = spark
  private[graft] def rootDir: String = root

  Files.createDirectories(Paths.get(root))

  /** Per-db operation counters for the `/_debug/vars` surface (the
   * reference publishes `dbs` expvar stats — debug.go:69-112; its
   * `written`/`qlen`/`opens`/`closes` map here to the operations a
   * Spark-backed store actually performs). */
  final class DbStat {
    val written = new java.util.concurrent.atomic.LongAdder
    val queries = new java.util.concurrent.atomic.LongAdder
    val deletes = new java.util.concurrent.atomic.LongAdder
    val compacts = new java.util.concurrent.atomic.LongAdder
  }
  private val dbStats =
    new java.util.concurrent.ConcurrentHashMap[String, DbStat]()
  private def stat(db: String): DbStat =
    dbStats.computeIfAbsent(db, _ => new DbStat)

  /** Snapshot of every db's counters, JSON-shaped for /_debug/vars. */
  def statsJson: String = {
    val sb = new StringBuilder("{")
    var first = true
    dbStats.forEach { (db, s) =>
      if (!first) sb.append(',')
      first = false
      sb.append(jsonQuote(db)).append(s""":{"written":${s.written.sum()},""" +
        s""""queries":${s.queries.sum()},"deletes":${s.deletes.sum()},""" +
        s""""compacts":${s.compacts.sum()}}""")
    }
    sb.append('}').toString
  }

  private def dbPath(db: String): Path = {
    require(db.nonEmpty && db.forall(c => c.isLetterOrDigit || c == '_' || c == '-'),
      s"invalid database name: $db")
    Paths.get(root, db + dbExt)
  }

  /** PUT /{db} (handlers.go:36-43). */
  def create(db: String): Unit = {
    val p = dbPath(db)
    if (!Files.exists(p)) {
      spark.createDataFrame(spark.sparkContext.emptyRDD[Row], schema)
        .write.mode(SaveMode.Overwrite).parquet(p.toString)
      Files.createFile(cleanMarker(db))
    }
  }

  // Files.walk streams hold directory handles until closed
  private def walked[T](p: Path)(f: java.util.stream.Stream[Path] => T): T = {
    val s = Files.walk(p)
    try f(s) finally s.close()
  }

  // Per-database write serialization: concurrent parquet appends to
  // one directory corrupt each other (both Spark jobs stage under the
  // same _temporary/0 and job commit deletes it wholesale). The HTTP
  // and memcached facades both spawn concurrent callers, so the
  // single-writer contract is enforced HERE, not left to callers.
  // Cross-JVM writers remain out of scope (documented).
  private val writeLocks =
    new java.util.concurrent.ConcurrentHashMap[String, Object]()
  private def withWriteLock[T](db: String)(f: => T): T =
    writeLocks.computeIfAbsent(db, _ => new Object).synchronized(f)

  /** Completes an interrupted [[rewrite]]: a crash between its two
   * renames leaves the data under `.old` with nothing at the db path —
   * roll it back; a crash mid-cleanup leaves a stale `.old` — drop it. */
  private def recover(db: String): Unit = {
    val p = dbPath(db)
    val old = Paths.get(p.toString + ".old")
    if (Files.exists(old)) {
      if (!Files.exists(p)) Files.move(old, p, StandardCopyOption.ATOMIC_MOVE)
      else walked(old)(_.sorted(Comparator.reverseOrder[Path]()).forEach(Files.delete(_)))
    }
    val tmp = Paths.get(p.toString + ".compact")
    if (Files.exists(tmp))
      walked(tmp)(_.sorted(Comparator.reverseOrder[Path]()).forEach(Files.delete(_)))
  }

  /** DELETE /{db} (handlers.go:282-289). */
  def drop(db: String): Unit = {
    val p = dbPath(db)
    if (Files.exists(p))
      walked(p)(_.sorted(Comparator.reverseOrder[Path]())
        .forEach(f => Files.delete(f)))
  }

  /** GET /_all_dbs (database.go:121-134). */
  def list(): Seq[String] =
    Option(Paths.get(root).toFile.listFiles()).getOrElse(Array())
      .filter(f => f.isDirectory && f.getName.endsWith(dbExt))
      .map(_.getName.stripSuffix(dbExt)).sorted.toSeq

  def exists(db: String): Boolean = Files.exists(dbPath(db))

  /** GET /{db} info: doc_count/space_used/last_seq (handlers.go:431-451). */
  def info(db: String): DbInfo = {
    val f = frame(db)
    val r = f.agg(count(lit(1)), coalesce(max(col("seq")), lit(0L))).head()
    val space = walked(dbPath(db))(_.filter(Files.isRegularFile(_))
      .mapToLong(Files.size).sum())
    DbInfo(r.getLong(0), space, r.getLong(1))
  }

  /** POST /{db} / PUT /{db}/{key}: validate JSON, key = parsed ts or
   * now, append (handlers.go:56-100). Returns the canonical key. For
   * bulk loads use [[storeBatch]] — per-doc parquet appends are the
   * write-behind queue's job in the reference (database.go:175-254);
   * here `graft.streaming.SeriesStream` is that path. */
  def store(db: String, ts: Option[String], json: String): String = {
    require(validJson(json), "invalid JSON document")
    val ns = ts match {
      case Some(s) => TimeLib.parseTime(s).getOrElse(
        throw new IllegalArgumentException(s"unparsable timestamp: $s"))
      case None => System.currentTimeMillis() * 1000000L
    }
    import spark.implicits._
    withWriteLock(db) {
      val seq = seqBase(db).getAndIncrement()
      // marker removal precedes the append: a crash or concurrent read
      // between the two must see a (conservatively) dirty store, never
      // a clean-marked store with an uncompacted overwrite
      Files.deleteIfExists(cleanMarker(db))
      Seq((ns, seq, json)).toDF("ts", "seq", "doc")
        .write.mode(SaveMode.Append).parquet(dbPath(db).toString)
      bumpVersion(db)
    }
    stat(db).written.increment()
    TimeLib.formatCanonical(ns)
  }

  /** Batched ingest of a `(ts LONG ns, doc STRING)` frame. The batch
   * reserves a seq range above every previously persisted seq — later
   * batches always win read-side dedup against earlier ones, including
   * across process restarts. Within the batch, rows are numbered by
   * `monotonically_increasing_id` (partition index · 2³³ + row), so
   * the reserved range is `numPartitions · 2³³` wide; a partition would
   * need > 8.6 B rows to overflow its slot. Writers are single-process
   * per database (as in the reference's per-DB writer goroutine,
   * database.go:175-254); cross-JVM concurrent writers would need a
   * transactional table format underneath. */
  def storeBatch(db: String, docs: DataFrame): Unit = withWriteLock(db) {
    val selected = docs.select(col("ts").cast(LongType).as("ts"),
      col("doc").cast(StringType).as("doc"))
    val parts = math.max(1, selected.rdd.getNumPartitions)
    val base = seqBase(db).getAndAdd(parts.toLong << 33)
    Files.deleteIfExists(cleanMarker(db)) // before the append — see store()
    selected.select(col("ts"),
        (monotonically_increasing_id() + lit(base)).as("seq"), col("doc"))
      .write.mode(SaveMode.Append).parquet(dbPath(db).toString)
    bumpVersion(db)
    stat(db).written.increment()
  }

  // per-DB next-seq floor, initialized from the persisted max so the
  // ordering survives restarts (a fresh counter would let an old doc
  // beat a newer overwrite in frame()'s max_by dedup)
  private val seqBases = new java.util.concurrent.ConcurrentHashMap[String, AtomicLong]()
  private def seqBase(db: String): AtomicLong =
    seqBases.computeIfAbsent(db, _ => {
      val persisted = if (exists(db))
        spark.read.schema(schema).parquet(dbPath(db).toString)
          .agg(coalesce(max(col("seq")), lit(0L))).head().getLong(0)
      else 0L
      new AtomicLong(persisted + 1)
    })

  /** The queryable view: latest write per key wins (couchstore Set
   * overwrite semantics, database.go:293-302).
   *
   * Scale note: the last-write-wins dedup is a full shuffle, so it
   * runs only while the store is possibly-dirty. `compact`/`delete`
   * rewrite the data duplicate-free and leave a cleanliness marker;
   * appends remove it. Reads of a compacted store are plain
   * partition-pruned scans with no exchange — the usual read path for
   * analytical workloads that compact on a schedule. */
  def frame(db: String): DataFrame = {
    // recovery takes the db's write lock: unlocked, a read landing
    // between rewrite()'s two renames would see the db path missing and
    // roll .old back while the swap is mid-flight, failing the rewrite.
    // Cost when no writer holds the lock: an uncontended monitor enter.
    withWriteLock(db)(recover(db))
    require(exists(db), s"no such database: $db")
    val raw = spark.read.schema(schema).parquet(dbPath(db).toString)
    if (Files.exists(cleanMarker(db))) raw
    else raw.groupBy(col("ts"))
      .agg(max(col("seq")).as("seq"), max_by(col("doc"), col("seq")).as("doc"))
  }

  private def cleanMarker(db: String): Path =
    dbPath(db).resolve("_graft_clean")

  /** Monotonic per-db mutation counter, persisted as `_graft_version`
   * inside the db directory (leading `_` → invisible to parquet
   * scans). File (size, mtime) metadata alone cannot distinguish two
   * rewrites landing in the same mtime tick with identical sizes, so
   * every mutating operation bumps this counter under the db's write
   * lock and the query cache mixes its CONTENT into the storage
   * version — invalidation is guaranteed regardless of filesystem
   * timestamp granularity. */
  private[sources] def versionFile(db: String): Path =
    dbPath(db).resolve("_graft_version")

  /** Must be called with the db's write lock held. */
  private def bumpVersion(db: String): Unit =
    writeVersion(db, currentVersion(db) + 1)

  private def writeVersion(db: String, v: Long): Unit = {
    val vf = versionFile(db)
    val tmp = Paths.get(vf.toString + ".tmp")
    Files.write(tmp, v.toString.getBytes("UTF-8"))
    Files.move(tmp, vf, StandardCopyOption.ATOMIC_MOVE,
      StandardCopyOption.REPLACE_EXISTING)
  }

  private[sources] def currentVersion(db: String): Long = {
    val vf = versionFile(db)
    if (Files.exists(vf))
      try new String(Files.readAllBytes(vf), "UTF-8").trim.toLong
      catch { case _: NumberFormatException => 0L }
    else 0L
  }

  /** GET /{db}/{key} point get (handlers.go:422-429). */
  def get(db: String, key: String): Option[String] = {
    val ns = TimeLib.parseKey(key)
    if (ns < 0) None
    else frame(db).filter(col("ts") === lit(ns)).select("doc")
      .collect().headOption.map(_.getString(0))
  }

  /** GET /{db}/_all range scan → (key STRING, ts LONG, doc STRING)
   * ascending, `limit` rows (handlers.go:331-379). Range is [from, to). */
  def all(db: String, from: Option[String] = None, to: Option[String] = None,
      limit: Int = Int.MaxValue): DataFrame = {
    var f = frame(db)
    from.foreach(s => f = f.filter(col("ts") >= parseBound(s)))
    to.foreach(s => f = f.filter(col("ts") < parseBound(s)))
    f.orderBy(col("ts")).limit(limit)
      .select(SeriesEngine.canonicalKeyCol(col("ts")).as("key"),
        col("ts"), col("doc"))
  }

  /** GET /{db}/_dump: JSON-lines, one `{"key": doc}` per line, streamed
   * without collecting the frame (handlers.go:381-420). */
  def dump(db: String, from: Option[String] = None, to: Option[String] = None,
      limit: Int = Int.MaxValue): Iterator[String] =
    all(db, from, to, limit).select("key", "doc").toLocalIterator()
      .asScala.map(r => s"""{"${r.getString(0)}": ${r.getString(1)}}""")

  /** DELETE /{db}/_bulk range delete; returns deleted count
   * (handlers.go:230-281). Copy-rewrite + atomic swap — the delete
   * inherently compacts, so the reference's optional `?compact=true`
   * follow-up (handlers.go:269-276) is always-on here. */
  def deleteRange(db: String, from: Option[String], to: Option[String]): Long = {
    val f = frame(db)
    var cond = lit(true)
    from.foreach(s => cond = cond && col("ts") >= parseBound(s))
    to.foreach(s => cond = cond && col("ts") < parseBound(s))
    val before = f.count()
    val written = rewrite(db, f.filter(!cond))
    stat(db).deletes.increment()
    before - written
  }

  private def parseBound(s: String): Long =
    TimeLib.parseTime(s).getOrElse(
      throw new IllegalArgumentException(s"unparsable timestamp: $s"))

  /** POST /{db}/_compact: physically drop overwritten versions and
   * merge small files (database.go:136-171 ≈ Delta OPTIMIZE). */
  def compact(db: String): Unit = { rewrite(db, frame(db)); stat(db).compacts.increment() }

  /** Copy-compact + swap; returns the number of rows written. The
   * deduped input is cached across its two passes (sizing count +
   * write). Range partitioning by ts keeps per-file min/max tight so
   * file-level statistics prune narrow time ranges; hash partitioning
   * would spread every file across the whole series. */
  private def rewrite(db: String, data: DataFrame): Long = withWriteLock(db) {
    recover(db)
    val p = dbPath(db)
    val tmp = Paths.get(p.toString + ".compact")
    val cached = data.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      val n = cached.count()
      val partitions = math.max(1, (n / 4000000L).toInt)
      val sized =
        if (partitions == 1) cached.coalesce(1)
        else cached.repartitionByRange(partitions, col("ts"))
      sized.sortWithinPartitions("ts")
        .write.mode(SaveMode.Overwrite).parquet(tmp.toString)
      // the bumped counter is staged INSIDE tmp so the atomic rename
      // carries data + version together: a crash at any point leaves
      // either (old data, old counter) after recover()'s rollback or
      // (new data, new counter) — never a mix that could alias a
      // version already served to the cache
      Files.write(tmp.resolve("_graft_version"),
        (currentVersion(db) + 1).toString.getBytes("UTF-8"))
      val old = Paths.get(p.toString + ".old")
      Files.move(p, old, StandardCopyOption.ATOMIC_MOVE)
      Files.move(tmp, p, StandardCopyOption.ATOMIC_MOVE)
      walked(old)(_.sorted(Comparator.reverseOrder[Path]()).forEach(Files.delete(_)))
      // the rewrite materialized last-write-wins: reads may skip dedup
      Files.createFile(cleanMarker(db))
      n
    } finally cached.unpersist()
  }

  /** GET /{db}/_query — the analytical path (SeriesEngine). */
  def query(db: String, q: SeriesQuery): DataFrame =
    SeriesEngine.query(frame(db), q)

  /** The reference's response shape: one JSON object keyed by
   * bucket-start ms, each value the array of reducer results
   * (handlers.go:170-227). Buckets emitted in ascending order (the
   * reference emits in completion order; SURVEY.md §7.5). Encoding is
   * kind-aware, not sniffed: identity/any values arrive from the
   * engine already JSON-encoded (a scalar string starting with '{' or
   * '[' stays quoted), key/distinct sets are quoted with full control-
   * char escaping, numerics go through Go's %v surface form. */
  def queryJson(db: String, q: SeriesQuery): String =
    queryJsonChunks(db, q).mkString

  /** Streaming form of [[queryJson]]: one chunk per bucket as rows
   * arrive from the cluster, for chunked HTTP emit without buffering
   * the response (the reference streams buckets the same way,
   * handlers.go:170-227). */
  def queryJsonChunks(db: String, q: SeriesQuery): Iterator[String] = {
    stat(db).queries.increment()
    val df = SeriesEngine.query(frame(db), q, jsonEncoded = true)
    val rows = df.toLocalIterator().asScala
    var first = true
    Iterator.single("{") ++ rows.map { row =>
      val sb = new StringBuilder
      if (!first) sb.append(',')
      first = false
      sb.append('"').append(row.getLong(0)).append("\":[")
      q.reducers.indices.foreach { i =>
        if (i > 0) sb.append(',')
        sb.append(jsonCell(q.reducers(i), row.get(i + 1)))
      }
      sb.append(']').toString
    } ++ Iterator.single("}")
  }

  private implicit class IterAdapter[T](it: java.util.Iterator[T]) {
    def asScala: Iterator[T] = new Iterator[T] {
      def hasNext: Boolean = it.hasNext
      def next(): T = it.next()
    }
  }

  /** One reducer result cell → JSON, by reducer kind. */
  private def jsonCell(red: String, v: Any): String = red match {
    case _ if v == null => "null"
    case "identity" => // elements pre-encoded by the engine (or null)
      v.asInstanceOf[scala.collection.Seq[String]]
        .map(x => if (x == null) "null" else x).mkString("[", ",", "]")
    case "any" => v.toString // pre-encoded by the engine
    case "distinct" | "obj_keys" | "obj_distinct_keys" =>
      v.asInstanceOf[scala.collection.Seq[String]]
        .map(jsonQuote).mkString("[", ",", "]")
    case "count" => v.toString
    case _ => v match { // numeric reducers
      case d: java.lang.Double =>
        if (d.isNaN || d.isInfinite) "null" else graft.functions.GoFormat.goDouble(d)
      case other => other.toString
    }
  }

  private def jsonQuote(s: String): String = SeriesStore.jsonQuote(s)
}

object SeriesStore {
  val dbExt = ".series"
  val schema: StructType = StructType(Seq(
    StructField("ts", LongType, nullable = false),
    StructField("seq", LongType, nullable = false),
    StructField("doc", StringType, nullable = false)))

  case class DbInfo(docCount: Long, spaceUsed: Long, lastSeq: Long)

  /** JSON string literal with full escaping (incl. control chars). */
  private[graft] def jsonQuote(s: String): String = {
    val sb = new StringBuilder("\"")
    s.foreach {
      case '"' => sb.append("\\\"")
      case '\\' => sb.append("\\\\")
      case '\n' => sb.append("\\n")
      case '\r' => sb.append("\\r")
      case '\t' => sb.append("\\t")
      case c if c < ' ' => sb.append(f"\\u${c.toInt}%04x")
      case c => sb.append(c)
    }
    sb.append('"').toString
  }

  def validJson(s: String): Boolean =
    try { JsonPointersExpr.mapper.readTree(s); true }
    catch { case _: Exception => false }
}
