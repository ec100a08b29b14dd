package graft.sources

import com.fasterxml.jackson.databind.JsonNode

import java.nio.file.{Files, Path, StandardCopyOption, StandardOpenOption}

/**
 * Per-database transactional commit log — the cross-process write
 * protocol behind [[SeriesStore]]. The reference serializes all
 * writers through one per-DB goroutine over couchstore's
 * crash-consistent B-tree (database.go:175-254, 275-302); at cluster
 * scale the equivalent is a table-format commit log (the public
 * Delta/Iceberg design): immutable, uniquely-named data files plus an
 * ordered log of JSON manifests, where **creating log entry N+1 with
 * `CREATE_NEW` is the one atomic, contended operation**. Writers
 * race; exactly one wins the filesystem's atomic create, losers
 * re-read the new state and retry. Nothing else needs cross-process
 * coordination:
 *
 *  - data files are written once under fresh UUID names and never
 *    modified — a reader holding snapshot N scans exactly the files
 *    N lists, unaffected by concurrent commits;
 *  - a crash before the manifest lands leaves only orphan data files
 *    (swept by vacuum), never a partial table state;
 *  - sequence-number ranges are allocated by the commit itself
 *    (`seqHi` in the manifest), so last-write-wins ordering is
 *    defined by commit order, race-free across JVMs.
 *
 * Manifest kinds: `create` (v1, empty table), `append` (adds files,
 * marks the table possibly-duplicated), `replace` (compaction /
 * delete rewrite: swaps the whole live set, marks it clean). A
 * full-state checkpoint is written every [[CommitLog.CheckpointEvery]]
 * commits so snapshot reconstruction replays O(10) small JSON files,
 * not the table's whole history.
 *
 * On a POSIX filesystem `CREATE_NEW` is atomic; object stores without
 * atomic create-if-absent need a commit service in front of the log
 * (the public Delta-on-S3 arrangement) — the protocol is unchanged.
 */
final class CommitLog(dbDir: Path) {
  import CommitLog._

  private val logDir = dbDir.resolve("_log")

  def init(): Boolean = {
    Files.createDirectories(logDir)
    // the create manifest carries a fresh table UID: a drop + recreate
    // is a NEW incarnation even when its commit versions replay the
    // same numbers — anything keyed on table state (the query cache)
    // must mix the UID in, or version 2 of the new table aliases
    // version 2 of the old one
    tryCommit(Manifest(1, "create", Vector(), seqHi = 0, clean = true,
      uid = java.util.UUID.randomUUID().toString))
  }

  def initialized: Boolean =
    Files.isDirectory(logDir) && latestVersion() >= 1

  /** Highest committed version, 0 if none. */
  def latestVersion(): Long = listLog().lastOption.getOrElse(0L)

  /** The incarnation UID from the v1 create manifest, "" if absent.
   * One small file read — deliberately NOT cached in this object:
   * another process may drop + recreate the directory underneath us,
   * and a stale cached UID would resurrect exactly the cache-aliasing
   * bug the UID exists to prevent. */
  def tableId(): String = {
    val m = manifestPath(1)
    if (Files.exists(m))
      try Manifest.fromJson(new String(Files.readAllBytes(m), "UTF-8")).uid
      catch { case _: Exception => "" }
    else ""
  }

  private def listLog(): Seq[Long] = {
    if (!Files.isDirectory(logDir)) return Nil
    val s = Files.list(logDir)
    try {
      val it = s.iterator()
      val b = Seq.newBuilder[Long]
      while (it.hasNext) {
        val n = it.next().getFileName.toString
        // strict name match: a stray foreign .json (editor backup,
        // copied file) must not brick the db with a parse error
        if (manifestName.matches(n)) b += n.stripSuffix(".json").toLong
      }
      b.result().sorted
    } finally s.close()
  }

  private val manifestName = "^[0-9]{20}\\.json$".r
  // same strictness as manifests: a stray foreign file ending in
  // .ckpt.json (editor backup, copied checkpoint) must be skipped,
  // not parsed as a version number
  private val ckptName = "^[0-9]{20}\\.ckpt\\.json$".r

  private def manifestPath(v: Long): Path =
    logDir.resolve(f"$v%020d.json")
  private def ckptPath(v: Long): Path =
    logDir.resolve(f"$v%020d$ckptSuffix")

  /** Checkpoint versions on disk, ascending. */
  private def listCkpts(): Seq[Long] = {
    if (!Files.isDirectory(logDir)) return Nil
    val s = Files.list(logDir)
    try {
      val it = s.iterator()
      val b = Seq.newBuilder[Long]
      while (it.hasNext) {
        val n = it.next().getFileName.toString
        if (ckptName.matches(n)) b += n.stripSuffix(ckptSuffix).toLong
      }
      b.result().sorted
    } finally s.close()
  }

  /** Atomically commit manifest `m` as version `m.v`. Returns false if
   * another writer won the version — caller re-reads and retries. */
  def tryCommit(m: Manifest): Boolean =
    try {
      Files.write(manifestPath(m.v), m.toJson.getBytes("UTF-8"),
        StandardOpenOption.CREATE_NEW)
      true
    } catch { case _: java.nio.file.FileAlreadyExistsException => false }

  /** Current table state: latest checkpoint + replay of newer
   * manifests. */
  def snapshot(): Snapshot = {
    val versions = listLog()
    if (versions.isEmpty) Snapshot(0, Vector(), clean = true, 0)
    else stateAt(versions, versions.last)
  }

  /** Table state as of committed version `v` (time travel). The
   * returned file list is exact while the files survive — i.e. until
   * a later replace's vacuum grace expires. */
  def snapshotAt(v: Long): Snapshot = {
    val versions = listLog()
    require(versions.contains(v), s"no committed version $v")
    stateAt(versions, v)
  }

  private def stateAt(versions: Seq[Long], v: Long): Snapshot = {
    val base = latestCheckpointAtMost(v)
      .getOrElse(Snapshot(0, Vector(), clean = true, 0))
    versions.filter(x => x > base.version && x <= v)
      .foldLeft(base)((s, x) => apply(s, readManifest(x)))
  }

  /** Manifests with version strictly greater than `v`, ascending.
   * LENIENT: after [[prune]] the window may start later than `v+1` —
   * fine for audit listings ([[SeriesStore.history]]), NOT for rebase
   * (use [[commitsSinceExact]], which refuses a gapped window). */
  def commitsSince(v: Long): Seq[Manifest] =
    listLog().filter(_ > v).map(readManifest)

  /** Strict rebase window: every manifest in `(v, latest]`, or None if
   * pruning has removed part of it (possible only when ≥2 checkpoints
   * landed after `v` — the caller must recompute from a fresh
   * snapshot instead of silently dropping the missing commits). */
  def commitsSinceExact(v: Long): Option[Seq[Manifest]] = {
    val vs = listLog().filter(_ > v)
    val contiguous = vs.zipWithIndex.forall { case (x, i) => x == v + 1 + i }
    if (contiguous) Some(vs.map(readManifest)) else None
  }

  private def apply(s: Snapshot, m: Manifest): Snapshot = m.kind match {
    case "create" => Snapshot(m.v, Vector(), clean = true, 0, m.uid)
    case "append" => Snapshot(m.v, s.files ++ m.files, clean = false,
      math.max(s.lastSeq, m.seqHi), s.uid, adoptedAfter(s, m))
    case "replace" => Snapshot(m.v, m.files.toVector, m.clean,
      math.max(s.lastSeq, m.seqHi), s.uid, adoptedAfter(s, m))
    case other => throw new IllegalStateException(
      s"unknown manifest kind '$other' at version ${m.v}")
  }

  /** Legacy (`part-*`) names ever referenced in this incarnation —
   * the adoption-idempotence set ([[SeriesStore.ensureMigrated]]).
   * Carried in the snapshot (and thus checkpoints) so it survives
   * [[prune]], which deletes the old manifests it would otherwise be
   * recomputed from. Bounded: legacy files are a one-time population.
   * Kept sorted so checkpoint bytes stay a pure function of version. */
  private def adoptedAfter(s: Snapshot, m: Manifest): Vector[String] = {
    val add = m.files.iterator.map(_.name).filter(_.startsWith("part-")).toVector
    if (add.isEmpty) s.adopted
    else (s.adopted ++ add).distinct.sorted
  }

  def readManifest(v: Long): Manifest =
    Manifest.fromJson(new String(Files.readAllBytes(manifestPath(v)), "UTF-8"))

  /** Write a checkpoint if the version hits the cadence. Idempotent
   * and race-safe: content is a pure function of the version, and the
   * atomic move makes the last writer win with identical bytes. */
  def checkpointMaybe(s: Snapshot): Unit =
    if (s.version > 0 && s.version % CheckpointEvery == 0 &&
        !Files.exists(ckptPath(s.version))) {
      val tmp = logDir.resolve(s".ckpt-${java.util.UUID.randomUUID()}")
      Files.write(tmp, s.toJson.getBytes("UTF-8"))
      Files.move(tmp, ckptPath(s.version), StandardCopyOption.ATOMIC_MOVE,
        StandardCopyOption.REPLACE_EXISTING)
      prune()
    }

  /** Bound the log. Checkpoints make manifests older than the newest
   * one dead weight for replay, but concurrent rewrites still rebase
   * through [[commitsSinceExact]] windows that can start one
   * checkpoint back — so the floor is the newest checkpoint that is
   * at least [[CheckpointEvery]] behind the newest, and everything
   * strictly below it goes (manifests and older checkpoints), EXCEPT
   * the v1 create manifest, which [[tableId]] reads as the incarnation
   * identity. Retained steady state: ≤ ~2·CheckpointEvery manifests +
   * 2 checkpoints + v1 — every directory listing ([[latestVersion]],
   * [[snapshot]], the cache key) is O(1) in table age, not O(#commits).
   * A rebase that spans the pruned gap anyway sees None from
   * [[commitsSinceExact]] and recomputes; time travel below the floor
   * fails with "no committed version" (table-format retention
   * semantics). Races are benign: prune only deletes files replay no
   * longer needs, and double deletes are no-ops. */
  private def prune(): Unit = {
    val ckpts = listCkpts()
    if (ckpts.isEmpty) return
    val newest = ckpts.last
    for (floor <- ckpts.filter(_ <= newest - CheckpointEvery).lastOption) {
      listLog().foreach(v =>
        if (v > 1 && v < floor) Files.deleteIfExists(manifestPath(v)))
      ckpts.foreach(c => if (c < floor) Files.deleteIfExists(ckptPath(c)))
    }
  }

  private def latestCheckpointAtMost(v: Long): Option[Snapshot] = {
    val best = listCkpts().filter(_ <= v).lastOption
    best.map(cv => Snapshot.fromJson(
      new String(Files.readAllBytes(ckptPath(cv)), "UTF-8")))
  }
}

object CommitLog {
  val CheckpointEvery = 10
  private val ckptSuffix = ".ckpt.json"

  /** One immutable data file: name relative to the db dir + size (so
   * `info`'s space accounting never walks the directory), plus
   * OPTIONAL per-file ts statistics `(minTs, maxTs, rows)` recorded at
   * commit time from the parquet footer. The stats make the manifest a
   * file-level index: a time-bounded read drops files whose [minTs,
   * maxTs] misses the range BEFORE Spark ever lists or footer-reads
   * them — the table-format analog of the reference's B-tree subrange
   * walk (database.go:339-364), which visits only the key range's
   * leaves instead of the whole tree. `rows < 0` means "stats unknown"
   * (legacy manifest): such files are always scanned, so old tables
   * stay correct and pick up stats on their next compact. */
  case class FileEntry(name: String, bytes: Long,
      minTs: Long = 0L, maxTs: Long = 0L, rows: Long = -1L,
      cats: Option[Vector[String]] = None,
      num: Option[Vector[Double]] = None,
      catsBy: Option[Map[String, Vector[String]]] = None,
      numBy: Option[Map[String, Vector[Double]]] = None) {
    def hasStats: Boolean = rows >= 0
    /** File may contain a ts in [fromNs, toNs)? Unknown stats ⇒ true. */
    def mayOverlap(fromNs: Option[Long], toNs: Option[Long]): Boolean =
      if (!hasStats) true
      else if (rows == 0) false
      else fromNs.forall(maxTs >= _) && toNs.forall(minTs < _)
    /** File may contain a row whose DECLARED categorical column equals
     * `v`? Unrecorded set (legacy manifests, undeclared writes, sets
     * over the write-time cap) ⇒ true — pruning is only ever an
     * optimization, never a correctness dependency. The recorded set
     * excludes nulls: a null category can never satisfy an equality
     * predicate, so an all-null file prunes away soundly. */
    def mayContainCat(v: String): Boolean = cats.forall(_.contains(v))
    /** File may contain a row whose DECLARED numeric pointer value
     * lands in [lo, hi)? The third manifest pruning axis (the
     * quality-score band read). `num` is `Vector(min, max)` of the
     * file's non-null parsed values, `Vector()` when the file has
     * none (all-null prunes soundly — a null can't satisfy a range
     * predicate), absent (legacy manifests, undeclared writes,
     * stat-job failure) ⇒ always scan. */
    def mayContainNum(lo: Option[Double], hi: Option[Double]): Boolean =
      num match {
        case None => true
        case Some(Vector()) => false
        case Some(v) => lo.forall(v(1) >= _) && hi.forall(v(0) < _)
      }
    /** POINTER-KEYED categorical pruning — the multi-pointer manifest
     * axis: `catsBy` maps each DECLARED pointer to the file's bounded
     * distinct set, so compound predicates (source AND quality AND
     * ts) prune on every declared axis at once. A new-format entry
     * whose map lacks `ptr` never falls back to the legacy anonymous
     * `cats` (whose pointer identity was never recorded — that
     * fallback could prune on the WRONG column); legacy entries keep
     * the legacy single-axis behavior and its caller contract. */
    def mayContainCatAt(ptr: String, v: String): Boolean = catsBy match {
      case Some(m) => m.get(ptr).forall(_.contains(v))
      case None => mayContainCat(v)
    }
    /** Pointer-keyed numeric pruning ([[mayContainCatAt]]'s rules). */
    def mayContainNumAt(ptr: String, lo: Option[Double],
        hi: Option[Double]): Boolean = numBy match {
      case Some(m) => m.get(ptr) match {
        case None => true
        case Some(Vector()) => false
        case Some(v) => lo.forall(v(1) >= _) && hi.forall(v(0) < _)
      }
      case None => mayContainNum(lo, hi)
    }
    def toJson: String = {
      val stats = if (hasStats) s""","min":$minTs,"max":$maxTs,"rows":$rows"""
        else ""
      val cstats = cats.fold("")(cs =>
        s""","cats":${cs.map(SeriesStore.jsonQuote).mkString("[", ",", "]")}""")
      val nstats = num.fold("")(v =>
        s""","num":${v.mkString("[", ",", "]")}""")
      val cbstats = catsBy.fold("")(m =>
        s""","catsBy":${m.toSeq.sortBy(_._1).map { case (p, cs) =>
          s"${SeriesStore.jsonQuote(p)}:${cs.map(SeriesStore.jsonQuote)
            .mkString("[", ",", "]")}"
        }.mkString("{", ",", "}")}""")
      val nbstats = numBy.fold("")(m =>
        s""","numBy":${m.toSeq.sortBy(_._1).map { case (p, v) =>
          s"${SeriesStore.jsonQuote(p)}:${v.mkString("[", ",", "]")}"
        }.mkString("{", ",", "}")}""")
      s"""{"f":${SeriesStore.jsonQuote(name)},"bytes":$bytes$stats$cstats$nstats$cbstats$nbstats}"""
    }
  }

  /** `uid` is set on `create` manifests only: the table-incarnation
   * identity (see [[CommitLog.init]]). */
  case class Manifest(v: Long, kind: String, files: Seq[FileEntry],
      seqHi: Long, clean: Boolean, uid: String = "") {
    def toJson: String =
      s"""{"v":$v,"kind":${SeriesStore.jsonQuote(kind)},""" +
        s""""files":${files.map(_.toJson).mkString("[", ",", "]")},""" +
        s""""seqHi":$seqHi,"clean":$clean,"uid":${SeriesStore.jsonQuote(uid)}}"""
  }

  object Manifest {
    def fromJson(s: String): Manifest = {
      val n = graft.functions.JsonPointersExpr.mapper.readTree(s)
      Manifest(n.get("v").asLong(), n.get("kind").asText(),
        fileEntries(n), n.get("seqHi").asLong(), n.get("clean").asBoolean(),
        if (n.has("uid")) n.get("uid").asText() else "")
    }
  }

  /** `adopted`: legacy `part-*` names ever referenced in this
   * incarnation (sorted) — see [[CommitLog.adoptedAfter]]. */
  case class Snapshot(version: Long, files: Vector[FileEntry],
      clean: Boolean, lastSeq: Long, uid: String = "",
      adopted: Vector[String] = Vector()) {
    def toJson: String =
      s"""{"v":$version,"files":${files.map(_.toJson).mkString("[", ",", "]")},""" +
        s""""clean":$clean,"lastSeq":$lastSeq,"uid":${SeriesStore.jsonQuote(uid)},""" +
        s""""adopted":${adopted.map(SeriesStore.jsonQuote).mkString("[", ",", "]")}}"""
  }

  object Snapshot {
    def fromJson(s: String): Snapshot = {
      val n = graft.functions.JsonPointersExpr.mapper.readTree(s)
      val adopted =
        if (n.has("adopted")) {
          val b = Vector.newBuilder[String]
          val it = n.get("adopted").elements()
          while (it.hasNext) b += it.next().asText()
          b.result()
        } else Vector[String]()
      Snapshot(n.get("v").asLong(), fileEntries(n).toVector,
        n.get("clean").asBoolean(), n.get("lastSeq").asLong(),
        if (n.has("uid")) n.get("uid").asText() else "", adopted)
    }
  }

  private def fileEntries(n: JsonNode): Vector[FileEntry] = {
    val arr = n.get("files")
    val b = Vector.newBuilder[FileEntry]
    val it = arr.elements()
    while (it.hasNext) {
      val e = it.next()
      val cats =
        if (e.has("cats")) {
          val cb = Vector.newBuilder[String]
          val cit = e.get("cats").elements()
          while (cit.hasNext) cb += cit.next().asText()
          Some(cb.result())
        } else None
      val num =
        if (e.has("num")) {
          val nb = Vector.newBuilder[Double]
          val nit = e.get("num").elements()
          while (nit.hasNext) nb += nit.next().asDouble()
          Some(nb.result())
        } else None
      val catsBy =
        if (e.has("catsBy")) {
          val mb = Map.newBuilder[String, Vector[String]]
          val fit = e.get("catsBy").fields()
          while (fit.hasNext) {
            val f = fit.next()
            val cb = Vector.newBuilder[String]
            val cit = f.getValue.elements()
            while (cit.hasNext) cb += cit.next().asText()
            mb += (f.getKey -> cb.result())
          }
          Some(mb.result())
        } else None
      val numBy =
        if (e.has("numBy")) {
          val mb = Map.newBuilder[String, Vector[Double]]
          val fit = e.get("numBy").fields()
          while (fit.hasNext) {
            val f = fit.next()
            val nb = Vector.newBuilder[Double]
            val nit = f.getValue.elements()
            while (nit.hasNext) nb += nit.next().asDouble()
            mb += (f.getKey -> nb.result())
          }
          Some(mb.result())
        } else None
      b += FileEntry(e.get("f").asText(), e.get("bytes").asLong(),
        if (e.has("min")) e.get("min").asLong() else 0L,
        if (e.has("max")) e.get("max").asLong() else 0L,
        if (e.has("rows")) e.get("rows").asLong() else -1L,
        cats, num, catsBy, numBy)
    }
    b.result()
  }
}
