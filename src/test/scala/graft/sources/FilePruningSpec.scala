package graft.sources

import graft.SparkSpec
import graft.operators.SeriesEngine.SeriesQuery
import java.nio.file.Files

/**
 * Manifest-level file skipping: per-file (minTs, maxTs, rows) recorded
 * at commit time make a time-bounded read touch only the files whose
 * range intersects the query — the table-format analog of the
 * reference's B-tree subrange walk (database.go:339-364).
 */
class FilePruningSpec extends SparkSpec {
  import spark.implicits._
  import CommitLog._

  def newStore(): SeriesStore =
    new SeriesStore(spark, Files.createTempDirectory("graft-prune").toString)

  private def day(d: Int): Long = // 2024-01-(d+1)T00Z in ns
    (1704067200L + d * 86400L) * 1000000000L

  private def loadThreeDays(s: SeriesStore): Unit = {
    s.create("db")
    // three separate commits = three (or more) disjoint-range files
    (0 until 3).foreach { d =>
      val docs = (0 until 50).map(i => (day(d) + i * 60L * 1000000000L,
        s"""{"d": $d, "i": $i}"""))
      s.storeBatch("db", docs.toDF("ts", "doc"))
    }
  }

  test("commits record per-file ts stats in the manifest") {
    val s = newStore()
    loadThreeDays(s)
    val files = s.scanFiles("db")
    assert(files.nonEmpty)
    assert(files.forall(_.hasStats), "every committed file carries stats")
    assert(files.forall(f => f.rows > 0 && f.minTs <= f.maxTs))
    assert(files.map(_.rows).sum == 150)
  }

  test("narrow time range scans a strict subset of the live files") {
    val s = newStore()
    loadThreeDays(s)
    val all = s.scanFiles("db")
    val d1 = s.scanFiles("db", Some(day(1)), Some(day(2)))
    assert(d1.size < all.size, s"expected pruning: ${d1.size} vs ${all.size}")
    assert(d1.nonEmpty)
    // pruned scan result == unpruned scan result, row for row
    val pruned = s.frame("db", Some(day(1)), Some(day(2)))
      .filter($"ts" >= day(1) && $"ts" < day(2))
    val full = s.frame("db").filter($"ts" >= day(1) && $"ts" < day(2))
    assert(pruned.orderBy("ts").collect().toSeq ==
      full.orderBy("ts").collect().toSeq)
    assert(pruned.count() == 50)
  }

  test("_query and _all prune files yet match unpruned results") {
    val s = newStore()
    loadThreeDays(s)
    val q = SeriesQuery(groupMs = 3600000L, ptrs = Seq("/i"),
      reducers = Seq("sum"),
      from = Some("2024-01-02T00:00:00Z"), to = Some("2024-01-03T00:00:00Z"))
    val viaStore = s.query("db", q).collect().toSeq
    val viaFull = graft.operators.SeriesEngine.query(s.frame("db"), q)
      .collect().toSeq
    assert(viaStore == viaFull)
    assert(viaStore.map(_.getDouble(1)).sum == (0 until 50).sum.toDouble)
    val ranged = s.all("db", from = Some("2024-01-02T00:00:00Z"),
      to = Some("2024-01-03T00:00:00Z"))
    assert(ranged.count() == 50)
  }

  test("out-of-range query reads zero files and returns empty") {
    val s = newStore()
    loadThreeDays(s)
    assert(s.scanFiles("db", Some(day(10)), Some(day(11))).isEmpty)
    assert(s.frame("db", Some(day(10)), Some(day(11))).count() == 0)
  }

  test("point get prunes to the owning file") {
    val s = newStore()
    loadThreeDays(s)
    val ts = day(2) + 5 * 60L * 1000000000L
    val hit = s.scanFiles("db", Some(ts), Some(ts + 1))
    assert(hit.size < s.scanFiles("db").size)
    assert(s.get("db", graft.timelib.TimeLib.formatCanonical(ts))
      .contains("""{"d": 2, "i": 5}"""))
  }

  test("deleteKeys rewrites only the owning files; untouched files keep their names") {
    val s = newStore()
    loadThreeDays(s)
    val before = s.scanFiles("db").map(_.name).toSet
    // two keys, both inside day 2 — days 0 and 1 files must survive
    // VERBATIM (same manifest entries, no rewrite)
    val k1 = day(2) + 5 * 60L * 1000000000L
    val k2 = day(2) + 9 * 60L * 1000000000L
    val keys = Seq(k1, k2).map(graft.timelib.TimeLib.formatCanonical)
    val n = s.deleteKeys("db", keys)
    assert(n == 2L, s"expected 2 deleted rows, got $n")
    val after = s.scanFiles("db").map(_.name).toSet
    // the day-0/day-1 files are still the SAME files (no table rewrite)
    val owning = before.diff(after)
    assert(owning.nonEmpty && owning.size < before.size,
      s"expected a targeted rewrite, got before=$before after=$after")
    assert(before.intersect(after).nonEmpty)
    // deleted keys are gone; their neighbors survive
    assert(s.get("db", keys.head).isEmpty)
    assert(s.get("db",
      graft.timelib.TimeLib.formatCanonical(day(2) + 6 * 60L * 1000000000L))
      .contains("""{"d": 2, "i": 6}"""))
    assert(s.frame("db").count() == 148)
    // snapshot stays clean: pruned reads still apply on all axes
    assert(s.scanFiles("db", Some(day(0)), Some(day(1))).size <
      s.scanFiles("db").size)
    // absent keys are a no-op (no commit, same manifest)
    val v0 = s.scanFiles("db").map(_.name).toSet
    assert(s.deleteKeys("db",
      Seq(graft.timelib.TimeLib.formatCanonical(day(9)))) == 0L)
    assert(s.scanFiles("db").map(_.name).toSet == v0)
  }

  test("deleteKeys takes a 1e5-key DataFrame: anti-join rewrite, no literal blowup") {
    val s = newStore()
    loadThreeDays(s)
    val before = s.scanFiles("db").map(_.name).toSet
    // 100k keys as a FRAME (the mass-takedown path — the Seq form's
    // isin literal would be a codegen blowup here): ids 0..49 name
    // day-2 rows that exist, the other ~99950 keys miss entirely
    val keys = spark.range(100000L)
      .select(($"id" * 60L * 1000000000L + day(2)).as("key"))
    val n = s.deleteKeys("db", keys)
    assert(n == 50L, s"expected the 50 existing day-2 rows deleted, got $n")
    val after = s.scanFiles("db").map(_.name).toSet
    // only the day-2 owning file(s) rewrote; day-0/1 files survive
    // VERBATIM — file selection is the sorted-interval probe, never
    // a full-table rewrite
    assert(before.intersect(after).nonEmpty,
      "expected untouched files to keep their names")
    assert(before.diff(after).nonEmpty && before.diff(after).size < before.size)
    assert(s.frame("db").count() == 100L)
    assert(s.frame("db").filter($"ts" >= day(2)).count() == 0L)
    // string-keyed frame parses distributed; absent keys are a no-op
    val v0 = s.scanFiles("db").map(_.name).toSet
    assert(s.deleteKeys("db", Seq("2029-01-01T00:00:00Z",
      "2029-01-02T00:00:00Z").toDF("key")) == 0L)
    assert(s.scanFiles("db").map(_.name).toSet == v0)
  }

  test("deleteKeys recovers declared pointer axes from the manifest") {
    val s = newStore()
    s.create("db")
    val docs = (0 until 40).map(i => (day(0) + i * 60L * 1000000000L,
      s"""{"src": "alpha", "q": ${0.2 + i * 0.001}}"""))
    s.storeBatch("db", docs.toDF("ts", "doc"),
      catPtrs = Seq("/src"), numPtrs = Seq("/q"))
    assert(s.scanFiles("db").forall(f =>
      f.catsBy.exists(_.contains("/src")) && f.numBy.exists(_.contains("/q"))))
    // takedown WITHOUT re-declaring the pointers: the rewritten
    // survivor file must re-record both axes (recovered from the
    // affected entries' catsBy/numBy), not degrade to ts-only stats
    val n = s.deleteKeys("db",
      Seq(graft.timelib.TimeLib.formatCanonical(day(0) + 5 * 60L * 1000000000L)))
    assert(n == 1L)
    val files = s.scanFiles("db")
    assert(files.nonEmpty)
    assert(files.forall(f => f.catsBy.exists(_.contains("/src"))),
      s"rewritten files lost their categorical axis: $files")
    assert(files.forall(f => f.numBy.exists(_.contains("/q"))),
      s"rewritten files lost their numeric axis: $files")
    assert(s.frame("db").count() == 39L)
  }

  test("stabIntervals ≡ brute-force interval stabbing (400 random layouts)") {
    // the deleteKeys file-selection core is a pure function — replay
    // it against the O(F) definition over random (possibly
    // overlapping, duplicated, adjacent) interval layouts and
    // boundary keys
    val rng = new scala.util.Random(42)
    (0 until 400).foreach { trial =>
      val n = rng.nextInt(30)
      val files = (0 until n).map { _ =>
        val lo = rng.nextInt(1000).toLong - 500
        val hi = lo + rng.nextInt(120)
        (lo, hi)
      }.sortBy(_._1).toArray
      val mins = files.map(_._1)
      val maxs = files.map(_._2)
      val pmax = maxs.scanLeft(Long.MinValue)(math.max).tail
      val keys = Seq.fill(20)(rng.nextInt(1200).toLong - 600) ++
        files.flatMap { case (lo, hi) => Seq(lo, hi, lo - 1, hi + 1) } ++
        Seq(Long.MinValue + 1, Long.MaxValue)
      keys.foreach { k =>
        val got = SeriesStore.stabIntervals(mins, maxs, pmax, k).toSet
        val want = files.indices.filter(i =>
          mins(i) <= k && k <= maxs(i)).toSet
        assert(got == want,
          s"trial $trial key $k: got $got want $want over ${files.toSeq}")
      }
    }
  }

  test("deleteKeys on a dirty snapshot removes every copy of the key") {
    val s = newStore()
    s.create("db")
    // two commits overwrite the same ts (dirty), plus a bystander key
    s.store("db", Some("2024-01-01T00:00:00Z"), """{"v": 1}""")
    s.store("db", Some("2024-01-01T00:00:00Z"), """{"v": 2}""")
    s.store("db", Some("2024-01-02T00:00:00Z"), """{"v": 3}""")
    val n = s.deleteKeys("db", Seq("2024-01-01T00:00:00Z"))
    // BOTH physical copies of the overwritten key are gone (file
    // selection is by ts-range, so every owning file rewrites)
    assert(n == 2L, s"expected both copies deleted, got $n")
    assert(s.get("db", "2024-01-01T00:00:00Z").isEmpty)
    assert(s.get("db", "2024-01-02T00:00:00Z").contains("""{"v": 3}"""))
    assert(s.frame("db").count() == 1)
  }

  test("dirty snapshots prune safely: all replicas of an in-range ts survive") {
    val s = newStore()
    s.create("db")
    val ts = day(0)
    s.store("db", Some("2024-01-01T00:00:00Z"), """{"v": 1}""")
    s.store("db", Some("2024-01-01T00:00:00Z"), """{"v": 2}""") // overwrite, dirty
    // both files straddle ts, so the dedup group is complete post-prune
    val f = s.frame("db", Some(ts), Some(ts + 1))
    assert(f.select("doc").as[String].collect().toSeq == Seq("""{"v": 2}"""))
  }

  test("compaction rewrites carry stats; pruning still works after replace") {
    val s = newStore()
    loadThreeDays(s)
    s.compact("db")
    val files = s.scanFiles("db")
    assert(files.forall(_.hasStats))
    val d0 = s.scanFiles("db", Some(day(0)), Some(day(1)))
    // single-file result after compact is fine; the pruned set must
    // still cover day 0 exactly
    assert(s.frame("db", Some(day(0)), Some(day(1)))
      .filter($"ts" < day(1)).count() == 50)
    assert(d0.forall(f => f.minTs < day(1) && f.maxTs >= day(0)))
  }

  test("compactSmall merges only small files; data and pruning intact") {
    val s = newStore()
    loadThreeDays(s)
    val before = s.scanFiles("db")
    val sizes = before.map(_.bytes).sorted
    // threshold above every file: all merge into one right-sized file
    val (merged, kept) = s.compactSmall("db", smallBytes = sizes.max + 1)
    assert(merged == before.size && kept == 0)
    val after = s.scanFiles("db")
    assert(after.size == 1 && after.forall(_.hasStats))
    assert(s.frame("db").count() == 150)
    // stats re-recorded on the merged file → pruning still file-bounded
    assert(s.scanFiles("db", Some(day(1)), Some(day(2))).size == 1)
    assert(s.frame("db", Some(day(1)), Some(day(2)))
      .filter($"ts" >= day(1) && $"ts" < day(2)).count() == 50)
    // threshold below every file: no-op
    val (m2, k2) = s.compactSmall("db", smallBytes = 1L)
    assert(m2 == 0 && k2 == 1)
  }

  test("compactSmall keeps big files untouched and preserves overwrite dedup") {
    val s = newStore()
    s.create("db")
    // one 'big' file (50 rows), then two small overwrite commits on
    // the same ts — the small merge must copy rows verbatim and leave
    // read-side last-write-wins intact
    s.storeBatch("db", (0 until 50).map(i =>
      (day(0) + i * 1000000000L, s"""{"i": $i}""")).toDF("ts", "doc")
      .coalesce(1))
    val bigName = s.scanFiles("db").head.name
    s.store("db", Some("2024-01-05T00:00:00Z"), """{"v": 1}""")
    s.store("db", Some("2024-01-05T00:00:00Z"), """{"v": 2}""")
    val bigBytes = s.scanFiles("db").find(_.name == bigName).get.bytes
    val (merged, kept) = s.compactSmall("db", smallBytes = bigBytes)
    assert(merged == 2 && kept == 1)
    assert(s.scanFiles("db").exists(_.name == bigName), "big file rewritten")
    // dedup still applies post-merge (clean flag was preserved false)
    assert(s.get("db", "2024-01-05T00:00:00Z").contains("""{"v": 2}"""))
    assert(s.frame("db").count() == 51)
  }

  test("stats-free legacy entries are never pruned (backward compat)") {
    val legacy = FileEntry("part-0.parquet", 10) // rows = -1 sentinel
    assert(!legacy.hasStats)
    assert(legacy.mayOverlap(Some(0L), Some(1L)))
    assert(legacy.mayOverlap(None, None))
    val statted = FileEntry("a.parquet", 10, 100L, 200L, 5L)
    assert(statted.mayOverlap(Some(150L), Some(160L)))
    assert(statted.mayOverlap(Some(200L), None)) // inclusive max
    assert(!statted.mayOverlap(Some(201L), None))
    assert(!statted.mayOverlap(None, Some(100L))) // to is exclusive
    assert(statted.mayOverlap(None, Some(101L)))
    val empty = FileEntry("e.parquet", 0, 0L, 0L, 0L)
    assert(!empty.mayOverlap(None, None)) // zero rows: nothing to scan
  }

  test("FileEntry stats survive the manifest JSON round-trip") {
    val m = Manifest(7, "append",
      Seq(FileEntry("a.parquet", 5, -10L, 99L, 3L), FileEntry("b.parquet", 6)),
      seqHi = 12, clean = false)
    val back = Manifest.fromJson(m.toJson)
    assert(back == m)
    val snap = Snapshot(7, back.files.toVector, clean = false, 12)
    assert(Snapshot.fromJson(snap.toJson) == snap)
  }

  // ---- categorical manifest stats (the second pruning axis) ----------

  private def loadThreeSources(s: SeriesStore, catPtr: Option[String]): Unit = {
    s.create("db")
    Seq("alpha", "beta", "gamma").zipWithIndex.foreach { case (src, d) =>
      val docs = (0 until 40).map(i => (day(d) + i * 60L * 1000000000L,
        s"""{"src": "$src", "i": $i}"""))
      s.storeBatch("db", docs.toDF("ts", "doc"), catPtr)
    }
  }

  test("declared categorical column records per-file sets; compact clusters and prunes") {
    val s = newStore()
    loadThreeSources(s, Some("/src"))
    // recorded on append commits already (even though dirty snapshots
    // won't prune on them)
    assert(s.scanFiles("db").forall(_.cats.isDefined))
    // clean + clustered: compact by the declared column, small files
    s.compact("db", Some("/src"), rowsPerFile = 40L)
    val all = s.scanFiles("db")
    assert(all.size > 1, s"need multiple files to prune, got ${all.size}")
    assert(all.forall(_.cats.isDefined))
    val hit = s.scanFiles("db", cat = Some("beta"))
    assert(hit.size < all.size, s"expected pruning: ${hit.size} vs ${all.size}")
    // pruned read ≡ unpruned read, row for row
    val pruned = s.frame("db", None, None, "/src", "beta")
    val full = s.frame("db").filter(
      SeriesStore.catValueCol("/src") === "beta")
    assert(pruned.orderBy("ts").collect().toSeq ==
      full.orderBy("ts").collect().toSeq)
    assert(pruned.count() == 40)
  }

  test("category pruning never applies to dirty snapshots: overwrites that change category stay correct") {
    val s = newStore()
    s.create("db")
    val ts = day(0)
    s.storeBatch("db", Seq((ts, """{"src": "a", "v": 1}""")).toDF("ts", "doc"),
      Some("/src"))
    // overwrite the SAME ts with a different category (dirty snapshot)
    s.storeBatch("db", Seq((ts, """{"src": "b", "v": 2}""")).toDF("ts", "doc"),
      Some("/src"))
    // the superseded version (src=a) must NOT resurrect
    assert(s.frame("db", None, None, "/src", "a").count() == 0)
    val b = s.frame("db", None, None, "/src", "b")
      .select("doc").as[String].collect().toSeq
    assert(b == Seq("""{"src": "b", "v": 2}"""))
  }

  test("undeclared writes and legacy manifests never categorically prune") {
    val s = newStore()
    loadThreeSources(s, None) // no declaration — no cats recorded
    s.compact("db") // clean, but still no cats
    assert(s.scanFiles("db").forall(_.cats.isEmpty))
    assert(s.scanFiles("db", cat = Some("beta")).size ==
      s.scanFiles("db").size)
    val r = s.frame("db", None, None, "/src", "beta")
    assert(r.count() == 40) // row filter alone is still exact
  }

  test("a file over the category cap records nothing and is never pruned") {
    val s = newStore()
    s.create("db")
    val docs = (0 until (SeriesStore.CatsMax + 5)).map(i =>
      (day(0) + i * 1000000000L, s"""{"src": "s$i"}"""))
    // one partition → one file holding CatsMax+5 distinct categories
    s.storeBatch("db", docs.toDF("ts", "doc").coalesce(1), Some("/src"))
    val files = s.scanFiles("db")
    assert(files.size == 1)
    assert(files.head.cats.isEmpty, "over-cap file must record nothing")
    assert(files.head.mayContainCat("s0") && files.head.mayContainCat("nope"))
    s.compact("db", Some("/src"), rowsPerFile = 1000L) // clean, 1 file
    assert(s.frame("db", None, None, "/src", "s3").count() == 1)
  }

  test("FileEntry cats survive the manifest JSON round-trip") {
    val m = Manifest(7, "append",
      Seq(FileEntry("a.parquet", 5, -10L, 99L, 3L,
          cats = Some(Vector("x", "y"))),
        FileEntry("b.parquet", 6, 0L, 1L, 1L, cats = Some(Vector())),
        FileEntry("c.parquet", 6)),
      seqHi = 12, clean = false)
    val back = Manifest.fromJson(m.toJson)
    assert(back == m)
    assert(back.files(0).mayContainCat("x"))
    assert(!back.files(0).mayContainCat("z"))
    assert(!back.files(1).mayContainCat("x")) // empty set: all-null file
    assert(back.files(2).mayContainCat("anything")) // unrecorded
  }

  // ---- numeric manifest stats (the third pruning axis) ---------------

  private def loadThreeBands(s: SeriesStore, numPtr: Option[String]): Unit = {
    s.create("db")
    // three commits, quality bands [0.0,0.2), [0.3,0.5), [0.6,0.8)
    (0 until 3).foreach { d =>
      val docs = (0 until 40).map(i => (day(d) + i * 60L * 1000000000L,
        s"""{"q": ${d * 0.3 + (i % 20) * 0.01}, "i": $i}"""))
      s.storeBatch("db", docs.toDF("ts", "doc"), None, numPtr)
    }
  }

  test("declared numeric column records per-file min/max; compact clusters and prunes") {
    val s = newStore()
    loadThreeBands(s, Some("/q"))
    // recorded on append commits already (dirty snapshots won't prune)
    assert(s.scanFiles("db").forall(_.num.isDefined))
    // clean + clustered: compact by the declared column, small files
    s.compact("db", None, rowsPerFile = 40L, numPtr = Some("/q"))
    val all = s.scanFiles("db")
    assert(all.size > 1, s"need multiple files to prune, got ${all.size}")
    assert(all.forall(_.num.isDefined))
    val hit = s.scanFiles("db", numBand = Some((Some(0.6), Some(0.8))))
    assert(hit.size < all.size, s"expected pruning: ${hit.size} vs ${all.size}")
    // pruned read ≡ unpruned read, row for row (the quality-band read)
    val pruned = s.frameNum("db", None, None, "/q", Some(0.6), Some(0.8))
    val full = s.frame("db").filter(
      SeriesStore.numValueCol("/q") >= 0.6 &&
        SeriesStore.numValueCol("/q") < 0.8)
    assert(pruned.orderBy("ts").collect().toSeq ==
      full.orderBy("ts").collect().toSeq)
    assert(pruned.count() == 40)
    // open-ended band: top-quality read
    val top = s.frameNum("db", None, None, "/q", Some(0.6), None)
    assert(top.count() == 40)
  }

  test("numeric pruning never applies to dirty snapshots: overwrites that change the value stay correct") {
    val s = newStore()
    s.create("db")
    val ts = day(0)
    s.storeBatch("db", Seq((ts, """{"q": 0.1, "v": 1}""")).toDF("ts", "doc"),
      None, Some("/q"))
    // overwrite the SAME ts with a different value (dirty snapshot)
    s.storeBatch("db", Seq((ts, """{"q": 0.9, "v": 2}""")).toDF("ts", "doc"),
      None, Some("/q"))
    // the superseded version (q=0.1) must NOT resurrect
    assert(s.frameNum("db", None, None, "/q", Some(0.0), Some(0.5))
      .count() == 0)
    val b = s.frameNum("db", None, None, "/q", Some(0.5), None)
      .select("doc").as[String].collect().toSeq
    assert(b == Seq("""{"q": 0.9, "v": 2}"""))
  }

  test("undeclared writes and legacy manifests never numerically prune") {
    val s = newStore()
    loadThreeBands(s, None) // no declaration — no num stats recorded
    s.compact("db") // clean, but still no num stats
    assert(s.scanFiles("db").forall(_.num.isEmpty))
    assert(s.scanFiles("db", numBand = Some((Some(0.6), Some(0.8)))).size ==
      s.scanFiles("db").size)
    val r = s.frameNum("db", None, None, "/q", Some(0.6), Some(0.8))
    assert(r.count() == 40) // row filter alone is still exact
  }

  test("all-null numeric files record the empty range and prune soundly") {
    val s = newStore()
    s.create("db")
    // no /q anywhere: the recorded empty range can never match a band
    val docs = (0 until 10).map(i =>
      (day(0) + i * 1000000000L, s"""{"other": $i}"""))
    s.storeBatch("db", docs.toDF("ts", "doc"), None, Some("/q"))
    s.compact("db", None, rowsPerFile = 1000L, numPtr = Some("/q"))
    val files = s.scanFiles("db")
    assert(files.forall(_.num.contains(Vector[Double]())))
    assert(s.scanFiles("db", numBand = Some((Some(0.0), None))).isEmpty)
    assert(s.frameNum("db", None, None, "/q", Some(0.0), None).count() == 0)
    // and the unfiltered read still sees every row
    assert(s.frame("db").count() == 10)
  }

  test("compactSmall with declarations re-records cat/num stats") {
    val s = newStore()
    loadThreeBands(s, Some("/q"))
    val sizes = s.scanFiles("db").map(_.bytes)
    val (merged, _) = s.compactSmall("db", smallBytes = sizes.max + 1,
      catPtr = None, numPtr = Some("/q"))
    assert(merged >= 2)
    assert(s.scanFiles("db").forall(_.num.isDefined),
      "merged files must re-record numeric stats")
    // band read stays exact over the merged layout
    val pruned = s.frameNum("db", None, None, "/q", Some(0.6), Some(0.8))
    assert(pruned.count() == 40)
  }

  test("FileEntry num stats survive the manifest JSON round-trip") {
    val m = Manifest(9, "append",
      Seq(FileEntry("a.parquet", 5, -10L, 99L, 3L,
          num = Some(Vector(0.25, 0.75))),
        FileEntry("b.parquet", 6, num = Some(Vector[Double]())),
        FileEntry("c.parquet", 7)),
      seqHi = 12, clean = false)
    val back = Manifest.fromJson(m.toJson)
    assert(back == m)
    assert(back.files(0).mayContainNum(Some(0.5), Some(0.9)))
    assert(!back.files(0).mayContainNum(Some(0.8), None))
    assert(!back.files(1).mayContainNum(None, None))
    assert(back.files(2).mayContainNum(Some(0.8), None))
  }

  // ---- multi-pointer manifest stats (compound pruning) ---------------

  private def loadCompound(s: SeriesStore): Unit = {
    s.create("db")
    // 3 sources × 2 quality bands, one commit per (source, band) —
    // declared on BOTH axes at write time
    Seq("alpha", "beta", "gamma").zipWithIndex.foreach { case (src, d) =>
      Seq(0.2, 0.8).zipWithIndex.foreach { case (q, qi) =>
        val docs = (0 until 20).map(i =>
          (day(d) + (qi * 3600 + i * 60) * 1000000000L,
            s"""{"src": "$src", "q": ${q + i * 0.001}}"""))
        s.storeBatch("db", docs.toDF("ts", "doc"),
          catPtrs = Seq("/src"), numPtrs = Seq("/q"))
      }
    }
  }

  test("multi-pointer stats record per file; compound read prunes on every axis") {
    val s = newStore()
    loadCompound(s)
    assert(s.scanFiles("db").forall(f =>
      f.catsBy.exists(_.contains("/src")) && f.numBy.exists(_.contains("/q"))))
    // compound clustering: (src, q, ts)
    s.compactMulti("db", Seq("/src"), Seq("/q"), rowsPerFile = 20L)
    val all = s.scanFiles("db")
    assert(all.size > 2, s"need several files, got ${all.size}")
    val bySrc = s.scanFiles("db", catEqs = Seq(("/src", "beta")))
    val byQ = s.scanFiles("db",
      numBands = Seq(("/q", Some(0.7), None)))
    val both = s.scanFiles("db", catEqs = Seq(("/src", "beta")),
      numBands = Seq(("/q", Some(0.7), None)))
    assert(bySrc.size < all.size && byQ.size < all.size)
    // the compound prune beats each single axis
    assert(both.size < bySrc.size && both.size < byQ.size,
      s"compound ${both.size} vs src ${bySrc.size} / q ${byQ.size}")
    // pruned compound read ≡ unpruned filter, row for row
    val pruned = s.frameMulti("db", None, None,
      Seq(("/src", "beta")), Seq(("/q", Some(0.7), None)))
    val full = s.frame("db")
      .filter(SeriesStore.catValueCol("/src") === "beta")
      .filter(SeriesStore.numValueCol("/q").isNotNull &&
        SeriesStore.numValueCol("/q") >= 0.7)
    assert(pruned.orderBy("ts").collect().toSeq ==
      full.orderBy("ts").collect().toSeq)
    assert(pruned.count() == 20)
  }

  test("pointer-keyed pruning never falls back to the wrong axis") {
    val s = newStore()
    s.create("db")
    val docs = (0 until 10).map(i => (day(0) + i * 1000000000L,
      s"""{"src": "only", "lang": "en$i"}"""))
    s.storeBatch("db", docs.toDF("ts", "doc"), catPtrs = Seq("/src"),
      numPtrs = Nil)
    s.compactMulti("db", Seq("/src"), Nil, rowsPerFile = 1000L)
    // /lang was never declared: a query on it must NOT prune via the
    // /src sets (new-format entries have no anonymous fallback)
    assert(s.scanFiles("db", catEqs = Seq(("/lang", "zz"))).size ==
      s.scanFiles("db").size)
    // ...but the declared pointer still prunes
    assert(s.scanFiles("db", catEqs = Seq(("/src", "nope"))).isEmpty)
  }

  test("FileEntry catsBy/numBy survive the manifest JSON round-trip") {
    val m = Manifest(11, "append",
      Seq(FileEntry("a.parquet", 5, -10L, 99L, 3L,
          cats = Some(Vector("x")), num = Some(Vector(0.1, 0.9)),
          catsBy = Some(Map("/src" -> Vector("x"),
            "/lang" -> Vector("de", "en"))),
          numBy = Some(Map("/q" -> Vector(0.1, 0.9),
            "/len" -> Vector[Double]()))),
        FileEntry("b.parquet", 6)),
      seqHi = 12, clean = false)
    val back = Manifest.fromJson(m.toJson)
    assert(back == m)
    val f = back.files.head
    assert(f.mayContainCatAt("/src", "x") && !f.mayContainCatAt("/src", "y"))
    assert(f.mayContainCatAt("/undeclared", "anything"))
    assert(f.mayContainNumAt("/q", Some(0.5), None))
    assert(!f.mayContainNumAt("/q", Some(0.95), None))
    assert(!f.mayContainNumAt("/len", None, None)) // empty range
    assert(f.mayContainNumAt("/other", Some(99.0), None))
    // legacy entry (no maps): anonymous fallback still applies
    assert(back.files(1).mayContainCatAt("/src", "anything"))
  }

  test("legacy adoption records stats for adopted part- files") {
    val root = Files.createTempDirectory("graft-prune").toString
    // fabricate a pre-commit-log db: plain part-*.parquet in the dir
    val dir = java.nio.file.Paths.get(root, "old.series")
    Files.createDirectories(dir)
    val df = Seq((day(0), 1L, """{"v": 1}"""), (day(1), 2L, """{"v": 2}"""))
      .toDF("ts", "seq", "doc")
    val tmp = Files.createTempDirectory("graft-prune-write")
    df.coalesce(1).write.mode("overwrite").parquet(tmp.toString + "/out")
    val part = Files.list(java.nio.file.Paths.get(tmp.toString, "out"))
      .filter(p => p.getFileName.toString.endsWith(".parquet")).findFirst().get()
    Files.copy(part, dir.resolve("part-00000.parquet"))
    val s = new SeriesStore(spark, root)
    assert(s.frame("old").count() == 2)
    val files = s.scanFiles("old")
    assert(files.forall(_.hasStats))
    assert(files.head.minTs == day(0) && files.head.maxTs == day(1))
  }
}
