package graft

import graft.functions.GoFormat
import graft.operators.SeriesEngine
import graft.operators.SeriesEngine.SeriesQuery
import graft.timelib.TimeLib
import org.scalacheck.{Gen, Prop}
import org.scalatest.funsuite.AnyFunSuite

/**
 * Property tests for the invariants golden values can't pin down
 * (SURVEY.md §5): parse/format round-trips, bucketing arithmetic,
 * reducer consistency relations.
 */
class PropertySpec extends AnyFunSuite {

  private def check(p: Prop, min: Int = 100): Unit = {
    val res = org.scalacheck.Test.check(
      org.scalacheck.Test.Parameters.default.withMinSuccessfulTests(min), p)
    assert(res.passed, res.status.toString)
  }

  // epoch ns range: 1970..~2200, away from Long overflow
  private val nsGen = Gen.chooseNum(0L, 7_258_118_400_000_000_000L)

  test("canonical format/parse round-trips at ns precision") {
    check(Prop.forAll(nsGen) { ns =>
      TimeLib.parseCanonical(TimeLib.formatCanonical(ns)).contains(ns)
    })
  }

  test("parseTime accepts canonical output and epoch integers consistently") {
    // bare-integer auto-ranging means epoch SECONDS only up to 2^31
    // (beyond 2038 the integer re-ranges as ms — reference behavior,
    // timelib/time.go:132-145), so constrain the seconds form
    val secGen = Gen.chooseNum(10001L, Int.MaxValue.toLong)
    check(Prop.forAll(nsGen, secGen) { (ns, sec) =>
      TimeLib.parseTime(TimeLib.formatCanonical(ns)).contains(ns) &&
        TimeLib.parseTime(sec.toString).contains(sec * 1000000000L) &&
        (sec * 1000L <= Int.MaxValue ||
          TimeLib.parseTime((sec * 1000L).toString).contains(sec * 1000000000L)) &&
        (ns <= Int.MaxValue.toLong * 1000L ||
          TimeLib.parseTime(ns.toString).contains(ns))
    })
  }

  test("goDouble/goParseFloat round-trips arbitrary finite doubles") {
    check(Prop.forAll(Gen.chooseNum(Long.MinValue, Long.MaxValue)) { bits =>
      val d = java.lang.Double.longBitsToDouble(bits)
      d.isNaN || d.isInfinite || {
        val parsed = graft.functions.JsonPointersExpr.goParseFloat(GoFormat.goDouble(d))
        parsed != null && parsed.doubleValue() == d
      }
    })
  }

  test("bucket arithmetic: floor alignment, idempotence, membership") {
    val chunkGen = Gen.chooseNum(1L, 86400000L).map(_ * 1000000L)
    check(Prop.forAll(nsGen, chunkGen) { (ns, chunk) =>
      val bucket = ns - java.lang.Math.floorMod(ns, chunk)
      bucket % chunk == 0 && bucket <= ns && ns < bucket + chunk
    })
  }

  // Spark-backed consistency properties on one shared session
  private lazy val spark = SparkSpec.spark

  test("reducer consistency: sum/avg/count/min/max relations on random docs") {
    import spark.implicits._
    val valsGen = Gen.nonEmptyListOf(Gen.chooseNum(-1000000, 1000000))
    check(Prop.forAllNoShrink(valsGen) { xs =>
      val b = 1346189040L
      val docs = xs.zipWithIndex.map { case (v, i) =>
        ((b + i) * 1000000000L, s"""{"v": $v}""") }
      val df = docs.toDF("ts", "doc")
      val row = SeriesEngine.query(df, SeriesQuery(86400000L * 10,
        Seq("/v", "/v", "/v", "/v", "/v"),
        Seq("sum", "avg", "count", "min", "max"),
        names = Seq("s", "a", "n", "mn", "mx"))).head()
      val (s, a, n) = (row.getDouble(1), row.getDouble(2), row.getLong(3))
      val (mn, mx) = (row.getDouble(4), row.getDouble(5))
      n == xs.length &&
        math.abs(s - xs.map(_.toDouble).sum) < 1e-6 &&
        math.abs(a - s / n) < 1e-9 &&
        mn == xs.min.toDouble && mx == xs.max.toDouble &&
        mn <= a && a <= mx
    }, min = 20)
  }

  test("oracle replace-chain == engine mergePass for both fixed merge tables") {
    // The DuckDB oracles mirror BPE encoding as chained
    // '§l§r' → '§lr' replaces over a marker-delimited form. That
    // chain equals the engine's exact-symbol mergePass ONLY if no
    // rule's right operand is a proper prefix of a symbol an earlier
    // rule created (SQL replace prefix-matches; mergePass compares
    // whole symbols) — a corpus-dependent hazard the gates alone
    // cannot pin (they pass as long as the hazardous adjacency is
    // absent from testdata). This replays the replace chain in Scala
    // over RANDOM text for both fixed tables, so a future table edit
    // that reintroduces prefix capture fails here, corpus-free.
    def chainEncode(word: String,
        merges: Seq[(Int, String, String)]): Seq[String] = {
      val marked = word.codePoints().toArray
        .map(cp => "§" + new String(Character.toChars(cp))).mkString
      val folded = merges.sortBy(_._1).foldLeft(marked) {
        case (acc, (_, l, r)) => acc.replace(s"§$l§$r", s"§$l$r")
      }
      folded.split('§').toSeq.filter(_.nonEmpty)
    }
    def engineEncode(word: String,
        merges: Seq[(Int, String, String)]): Seq[String] = {
      val rules = merges.sortBy(_._1).map { case (_, l, r) =>
        Array(l, r) }.toArray
      val out = graft.functions.BpeEncodeExpr.encode(
        org.apache.spark.unsafe.types.UTF8String.fromString(word), rules,
        new java.util.HashMap[String,
          org.apache.spark.sql.catalyst.util.ArrayData]())
      (0 until out.numElements()).map(i => out.getUTF8String(i).toString)
    }
    val wsAlpha = "tablescanrovue".distinct
    val pretokAlpha = " thean isrx".distinct
    def gen(alpha: String) = Gen.chooseNum(1, 12).flatMap(n =>
      Gen.listOfN(n, Gen.oneOf(alpha.toSeq)).map(_.mkString))
    check(Prop.forAll(gen(wsAlpha)) { w =>
      chainEncode(w, Queries.fixedMerges) ==
        engineEncode(w, Queries.fixedMerges)
    }, min = 400)
    check(Prop.forAll(gen(pretokAlpha)) { w =>
      chainEncode(w, Queries.fixedMergesPretok) ==
        engineEncode(w, Queries.fixedMergesPretok)
    }, min = 400)
    // the regression the round-15 review caught, pinned explicitly:
    // a space-led segment whose letters begin with 'an'
    assert(chainEncode(" and", Queries.fixedMergesPretok) ==
      engineEncode(" and", Queries.fixedMergesPretok))
  }

  test("minhash signature expression matches a reference fold on random shingles") {
    import graft.operators.Dedup
    import org.apache.spark.sql.functions.{col, lit, split}
    import spark.implicits._
    val docGen = Gen.nonEmptyListOf(
      Gen.nonEmptyListOf(Gen.alphaNumStr.map(_.take(6)).suchThat(_.nonEmpty))
        .map(_.take(30)))
    check(Prop.forAllNoShrink(docGen) { docs =>
      val n = 16
      val df = docs.zipWithIndex
        .map { case (ws, i) => (i.toLong, ws.mkString(" ")) }
        .toDF("doc_id", "text")
      val got = df.select(col("doc_id"),
          graft.functions.MinHashSigExpr.minhashSig(split(col("text"), " "), n)
            .as("sig"))
        .collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
      // reference fold: per-token md5-60 hash mod p, then n minima
      val md = java.security.MessageDigest.getInstance("MD5")
      docs.zipWithIndex.forall { case (ws, i) =>
        val hs = ws.map(w => graft.functions.SimHash60
          .hash60(md, w.getBytes("UTF-8")) % Dedup.MinhashP)
        val expect = (0 until n).map(j =>
          hs.map(h => (Dedup.minhashA(j) * h + Dedup.minhashB(j)) % Dedup.MinhashP).min)
        got(i.toLong) == expect
      }
    }, min = 20)
  }

  test("cluster labels are a fixpoint: every edge joins equal labels") {
    import graft.operators.Dedup
    import spark.implicits._
    val edgeGen = Gen.nonEmptyListOf(
      Gen.zip(Gen.chooseNum(0L, 30L), Gen.chooseNum(0L, 30L))
        .suchThat { case (a, b) => a != b }).map(_.take(40))
    check(Prop.forAllNoShrink(edgeGen) { es =>
      val pairs = es.map { case (a, b) => (math.min(a, b), math.max(a, b)) }
        .toDF("id1", "id2")
      val labels = Dedup.clusters(pairs).collect()
        .map(r => r.getLong(0) -> r.getLong(1)).toMap
      // fixpoint (connected ⇒ same label) and minimality (label is a
      // member of its own cluster and the min of its members)
      val byLabel = labels.groupBy(_._2).view.mapValues(_.keys.min).toMap
      es.forall { case (a, b) => labels(a) == labels(b) } &&
        byLabel.forall { case (lbl, minMember) => lbl == minMember }
    }, min = 15)
  }

  test("bucketed range join equals the naive BETWEEN join on random data") {
    import graft.operators.RangeJoin
    import spark.implicits._
    val gen = Gen.zip(
      Gen.listOfN(25, Gen.zip(Gen.chooseNum(0L, 3L), Gen.chooseNum(0L, 300L))),
      Gen.listOfN(12, Gen.zip(Gen.chooseNum(0L, 3L), Gen.chooseNum(0L, 300L),
        Gen.chooseNum(0L, 120L))),
      Gen.oneOf(7L, 50L, 400L)) // widths below/near/above interval spans
    check(Prop.forAllNoShrink(gen) { case (ps, ivs, width) =>
      val points = ps.zipWithIndex.map { case ((k, t), i) => (k, t, i.toLong) }
        .toDF("k", "pt", "pid")
      val intervals = ivs.zipWithIndex.map { case ((k, lo, span), i) =>
        (k, lo, lo + span, i.toLong) }.toDF("k", "lo", "hi", "iid")
      val got = RangeJoin.pointInInterval(points, "pt", intervals,
          "lo", "hi", Seq("k"), width)
        .select("pid", "iid").as[(Long, Long)].collect().toSet
      val want = (for {
        ((pk, pt), pi) <- ps.zipWithIndex
        ((ik, lo, span), ii) <- ivs.zipWithIndex
        if pk == ik && pt >= lo && pt <= lo + span
      } yield (pi.toLong, ii.toLong)).toSet
      got == want
    }, min = 10)
  }

  test("sequence packing tiles the stream: gapless, ordered, exact spans") {
    import graft.operators.{Packing, Sampling}
    import org.apache.spark.sql.functions.col
    import spark.implicits._
    val gen = Gen.zip(
      Gen.nonEmptyListOf(Gen.chooseNum(0L, 500L)).map(_.take(60)),
      Gen.oneOf(16L, 64L, 1000L))
    check(Prop.forAllNoShrink(gen) { case (ws, seqLen) =>
      val docs = ws.zipWithIndex.map { case (w, i) => (i.toLong, w) }
        .toDF("id", "w")
      val out = Packing.packSequences(docs, col("id"), col("w"), seqLen)
        .select("id", "start_seq", "offset", "n_seqs")
        .as[(Long, Long, Long, Long)].collect()
        .map(r => r._1 -> r).toMap
      // recompute expected positions from the same hash order
      val order = docs.withColumn("h", Sampling.fraction(col("id")))
        .orderBy("h", "id").select("id", "w").as[(Long, Long)].collect()
      var cum = 0L
      order.forall { case (id, w) =>
        val (_, s, off, n) = out(id)
        val ok = s == cum / seqLen && off == cum % seqLen &&
          n == (if (w == 0) 0L else (cum + w - 1) / seqLen - cum / seqLen + 1)
        cum += w
        ok
      }
    }, min = 10)
  }

  test("identity preserves count and order for random string values") {
    import spark.implicits._
    val strGen = Gen.nonEmptyListOf(Gen.alphaNumStr.map(_.take(8)))
    check(Prop.forAllNoShrink(strGen) { xs =>
      val b = 1346189040L
      val docs = xs.zipWithIndex.map { case (v, i) =>
        ((b + i) * 1000000000L, s"""{"v": "$v"}""") }
      val row = SeriesEngine.query(docs.toDF("ts", "doc"),
        SeriesQuery(86400000L * 10, Seq("/v"), Seq("identity"),
          names = Seq("vals"))).head()
      row.getSeq[String](1) == xs
    }, min = 20)
  }

  test("commit-log fold: random action sequences replay deterministically") {
    import graft.sources.CommitLog
    import graft.sources.CommitLog.{FileEntry, Manifest}
    val actionGen = Gen.oneOf("append", "replace")
    check(Prop.forAll(Gen.listOfN(30, Gen.zip(actionGen, Gen.choose(0, 3)))) {
      actions =>
        val dir = java.nio.file.Files.createTempDirectory("graft-plog")
        val log = new CommitLog(dir)
        log.init()
        actions.zipWithIndex.foreach { case ((kind, nf), i) =>
          val v = i + 2L
          val files = (0 until nf).map(j => FileEntry(s"f$v-$j.parquet", j + 1L))
          assert(log.tryCommit(Manifest(v, kind, files, seqHi = v, clean = kind == "replace")))
          log.checkpointMaybe(log.snapshot())
        }
        val viaCkpt = log.snapshot()
        // a fresh log object over the same dir (≈ another JVM) agrees
        val fresh = new CommitLog(dir).snapshot()
        // pure fold of the action list = the expected state
        val expect = actions.zipWithIndex.foldLeft(
          (Vector.empty[FileEntry], true, 0L)) {
          case ((fs, _, seq), ((kind, nf), i)) =>
            val v = i + 2L
            val files = (0 until nf).map(j => FileEntry(s"f$v-$j.parquet", j + 1L)).toVector
            if (kind == "append") (fs ++ files, false, math.max(seq, v))
            else (files, true, math.max(seq, v))
        }
        viaCkpt == fresh &&
          viaCkpt.files == expect._1 &&
          (actions.isEmpty || viaCkpt.clean == expect._2) &&
          viaCkpt.lastSeq == expect._3
    }, min = 30)
  }

  test("manifest pruning is SAFE: never drops a file intersecting the range") {
    import graft.sources.CommitLog.FileEntry
    // random file populations (statted, stats-free, empty) × random
    // query ranges: every row in [from, to) must live in a file the
    // prune keeps — correctness can tolerate over-scanning, never a
    // dropped in-range file
    val fileGen = for {
      lo <- Gen.chooseNum(-1000000L, 1000000L)
      w <- Gen.chooseNum(0L, 500000L)
      kind <- Gen.frequency(6 -> "stats", 1 -> "legacy", 1 -> "empty")
    } yield kind match {
      case "stats" => FileEntry("f", 1, lo, lo + w, w + 1)
      case "legacy" => FileEntry("f", 1) // unknown stats: always kept
      case "empty" => FileEntry("f", 1, 0, 0, 0)
    }
    val rangeGen = for {
      a <- Gen.option(Gen.chooseNum(-1500000L, 1500000L))
      b <- Gen.option(Gen.chooseNum(-1500000L, 1500000L))
    } yield (a, b)
    check(Prop.forAll(Gen.listOfN(40, fileGen), rangeGen) {
      case (files, (from, to)) =>
        files.forall { f =>
          val kept = f.mayOverlap(from, to)
          // a ts this file could contain that the query wants ⇒ kept.
          // For statted files the candidate set is [minTs, maxTs];
          // legacy files could contain anything.
          val couldMatter =
            if (!f.hasStats) true
            else if (f.rows == 0) false
            else from.getOrElse(Long.MinValue) <= f.maxTs &&
              f.minTs < to.getOrElse(Long.MaxValue)
          !couldMatter || kept
        }
    })
  }

  test("deterministic split partitions exactly and nests with uniform") {
    // pure-function check of the md5 coordinate: every id lands in
    // exactly one split, and a uniform sample at rate r is a subset
    // of any sample at rate >= r (no Spark needed: recompute the
    // hash the way the engine and the DuckDB oracle both do)
    def frac(id: Long): Double = {
      val md = java.security.MessageDigest.getInstance("MD5")
      val hex = md.digest(id.toString.getBytes("UTF-8"))
        .map("%02x".format(_)).mkString.take(15)
      java.lang.Long.parseLong(hex, 16) / 1152921504606846976.0
    }
    check(Prop.forAll(Gen.chooseNum(0L, Long.MaxValue / 2),
        Gen.choose(0.0, 1.0), Gen.choose(0.0, 1.0)) { (id, r1, r2) =>
      val f = frac(id)
      val lo = math.min(r1, r2); val hi = math.max(r1, r2)
      f >= 0.0 && f < 1.0 &&
        (!(f < lo) || f < hi) && // nesting: kept at lo ⇒ kept at hi
        Seq(0.8, 0.1, 0.1).scanLeft(0.0)(_ + _).sliding(2)
          .count { case Seq(a, b) => f >= a && f < b } == 1 // exactly one split
    })
  }

  test("funnel reach matches the closed-form earliest-qualifying chain") {
    import graft.operators.Funnel
    import org.apache.spark.sql.functions.col
    import spark.implicits._
    val steps = Seq("v", "c", "p")
    val evGen = Gen.nonEmptyListOf(Gen.zip(
      Gen.chooseNum(0L, 2L), Gen.chooseNum(0L, 40L),
      Gen.oneOf("v", "c", "p", "x"))).map(_.take(50))
    check(Prop.forAllNoShrink(evGen) { es =>
      val got = Funnel.stepReach(es.toDF("u", "ts", "et"),
          col("u"), col("ts"), col("et"), steps)
        .collect().map(r => r.getLong(0) ->
          (r.getInt(1), Option(r.get(2)), Option(r.get(3)))).toMap
      es.groupBy(_._1).forall { case (u, evs) =>
        // closed form: f_i = min ts of a step-i event at-or-after f_(i-1)
        val fs = steps.scanLeft(Option(Long.MinValue)) { (prev, s) =>
          prev.flatMap(p => evs.collect {
            case (_, t, `s`) if t >= p => t }.minOption)
        }.tail
        val depth = fs.takeWhile(_.isDefined).length
        val (gd, gf, gc) = got(u)
        gd == depth && gf == fs.head &&
          gc == (if (depth == 3) Some(fs(2).get - fs(0).get) else None)
      }
    }, min = 30)
  }

  test("export shards: recomputed md5 ranks reproduce shard and position") {
    import graft.operators.Export
    import org.apache.spark.sql.functions.col
    import spark.implicits._
    def h60(id: Long): Long = {
      val md = java.security.MessageDigest.getInstance("MD5")
      val hex = md.digest(id.toString.getBytes("UTF-8"))
        .map("%02x".format(_)).mkString.take(15)
      java.lang.Long.parseLong(hex, 16)
    }
    val gen = Gen.zip(
      Gen.nonEmptyListOf(Gen.chooseNum(0L, 100000L)).map(_.distinct.take(40)),
      Gen.oneOf(1, 3, 8))
    check(Prop.forAllNoShrink(gen) { case (ids, n) =>
      val got = Export.shards(ids.toDF("doc_id"), col("doc_id"), n)
        .collect().map(r => r.getLong(0) -> (r.getInt(1), r.getInt(2))).toMap
      val want = ids.map(i => i -> h60(i)).groupBy(_._2 % n).flatMap {
        case (shard, members) =>
          members.sortBy { case (i, h) => (h, i) }.zipWithIndex.map {
            case ((i, _), pos) => i -> (shard.toInt, pos) }
      }
      got == want
    }, min = 20)
  }

  test("triangles match brute-force enumeration on random graphs") {
    import graft.operators.Graphs
    import org.apache.spark.sql.functions.col
    import spark.implicits._
    val edgeGen = Gen.nonEmptyListOf(
      Gen.zip(Gen.chooseNum(0, 9), Gen.chooseNum(0, 9))).map(_.take(30))
    check(Prop.forAllNoShrink(edgeGen) { raw =>
      val und = raw.collect { case (a, b) if a != b =>
        (math.min(a, b).toString, math.max(a, b).toString) }.toSet
      val got = Graphs.triangles(
          raw.map { case (a, b) => (a.toString, b.toString) }.toDF("s", "d"),
          col("s"), col("d"))
        .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
      val nodes = und.flatMap(e => Seq(e._1, e._2))
      val triCount = nodes.map { v =>
        val nbrs = und.collect { case (`v`, b) => b
          case (a, `v`) => a }
        v -> nbrs.toSeq.combinations(2).count { case Seq(x, y) =>
          und.contains((Seq(x, y).min, Seq(x, y).max)) }
      }.toMap
      val degree = nodes.map(v => v -> und.count(e => e._1 == v || e._2 == v)).toMap
      und.isEmpty && got.isEmpty ||
        nodes.forall(v => got.get(v).contains((degree(v).toLong, triCount(v).toLong)))
    }, min = 25)
  }

  test("changepoint cusum equals the closed form; peak flag is argmax") {
    import graft.operators.SeriesStats
    import org.apache.spark.sql.functions.col
    import spark.implicits._
    val valsGen = Gen.nonEmptyListOf(Gen.chooseNum(-1000L, 1000L)).map(_.take(40))
    check(Prop.forAllNoShrink(valsGen) { xs =>
      val b = xs.zipWithIndex.map { case (v, i) => (i * 1000L, v) }
        .toDF("bucket_ms", "v")
      val got = SeriesStats.changepoint(b, col("v")).orderBy("bucket_ms")
        .collect().map(r => (r.getDouble(2), r.getBoolean(3)))
      val n = xs.length.toLong
      val sv = xs.sum * 1000000L
      val cums = xs.scanLeft(0L)(_ + _ * 1000000L).tail
      val s = cums.zipWithIndex.map { case (c, i) =>
        (BigInt(c) * n - BigInt(sv) * (i + 1)) }
      val want = s.map(x =>
        BigDecimal(x).toDouble / (n * 1000000L).toDouble)
      val peakIdx = s.map(_.abs).zipWithIndex.maxBy { case (a, i) => (a, -i) }._2
      val cusumOk = got.map(_._1).toSeq == want.map(w =>
        BigDecimal(w).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)
      cusumOk &&
        got.zipWithIndex.forall { case ((_, flag), i) => flag == (i == peakIdx) }
    }, min = 25)
  }

  test("temperature budgets: integer plan invariants on random supplies") {
    import graft.operators.Sampling
    import org.apache.spark.sql.functions.col
    import spark.implicits._
    val gen = Gen.zip(
      Gen.nonEmptyListOf(Gen.zip(Gen.alphaLowerStr.map(_.take(3) + "g"),
        Gen.chooseNum(0L, 1000000L))).map(_.take(8)),
      Gen.chooseNum(0L, 10000000L))
    check(Prop.forAllNoShrink(gen) { case (rows, total) =>
      val out = Sampling.temperatureBudgets(rows.toDF("src", "w"),
          col("src"), col("w"), total)
        .collect().map(r => (r.getLong(1), r.getLong(2), r.getLong(3),
          r.getLong(4)))
      out.forall { case (avail, target, budget, short) =>
        budget <= avail && budget <= target && short == target - budget
      } && out.map(_._2).sum <= total // floors never over-allocate
    }, min = 25)
  }

  test("cross-corpus pairs: exact precision, brute-force subset") {
    import graft.operators.Similarity
    import spark.implicits._
    val vecGen = Gen.listOfN(3, Gen.chooseNum(-5, 5).map(_.toFloat))
    val gen = Gen.zip(Gen.listOfN(6, vecGen), Gen.listOfN(6, vecGen))
    def cos(a: Seq[Float], b: Seq[Float]): Option[Double] = {
      def d(x: Seq[Float], y: Seq[Float]) =
        x.zip(y).foldLeft(0.0) { case (acc, (p, q)) =>
          acc + p.toDouble * q.toDouble }
      val (na, nb) = (math.sqrt(d(a, a)), math.sqrt(d(b, b)))
      if (na > 0 && nb > 0) Some(d(a, b) / (na * nb)) else None
    }
    check(Prop.forAllNoShrink(gen) { case (ls, rs) =>
      val l = ls.zipWithIndex.map { case (v, i) => (i.toLong, v) }
        .toDF("vec_id", "embedding")
      val r = rs.zipWithIndex.map { case (v, i) => (100L + i, v) }
        .toDF("vec_id", "embedding")
      val got = Similarity.crossCosinePairs(l, r, threshold = 0.7,
          tables = 6, planes = 2)
        .collect().map(p => (p.getLong(0), p.getLong(1), p.getDouble(2)))
      val brute = (for {
        (a, i) <- ls.zipWithIndex; (b, j) <- rs.zipWithIndex
        c <- cos(a, b) if c >= 0.7
      } yield (i.toLong, 100L + j) -> c).toMap
      got.forall { case (i, j, sim) =>
        brute.get((i, j)).contains(sim) } // precision: sim exact, ≥ t
    }, min = 25)
  }

  test("bounded LSH buckets partition exactly like the in-memory reference") {
    // The maxBucket refinement must be reproducible by ANY engine
    // from the spec alone (the DuckDB oracles reimplement it): this
    // re-derives buckets — md5-sign hyperplanes, planes-bit prefix,
    // integer ceil-div bits ladder, key deepening — in plain Scala
    // and requires the refined pair set to match pair-for-pair, sims
    // exact. maxBucket is drawn small so refinement genuinely fires.
    import graft.operators.Similarity
    import spark.implicits._
    val dims = 3
    def signs(t: Int, p: Int): Array[Double] = {
      val md = java.security.MessageDigest.getInstance("MD5")
      Array.tabulate(dims) { i =>
        if (graft.functions.SimHash60.hash60(md,
            s"$t:$p:$i".getBytes("UTF-8")) % 2 == 1) 1.0 else -1.0
      }
    }
    def d(x: Seq[Float], y: Seq[Double]): Double =
      x.zip(y).foldLeft(0.0) { case (acc, (p, q)) => acc + p.toDouble * q }
    def dp(x: Seq[Float], y: Seq[Float]): Double =
      x.zip(y).foldLeft(0.0) { case (acc, (p, q)) =>
        acc + p.toDouble * q.toDouble }
    val tables = 3
    val planes = 2
    val vecGen = Gen.listOfN(dims, Gen.chooseNum(-5, 5).map(_.toFloat))
    val gen = Gen.zip(Gen.listOfN(10, vecGen), Gen.oneOf(1, 2, 3))
    check(Prop.forAllNoShrink(gen) { case (vs, maxBucket) =>
      val rows = vs.zipWithIndex.map { case (v, i) => (i.toLong, v) }
      val nz = rows.filter { case (_, v) => dp(v, v) > 0 }
      // reference buckets: (table, prefix) → deepened key
      val exploded = for { (id, v) <- nz; t <- 0 until tables } yield {
        val sk = (0 until Similarity.RefineBits).map(p =>
          if (d(v, signs(t, p).toSeq) >= 0) '1' else '0').mkString
        (id, v, t, sk)
      }
      val counts = exploded.groupBy { case (_, _, t, sk) =>
        (t, sk.take(planes)) }.map { case (k, g) => (k, g.size) }
      def bits(cnt: Int): Int = {
        val m = (cnt + maxBucket - 1) / maxBucket
        (0 to Similarity.RefineBits - planes)
          .find(b => m <= (1L << b)).getOrElse(Similarity.RefineBits - planes)
      }
      val keyed = exploded.map { case (id, v, t, sk) =>
        val base = (t, sk.take(planes))
        (id, v, (base, sk.slice(planes, planes + bits(counts(base)))))
      }
      val expected = (for {
        (i1, v1, k1) <- keyed; (i2, v2, k2) <- keyed
        if k1 == k2 && i1 < i2
        c = dp(v1, v2) / (math.sqrt(dp(v1, v1)) * math.sqrt(dp(v2, v2)))
        if c >= 0.5
      } yield (i1, i2) -> c).toMap
      val got = Similarity.cosineNearDupPairs(
          rows.toDF("vec_id", "embedding"), threshold = 0.5,
          tables = tables, planes = planes, maxBucket = maxBucket)
        .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2))
        .toMap
      got == expected
    }, min = 12)
  }

  test("unigram NLL matches an in-memory model with vocab cut and OOV floor") {
    import graft.operators.CorpusStats
    import org.apache.spark.sql.functions.col
    import spark.implicits._
    val wordGen = Gen.oneOf("a", "b", "c", "d", "e", "f")
    val docGen = Gen.nonEmptyListOf(
      Gen.nonEmptyListOf(wordGen).map(_.take(12).mkString(" "))).map(_.take(15))
    val kGen = Gen.oneOf(1, 3, 100)
    check(Prop.forAllNoShrink(docGen, kGen) { (docs, vocabK) =>
      val df = docs.zipWithIndex.map { case (t, i) => (i.toLong, t) }
        .toDF("doc_id", "text")
      val got = CorpusStats.unigramNll(df, col("doc_id"), col("text"), vocabK)
        .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
      val toks = docs.map(_.split(" ", -1).toSeq)
      val counts = toks.flatten.groupBy(identity).view.mapValues(_.size.toLong)
      val total = toks.map(_.length).sum.toDouble
      val vocab = counts.toSeq.sortBy { case (w, c) => (-c, w) }.take(vocabK).toMap
      def m(c: Long) = Math.round(-Math.log(c / total) * 1e6)
      toks.zipWithIndex.forall { case (ws, i) =>
        got(i.toLong) == ((ws.length.toLong,
          ws.map(w => m(vocab.getOrElse(w, 1L))).sum))
      }
    }, min = 20)
  }

  test("rrf fusion equals brute-force competition-rank fusion") {
    import graft.operators.CorpusStats
    import org.apache.spark.sql.functions.col
    import spark.implicits._
    // tiny value range → heavy ties; options → null signals
    val rowGen = Gen.zip(Gen.option(Gen.chooseNum(0L, 6L)),
      Gen.option(Gen.chooseNum(0L, 6L)))
    val docsGen = Gen.nonEmptyListOf(rowGen).map(_.take(20))
    check(Prop.forAllNoShrink(docsGen) { rows =>
      val df = rows.zipWithIndex.map { case ((a, b), i) => (i.toLong, a, b) }
        .toDF("doc_id", "s1", "s2")
      val got = CorpusStats.rrfFuse(df, col("doc_id"),
          Seq("s1" -> col("s1"), "s2" -> col("s2")), rrfK = 60)
        .collect().map(r => r.getLong(0) -> r.getLong(3)).toMap
      def ranks(vs: Seq[Option[Long]]): Seq[Option[Long]] = {
        val present = vs.flatten
        vs.map(_.map(v => present.count(_ > v).toLong + 1))
      }
      val r1 = ranks(rows.map(_._1))
      val r2 = ranks(rows.map(_._2))
      rows.indices.forall { i =>
        got(i.toLong) ==
          r1(i).map(r => 1000000000L / (60 + r)).getOrElse(0L) +
          r2(i).map(r => 1000000000L / (60 + r)).getOrElse(0L)
      }
    }, min = 20)
  }

  test("postings df and capped lists match brute force on random docs") {
    import graft.operators.CorpusStats
    import org.apache.spark.sql.functions.col
    import spark.implicits._
    val wordGen = Gen.oneOf("a", "b", "c", "d")
    val docGen = Gen.nonEmptyListOf(wordGen).map(_.take(8).mkString(" "))
    val docsGen = Gen.nonEmptyListOf(docGen).map(_.take(12))
    check(Prop.forAllNoShrink(docsGen, Gen.choose(1, 4), Gen.choose(1L, 3L)) {
      (docs, cap, minDf) =>
        val df = docs.zipWithIndex.map { case (t, i) => (i.toLong, t) }
          .toDF("doc_id", "text")
        val got = CorpusStats.postings(df, col("doc_id"), col("text"),
            maxPostings = cap, minDf = minDf)
          .collect().map(r => r.getString(0) ->
            (r.getLong(1), r.getSeq[Long](2).toList)).toMap
        val inverted = docs.zipWithIndex
          .flatMap { case (t, i) => t.split(" ", -1).distinct.map(_ -> i.toLong) }
          .groupBy(_._1).view.mapValues(_.map(_._2).sorted).toMap
        val want = inverted.collect {
          case (w, ds) if ds.length >= minDf =>
            w -> ((ds.length.toLong, ds.take(cap).toList))
        }
        got == want
    }, min = 20)
  }

  test("naive Bayes argmin and margin match an in-memory model") {
    import graft.operators.CorpusStats
    import org.apache.spark.sql.functions.col
    import spark.implicits._
    val wordGen = Gen.oneOf("u", "v", "w", "x")
    val docGen = Gen.nonEmptyListOf(wordGen).map(_.take(6).mkString(" "))
    val labGen = Gen.option(Gen.oneOf("a", "b", "c"))
    val rowsGen = Gen.nonEmptyListOf(Gen.zip(docGen, labGen)).map(_.take(10))
    val kGen = Gen.oneOf(2, 100)
    check(Prop.forAllNoShrink(rowsGen, docGen, docGen, kGen) {
      (rows0, d1, d2, vocabK) =>
        // force two classes so the model is always estimable
        val rows = (d1, Some("a")) :: (d2, Some("b")) :: rows0
        val df = rows.zipWithIndex.map { case ((t, l), i) =>
          (i.toLong, t, l.orNull) }.toDF("doc_id", "text", "lab")
        val got = CorpusStats.naiveBayesClassify(df, col("doc_id"),
            col("text"), col("lab"), vocabK)
          .collect().map(r => r.getLong(0) ->
            ((r.getString(2), r.getLong(3), r.getLong(4)))).toMap
        // in-memory replica of the model math
        val labeled = rows.collect { case (t, Some(l)) => (t, l) }
        val toks = labeled.map { case (t, l) => (t.split(" ", -1).toSeq, l) }
        val cw = toks.flatMap { case (ws, l) => ws.map((l, _)) }
          .groupBy(identity).view.mapValues(_.size.toLong).toMap
        val wc = cw.groupBy(_._1._2).view.mapValues(_.values.sum).toMap
        val vocab = wc.toSeq.sortBy { case (w, c) => (-c, w) }.take(vocabK)
          .map(_._1).toSet
        val v = vocab.size
        val nTok = toks.groupBy(_._2).view.mapValues(_.map(_._1.length).sum.toLong)
        val nDoc = labeled.groupBy(_._2).view.mapValues(_.size.toLong).toMap
        val classes = nDoc.keys.toSeq.sorted
        def micro(num: Double, den: Double) =
          Math.round(-Math.log(num / den) * 1e6)
        def score(text: String, c: String): Long = {
          val den = (nTok(c) + v + 1).toDouble
          val prior = micro(nDoc(c).toDouble, nDoc.values.sum.toDouble)
          prior + text.split(" ", -1).map { w =>
            if (vocab(w)) micro(cw.getOrElse((c, w), 0L) + 1.0, den)
            else micro(1.0, den)
          }.sum
        }
        rows.zipWithIndex.forall { case ((t, _), i) =>
          val scored = classes.map(c => (score(t, c), c)).sorted
          got(i.toLong) == ((scored.head._2, scored.head._1,
            scored(1)._1 - scored.head._1))
        }
    }, min = 15)
  }

  test("semantic decontamination max-sim equals brute force") {
    import graft.operators.Similarity
    val compGen = Gen.chooseNum(-3, 3).map(_.toFloat)
    val vecGen = Gen.listOfN(3, compGen).map(_.toSeq)
    val corpusGen = Gen.nonEmptyListOf(vecGen).map(_.take(8))
    // the operator requires >= 1 nonzero eval vector (all-zero eval
    // sets fail loudly) — pin one into every generated set
    val evalGen = Gen.nonEmptyListOf(vecGen)
      .map(es => es.take(3) :+ Seq(1f, 1f, 0f))
    check(Prop.forAllNoShrink(corpusGen, evalGen) { (cs, es) =>
      import spark.implicits._
      val corpus = cs.zipWithIndex.map { case (v, i) => (i.toLong, v) }
        .toDF("vec_id", "embedding")
      val evalSet = es.zipWithIndex.map { case (v, i) => (100L + i, v) }
        .toDF("vec_id", "embedding")
      val got = Similarity.decontaminateSemantic(corpus, evalSet, 0.5)
        .collect().map(r => r.getLong(0) ->
          ((Option(r.get(1)).map(_.asInstanceOf[Long]),
            Option(r.get(2)).map(_.asInstanceOf[Double]),
            r.getBoolean(3)))).toMap
      def dot(a: Seq[Float], b: Seq[Float]): Double =
        a.zip(b).foldLeft(0.0) { case (s, (x, y)) =>
          s + x.toDouble * y.toDouble }
      def nrm(a: Seq[Float]): Double = math.sqrt(dot(a, a))
      val evalOk = es.zipWithIndex.map { case (v, i) => (100L + i, v, nrm(v)) }
        .filter(_._3 > 0)
      cs.zipWithIndex.forall { case (v, i) =>
        val vn = nrm(v)
        val want =
          if (!(vn > 0) || evalOk.isEmpty) (None, None, false)
          else {
            // max by (sim, -eval_id): highest sim, smallest id on ties
            val (eid, _, sim) = evalOk
              .map { case (id, ev, en) => (id, ev, dot(v, ev) / (vn * en)) }
              .maxBy { case (id, _, s) => (s, -id) }
            (Some(eid), Some(sim), sim >= 0.5)
          }
        got(i.toLong) == want
      }
    }, min = 20)
  }
}
