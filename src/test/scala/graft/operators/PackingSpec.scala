package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class PackingSpec extends SparkSpec {
  import spark.implicits._

  private lazy val docs = Seq(
    (1L, 100L), (2L, 2048L), (3L, 0L), (4L, 5000L), (5L, 1L), (6L, 2047L))
    .toDF("id", "w")

  private def packed = Packing.packSequences(docs, $"id", $"w", seqLen = 2048L)
    .select("id", "start_seq", "offset", "n_seqs")
    .as[(Long, Long, Long, Long)].collect().map(r => r._1 -> r).toMap

  test("stream positions are the prefix sums in (hash, id) order") {
    // recompute the expected layout with the same hash coordinate
    val order = docs.withColumn("h", Sampling.fraction($"id"))
      .orderBy("h", "id").select("id", "w").as[(Long, Long)].collect()
    var cum = 0L
    order.foreach { case (id, w) =>
      val (_, start, off, n) = packed(id)
      assert(start == cum / 2048 && off == cum % 2048, s"doc $id")
      val expN = if (w == 0) 0L else (cum + w - 1) / 2048 - cum / 2048 + 1
      assert(n == expN, s"doc $id spans")
      cum += w
    }
  }

  test("offsets stay in [0, seqLen); empty docs span zero windows") {
    packed.values.foreach { case (id, _, off, n) =>
      assert(off >= 0 && off < 2048, s"doc $id")
      assert(n >= 0)
    }
    assert(packed(3L)._4 == 0)
  }

  test("windows are gap-free: total span covers exactly sum(w) units") {
    val total = docs.agg(sum($"w")).as[Long].head()
    val lastNeeded = (total + 2047) / 2048
    val maxEnd = packed.values.map { case (_, s, _, n) => s + math.max(n, 1) }.max
    assert(maxEnd == lastNeeded)
  }

  test("length-bucketed batches: band purity, slot layout, padding math") {
    val rows = (1L to 50L).map(i => (i, (i * 37) % 500))
      .toDF("doc_id", "len")
    val out = Packing.lengthBucketedBatches(rows, $"doc_id", $"len",
        bucketWidth = 100L, batchSize = 4)
      .select($"doc_id", $"length", $"band", $"batch", $"pos",
        $"padded_to", $"waste")
      .as[(Long, Long, Long, Long, Long, Long, Long)].collect()
    assert(out.length == 50)
    out.foreach { case (_, len, band, _, pos, padded, waste) =>
      assert(band == len / 100)          // band is the length bucket
      assert(pos >= 0 && pos < 4)        // slot within batch
      assert(padded >= len && waste == padded - len)
    }
    // batches are ≤ 4 rows, slots are exactly 0..n-1, padded = max len
    out.groupBy(r => (r._3, r._4)).foreach { case (_, b) =>
      assert(b.length <= 4)
      assert(b.map(_._5).sorted.toSeq == (0L until b.length).toSeq)
      assert(b.map(_._6).distinct.length == 1)
      assert(b.head._6 == b.map(_._2).max)
    }
    // full batches never pad more than bucketWidth − 1
    out.groupBy(r => (r._3, r._4)).filter(_._2.length == 4)
      .foreach { case (_, b) => b.foreach(r => assert(r._7 < 100)) }
    // deterministic: a re-run reproduces the identical layout
    val again = Packing.lengthBucketedBatches(rows, $"doc_id", $"len",
        bucketWidth = 100L, batchSize = 4)
      .select($"doc_id", $"length", $"band", $"batch", $"pos",
        $"padded_to", $"waste")
      .as[(Long, Long, Long, Long, Long, Long, Long)].collect()
    assert(out.sortBy(_._1).toSeq == again.sortBy(_._1).toSeq)
  }

  test("shardAssignments: each shard sees exactly the docs intersecting its windows") {
    val rng = new scala.util.Random(11)
    val rows = (0 until 120).map(i => (i.toLong, rng.nextInt(50).toLong))
    val df = rows.toDF("id", "w")
    val packed = Packing.packSequences(df, $"id", $"w", seqLen = 16L)
      .localCheckpoint()
    val wps = 3L
    val asg = Packing.shardAssignments(packed, wps)
      .select($"shard", $"id").as[(Long, Long)].collect().toSet
    val p = packed.select($"id", $"start_seq", $"n_seqs")
      .as[(Long, Long, Long)].collect()
    val expected = p.filter(_._3 > 0).flatMap { case (id, s0, n) =>
      (s0 / wps to (s0 + n - 1) / wps).map(sh => (sh, id))
    }.toSet
    assert(asg == expected)
    // per shard: assigned docs == docs whose span intersects the range
    val totalWindows = p.map { case (_, s0, n) => s0 + n }.max
    (0L until (totalWindows + wps - 1) / wps).foreach { sh =>
      val docs = p.filter { case (_, s0, n) =>
        n > 0 && s0 < (sh + 1) * wps && s0 + n > sh * wps }.map(_._1).toSet
      assert(asg.filter(_._1 == sh).map(_._2) == docs, s"shard $sh")
    }
    // empty docs appear nowhere
    assert(!asg.exists { case (_, id) => rows(id.toInt)._2 == 0L })
  }

  test("packSequencesBy equals packSequences run per group") {
    val rng = new scala.util.Random(3)
    val rows = (0 until 150).map(i =>
      (i.toLong, "g" + (i % 3), rng.nextInt(30).toLong))
    val df = rows.toDF("id", "grp", "w")
    val by = Packing.packSequencesBy(df, $"grp", $"id", $"w", seqLen = 16L)
      .select($"id", $"start_seq", $"offset", $"n_seqs")
      .as[(Long, Long, Long, Long)].collect().toSet
    val perGroup = (0 until 3).flatMap { g =>
      Packing.packSequences(df.filter($"grp" === s"g$g"), $"id", $"w", 16L)
        .select($"id", $"start_seq", $"offset", $"n_seqs")
        .as[(Long, Long, Long, Long)].collect()
    }.toSet
    assert(by == perGroup)
  }

  test("materializeWindows: windows concatenate back to the exact token stream") {
    val rng = new scala.util.Random(5)
    val rows = (0 until 80).map(i =>
      (i.toLong, (0 until rng.nextInt(40)).map(j => i * 1000L + j)))
    val df = rows.toDF("id", "toks")
    val L = 16L
    val packed = Packing.packSequences(df, $"id", size($"toks").cast("long"), L)
      .localCheckpoint()
    val wins = Packing.materializeWindows(packed, $"toks", L)
      .select($"seq", $"token_ids").as[(Long, Seq[Long])]
      .collect().sortBy(_._1)
    // reference stream: docs in (hash60(id), id) order, concatenated
    val order = packed.select($"id", $"start_seq", $"offset")
      .as[(Long, Long, Long)].collect()
      .sortBy { case (_, s0, o) => (s0, o) }.map(_._1)
    val stream = order.flatMap(id => rows(id.toInt)._2)
    assert(wins.flatMap(_._2).toSeq == stream.toSeq)
    // every window is full except possibly the last; seqs contiguous
    assert(wins.map(_._1).toSeq == wins.indices.map(_.toLong))
    wins.dropRight(1).foreach { case (_, t) => assert(t.size == L) }
    assert(wins.last._2.size == (stream.size - 1) % L + 1)
  }

  test("doc_spans tile each window exactly and name the right docs") {
    val rng = new scala.util.Random(11)
    val rows = (0 until 60).map(i =>
      (i.toLong, (0 until (1 + rng.nextInt(30))).map(j => i * 1000L + j)))
    val df = rows.toDF("id", "toks")
    val L = 16L
    val packed = Packing.packSequences(df, $"id", size($"toks").cast("long"), L)
      .localCheckpoint()
    val wins = Packing.materializeWindows(packed, $"id", $"toks", L)
      .select($"seq", $"token_ids", $"doc_spans")
      .as[(Long, Seq[Long], Seq[(Long, Long, Long)])]
      .collect().sortBy(_._1)
    wins.foreach { case (seq, toks, spans) =>
      // spans tile the window: starts chain 0, l0, l0+l1, …, Σlen = n
      val starts = spans.scanLeft(0L)(_ + _._3).dropRight(1)
      assert(spans.map(_._2) == starts, s"window $seq spans don't tile")
      assert(spans.map(_._3).sum == toks.size)
      // every span's tokens really belong to its doc (synthetic ids
      // encode the doc: tok / 1000 == doc_id)
      spans.foreach { case (did, st, len) =>
        toks.slice(st.toInt, (st + len).toInt)
          .foreach(tk => assert(tk / 1000L == did,
            s"window $seq span ($did,$st,$len) holds foreign token $tk"))
      }
    }
    // spans-free overload returns the identical token stream
    val plain = Packing.materializeWindows(packed, $"toks", L)
      .select($"seq", $"token_ids").as[(Long, Seq[Long])]
      .collect().sortBy(_._1)
    assert(plain.map(_._2).toSeq == wins.map(_._2).toSeq)
  }

  test("windowsTakedown drops exactly the span-intersecting windows, " +
      "survivors byte-identical") {
    val rng = new scala.util.Random(23)
    val rows = (0 until 60).map(i =>
      (i.toLong, (0 until (1 + rng.nextInt(30))).map(j => i * 1000L + j)))
    val df = rows.toDF("id", "toks")
    val L = 16L
    val packed = Packing.packSequences(df, $"id", size($"toks").cast("long"), L)
      .localCheckpoint()
    val wins = Packing.materializeWindows(packed, $"id", $"toks", L)
      .localCheckpoint()
    val before = wins
      .select($"seq", $"token_ids", $"doc_spans", $"n_tokens")
      .as[(Long, Seq[Long], Seq[(Long, Long, Long)], Long)]
      .collect().sortBy(_._1)
    val delIds = Seq(3L, 17L, 41L)
    val after = Packing.windowsTakedown(wins, delIds.toDF("doc_id"),
        $"doc_id")
      .select($"seq", $"token_ids", $"doc_spans", $"n_tokens")
      .as[(Long, Seq[Long], Seq[(Long, Long, Long)], Long)]
      .collect().sortBy(_._1)
    // expected drop set: every window whose spans name a deleted doc
    val expectDropped = before
      .filter(_._3.exists(s => delIds.contains(s._1))).map(_._1).toSet
    assert(expectDropped.nonEmpty, "fixture must actually intersect")
    assert(after.map(_._1).toSet == before.map(_._1).toSet -- expectDropped)
    // survivors are BYTE-IDENTICAL rows at their original coordinates
    val byId = before.map(w => w._1 -> w).toMap
    after.foreach(w => assert(byId(w._1) == w, s"window ${w._1} mutated"))
    // no surviving window carries a deleted doc's tokens
    after.foreach(w => assert(!w._3.exists(s => delIds.contains(s._1))))
    // an empty takedown batch is a no-op
    assert(Packing.windowsTakedown(wins,
      Seq.empty[Long].toDF("doc_id"), $"doc_id").count() == before.length)
    // spans-free windows cannot be taken down: fails loudly
    val bare = Packing.materializeWindows(packed, $"toks", L)
    intercept[IllegalArgumentException] {
      Packing.windowsTakedown(bare, delIds.toDF("doc_id"), $"doc_id")
    }
  }

  test("packWholeDocs: no doc splits, fit respected, waste accounted, " +
      "oversize/empty flagged, takedown composes") {
    import org.apache.spark.sql.functions.{col, transform => ftransform}
    val L = 10L
    // lengths spanning bands k=1..5, an oversize doc, an empty doc
    val docs = (1L to 40L).map { i =>
      val len = i match {
        case 1L => 0L    // empty: no window
        case 2L => 17L   // oversize: > seqLen, must flag
        case n => 1L + (n % 9) // 1..9 → bands 10..1
      }
      (i, len)
    }.toDF("doc_id", "len0")
    val placed = Packing.packWholeDocs(docs, $"doc_id", $"len0", L)
      .localCheckpoint()
    val rows = placed.select($"doc_id", $"len", $"band_k", $"seq", $"pos",
        $"oversize")
      .collect().map(r => (r.getLong(0), r.getLong(1),
        if (r.isNullAt(2)) None else Some(r.getLong(2)),
        if (r.isNullAt(3)) None else Some(r.getLong(3)),
        if (r.isNullAt(4)) None else Some(r.getLong(4)),
        r.getBoolean(5)))
    val byId = rows.map(r => r._1 -> r).toMap
    assert(byId(1L)._4.isEmpty && !byId(1L)._6, "empty doc: no window")
    assert(byId(2L)._4.isEmpty && byId(2L)._6, "oversize flagged, unplaced")
    val placedRows = rows.filter(_._4.isDefined)
    assert(placedRows.length == 38)
    // every placed doc in EXACTLY one window; windows respect capacity
    val byWin = placedRows.groupBy(_._4.get)
    byWin.foreach { case (w, ds) =>
      assert(ds.map(_._2).sum <= L, s"window $w overflows")
      // slots are 0..n-1 within the window
      assert(ds.map(_._5.get).sorted.toSeq == (0L until ds.length).toSeq)
      // one band per window (harmonic contract)
      assert(ds.map(_._3.get).distinct.length == 1)
      // a full band-k window holds exactly k docs
      val k = ds.head._3.get
      assert(ds.length <= k)
    }
    // band law: k = L div len
    placedRows.foreach(r => assert(r._3.get == L / r._2))
    // waste bound: every FULL window of band k wastes < L/(k+1)·k? —
    // pin the exact harmonic slack: full window slack = L - Σlen and
    // each len > L/(k+1) ⟹ slack < L - k·L/(k+1) + k = L/(k+1) + k
    // (integer lengths); just assert total waste is accounted > 0
    val waste = byWin.map { case (_, ds) => L - ds.map(_._2).sum }.sum
    assert(waste >= 0)
    // determinism: re-run bit-equal
    val again = Packing.packWholeDocs(docs, $"doc_id", $"len0", L)
      .select($"doc_id", $"seq", $"pos").collect().map(_.toSeq).toSet
    assert(placed.select($"doc_id", $"seq", $"pos")
      .collect().map(_.toSeq).toSet == again)
    // materialization: same window schema, each doc's tokens intact
    // in exactly one window; composes with windowsTakedown
    val toked = placed.withColumn("toks",
      ftransform(org.apache.spark.sql.functions.sequence(
          org.apache.spark.sql.functions.lit(1), col("len")),
        x => col("doc_id") * 100L + x.cast("long")))
    val wins = Packing.materializeWholeDocWindows(toked, $"doc_id",
      $"toks", L).localCheckpoint()
    val spans = wins.select($"seq", $"doc_spans", $"n_tokens")
      .as[(Long, Seq[(Long, Long, Long)], Long)].collect()
    // every placed doc appears in exactly ONE window's spans, whole
    val spanDocs = spans.flatMap(w => w._2.map(s => (s._1, w._1, s._3)))
    assert(spanDocs.groupBy(_._1).forall(_._2.length == 1),
      "a doc must appear in exactly one window")
    spanDocs.foreach { case (d, _, slen) =>
      assert(slen == byId(d)._2, s"doc $d split: span len $slen") }
    assert(spans.forall(w => w._3 <= L))
    val td = Packing.windowsTakedown(wins, Seq(5L).toDF("doc_id"),
      $"doc_id")
    val victim = spanDocs.find(_._1 == 5L).get._2
    assert(td.select($"seq").as[Long].collect().toSet ==
      spans.map(_._1).toSet - victim)
  }
}
