package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class ExportSpec extends SparkSpec {
  import spark.implicits._

  private val docs = (0L until 200L).map(i => (i, s"doc $i")).toDF("doc_id", "text")

  test("shards partition the corpus: disjoint, exhaustive, stable") {
    val a = Export.shards(docs, $"doc_id", n = 4)
      .as[(Long, Int, Int)].collect().sortBy(_._1)
    assert(a.length == 200 && a.map(_._1).distinct.length == 200)
    assert(a.forall(r => r._2 >= 0 && r._2 < 4))
    // positions are 0..size-1 within each shard, no gaps
    a.groupBy(_._2).foreach { case (_, rows) =>
      assert(rows.map(_._3).sorted.toSeq == (0 until rows.length))
    }
    // determinism: a re-run over a different partitioning agrees exactly
    val b = Export.shards(docs.repartition(7), $"doc_id", n = 4)
      .as[(Long, Int, Int)].collect().sortBy(_._1)
    assert(a.toSeq == b.toSeq)
  }

  test("rangedShards: non-overlapping key ranges, ties stay together") {
    // skewed keys incl. a heavy tie group
    val rows = ((1L to 60L).map(i => (i, i % 7)) ++
      (61L to 100L).map(i => (i, 50L))).toDF("doc_id", "k")
    val asg = Export.rangedShards(rows, col("doc_id"), col("k"), n = 4)
      .as[(Long, Long, Int)].collect()
    assert(asg.length == 100 && asg.map(_._1).distinct.length == 100)
    // same key -> same shard
    asg.groupBy(_._2).foreach { case (_, g) =>
      assert(g.map(_._3).distinct.length == 1)
    }
    // shard key ranges are ordered and non-overlapping
    val stats = Export.rangedShardStats(rows, col("k"), n = 4)
      .orderBy("shard").collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    stats.sliding(2).foreach {
      case Array((_, _, _, hi), (_, _, lo, _)) => assert(hi < lo)
      case _ =>
    }
    // stats account for every row
    assert(stats.map(_._2).sum == 100L)
    // assignment and stats agree
    val fromAsg = asg.groupBy(_._3).map { case (s, g) =>
      (s, g.size.toLong, g.map(_._2).min, g.map(_._2).max) }.toSet
    assert(fromAsg == stats.toSet)
    // null keys are excluded
    val withNull = rows.unionByName(
      Seq((999L, null.asInstanceOf[java.lang.Long])).toDF("doc_id", "k"))
    assert(Export.rangedShards(withNull, col("doc_id"), col("k"), 4)
      .count() == 100)
  }

  test("rangedShards: uncastable keys fail loudly, never vanish silently") {
    // under ANSI (this engine's mode) a non-numeric key hits the
    // long cast and FAILS both the assignment and the stats — the
    // pre-fix shape filtered on the raw key first, so the uncastable
    // row reached the equi-join with a null __k and silently
    // disappeared from the export with the stats none the wiser
    val rows = ((1L to 20L).map(i => (i, i.toString)) :+
      (998L, "not-a-number") :+ (999L, null.asInstanceOf[String]))
      .toDF("doc_id", "k")
    intercept[Exception] {
      Export.rangedShards(rows, col("doc_id"), col("k"), n = 2).count()
    }
    intercept[Exception] {
      Export.rangedShardStats(rows, col("k"), n = 2).collect()
    }
    // numeric strings + nulls: nulls excluded consistently on both
    // paths, every surviving row accounted for
    val clean = rows.filter(col("doc_id") =!= 998L)
    val asg = Export.rangedShards(clean, col("doc_id"), col("k"), n = 2)
    assert(asg.count() == 20L)
    val stats = Export.rangedShardStats(clean, col("k"), n = 2).collect()
    assert(stats.map(_.getLong(1)).sum == 20L)
  }

  test("within-shard order is the hash order, not the input order") {
    val byPos = Export.shards(docs, $"doc_id", n = 1)
      .orderBy($"pos").as[(Long, Int, Int)].collect().map(_._1)
    assert(byPos.toSeq != byPos.sorted.toSeq) // shuffled vs insertion order
    assert(byPos.sorted.toSeq == (0L until 200L))
  }

  test("writeShards round-trips with the logical assignment") {
    val dir = java.nio.file.Files.createTempDirectory("graft-shards").toString
    Export.writeShards(docs, $"doc_id", n = 4).parquet(s"$dir/out")
    val written = spark.read.parquet(s"$dir/out")
      .select($"doc_id", $"shard".cast("int").as("shard"))
      .as[(Long, Int)].collect().toMap
    val logical = Export.shards(docs, $"doc_id", n = 4)
      .as[(Long, Int, Int)].collect().map(r => r._1 -> r._2).toMap
    assert(written == logical)
  }

  test("writeShards: per-file row order is the deterministic (hash, id) order") {
    // byte-identical shards require every shard FILE's internal order to
    // be the logical `pos` order — independent of input partitioning
    val dir = java.nio.file.Files.createTempDirectory("graft-shardord").toString
    Export.writeShards(docs.repartition(7), $"doc_id", n = 4)
      .parquet(s"$dir/out")
    val logical = Export.shards(docs, $"doc_id", n = 4)
      .as[(Long, Int, Int)].collect().map(r => (r._1, r._2) -> r._3).toMap
    (0 until 4).foreach { s =>
      val files = new java.io.File(s"$dir/out/shard=$s").listFiles()
        .filter(f => f.getName.endsWith(".parquet"))
      // one task owns each shard directory → exactly one data file
      assert(files.length == 1, s"shard $s split across ${files.length} files")
      val inFile = spark.read.parquet(files.head.getPath)
        .select($"doc_id").as[Long].collect()
      val expected = inFile.sortBy(id => logical((id, s)))
      assert(inFile.toSeq == expected.toSeq, s"shard $s order diverged")
    }
  }

  test("writeEpoch: per-file row order is the epoch's (hash, seq) order") {
    val wins = (0L until 200L).map(i => Tuple1(i)).toDF("seq")
    val dir = java.nio.file.Files.createTempDirectory("graft-epoch").toString
    Export.writeEpoch(wins.repartition(7), $"seq", seed = 5L, n = 4)
      .parquet(s"$dir/out")
    val logical = Export.epochShuffle(wins, $"seq", seed = 5L, n = 4)
      .as[(Long, Int, Int)].collect().map(r => (r._1, r._2) -> r._3).toMap
    (0 until 4).foreach { s =>
      val files = new java.io.File(s"$dir/out/shard=$s").listFiles()
        .filter(f => f.getName.endsWith(".parquet"))
      assert(files.length == 1, s"shard $s split across ${files.length} files")
      val inFile = spark.read.parquet(files.head.getPath)
        .select($"seq").as[Long].collect()
      assert(inFile.toSeq == inFile.sortBy(w => logical((w, s))).toSeq,
        s"shard $s order diverged from the epoch order")
    }
    // every window written exactly once across the shard dirs
    assert(spark.read.parquet(s"$dir/out").select($"seq").as[Long]
      .collect().sorted.toSeq == (0L until 200L))
  }

  test("writeEpoch re-runs are BYTE-identical on disk: same seed, any " +
      "input partitioning") {
    // the physical claim behind "a resumed run seeks (shard, pos)":
    // two independent writes of the same epoch must produce shard
    // FILES with equal checksums, not merely equal logical rows —
    // file bytes are the artifact a dataloader actually consumes
    val wins = (0L until 200L).map(i => Tuple1(i)).toDF("seq")
    def writeOnce(df: org.apache.spark.sql.DataFrame): String = {
      val dir = java.nio.file.Files
        .createTempDirectory("graft-epoch-sum").toString
      Export.writeEpoch(df, $"seq", seed = 5L, n = 4).parquet(s"$dir/out")
      s"$dir/out"
    }
    def checksums(out: String): Map[String, String] =
      (0 until 4).map { s =>
        val files = new java.io.File(s"$out/shard=$s").listFiles()
          .filter(_.getName.endsWith(".parquet"))
        assert(files.length == 1, s"shard $s split across ${files.length}")
        val bytes = java.nio.file.Files.readAllBytes(files.head.toPath)
        val md = java.security.MessageDigest.getInstance("MD5")
        s"shard=$s" -> md.digest(bytes).map("%02x".format(_)).mkString
      }.toMap
    val a = checksums(writeOnce(wins))
    val b = checksums(writeOnce(wins.repartition(7)))
    assert(a == b, s"shard files diverged across re-runs: $a vs $b")
    // a different seed is a different epoch: files must differ
    val d3 = java.nio.file.Files
      .createTempDirectory("graft-epoch-sum").toString
    Export.writeEpoch(wins, $"seq", seed = 6L, n = 4).parquet(s"$d3/out")
    assert(checksums(s"$d3/out") != a)
  }

  test("epochShuffle: permutation per epoch, reproducible per seed") {
    val wins = (0L until 300L).map(i => Tuple1(i)).toDF("seq")
    def order(seed: Long) = Export.epochShuffle(wins, $"seq", seed, n = 4)
      .as[(Long, Int, Int)].collect().sortBy(r => (r._2, r._3))
    val e0 = order(0L)
    // every window exactly once; positions gap-free per shard
    assert(e0.map(_._1).sorted.toSeq == (0L until 300L))
    e0.groupBy(_._2).foreach { case (_, rows) =>
      assert(rows.map(_._3).sorted.toSeq == (0 until rows.length)) }
    // same seed ⇒ byte-identical (re-run, different partitioning)
    val e0b = Export.epochShuffle(wins.repartition(7), $"seq", 0L, n = 4)
      .as[(Long, Int, Int)].collect().sortBy(r => (r._2, r._3))
    assert(e0.toSeq == e0b.toSeq)
    // different seeds ⇒ different global orders (and different from
    // the identity order)
    val e1 = order(1L)
    assert(e0.map(_._1).toSeq != e1.map(_._1).toSeq)
    assert(e0.map(_._1).toSeq != (0L until 300L).toSeq)
  }

  test("manifest: volumes roll up per shard; checksum moves on any edit") {
    val docs = (1L to 40L).map(i => (i, s"doc $i body")).toDF("doc_id", "text")
    val m = Export.manifest(docs, $"doc_id", $"text", n = 4)
      .collect().map(r => r.getInt(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))).toMap
    assert(m.values.map(_._1).sum == 40)           // every doc in one shard
    assert(m.values.map(_._2).sum == 40 * 3)       // 3 ws-tokens per doc
    // shard membership agrees with shards()
    val byShard = Export.shards(docs, $"doc_id", n = 4)
      .groupBy($"shard").count().collect()
      .map(r => r.getInt(0) -> r.getLong(1)).toMap
    assert(m.view.mapValues(_._1).toMap == byShard)
    // altering ONE doc's text moves exactly its shard's checksum
    val docs2 = docs.withColumn("text",
      when($"doc_id" === 7L, lit("doc 7 EDITED")).otherwise($"text"))
    val m2 = Export.manifest(docs2, $"doc_id", $"text", n = 4)
      .collect().map(r => r.getInt(0) -> r.getLong(4)).toMap
    val shard7 = Export.shards(docs, $"doc_id", n = 4)
      .filter($"doc_id" === 7L).head().getInt(1)
    assert(m2(shard7) != m(shard7)._4)
    m.keys.filter(_ != shard7).foreach(s => assert(m2(s) == m(s)._4))
  }
}
