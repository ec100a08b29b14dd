package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/**
 * CorpusStats.mgSketch / mgMerge / heavyHitters / heavyHittersAudit —
 * the mergeable Misra–Gries frequent-items summary. The content of an
 * MG summary depends on the partition layout by design; these tests
 * pin the LAYOUT-INDEPENDENT contract: exactness below the bound,
 * the deficit invariant `c ≤ exact ≤ c + err`, coverage of every
 * value with `exact > err`, merge validity, and the degenerate
 * all-ties case that must not lose err.
 */
class MgSpec extends SparkSpec {
  import spark.implicits._

  private def exactCounts(df: org.apache.spark.sql.DataFrame) =
    df.groupBy("v").agg(count(lit(1)).as("n"))
      .as[(String, Long)].collect().toMap

  private def contract(summary: Array[(String, Long, Long)],
      exact: Map[String, Long]): Unit = {
    val err = if (summary.isEmpty) 0L else summary.map(_._3).max
    summary.foreach { case (v, c, _) =>
      if (v != null) {
        val ex = exact.getOrElse(v, 0L)
        assert(c <= ex, s"overcount: $v c=$c exact=$ex")
        assert(ex <= c + err, s"deficit bound broken: $v c=$c err=$err exact=$ex")
      }
    }
    val present = summary.map(_._1).toSet
    exact.foreach { case (v, ex) =>
      if (ex > err) assert(present.contains(v),
        s"coverage broken: $v exact=$ex > err=$err but absent")
    }
  }

  private def collect(df: org.apache.spark.sql.DataFrame) =
    df.select("v", "c", "err").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))

  test("exact below the bound: distinct count <= k gives exact counts, err 0") {
    val rows = (1 to 300).map(i => s"v${i % 7}").toDF("v")
    val hh = collect(CorpusStats.heavyHitters(rows, col("v"), k = 16))
    assert(hh.forall(_._3 == 0L))
    assert(hh.map { case (v, c, _) => v -> c }.toMap ==
      exactCounts(rows.toDF("v")))
  }

  test("deficit contract holds on a heavy-tailed corpus over many partitions") {
    // 40 hot values (freq ~ 200 each) over a tail of 5000 singletons
    val hot = (0 until 40).flatMap(i => Seq.fill(200 - i)(s"hot$i"))
    val tail = (0 until 5000).map(i => s"tail$i")
    val rows = spark.sparkContext
      .parallelize(scala.util.Random.shuffle(hot ++ tail), 8).toDF("v")
    val hh = collect(CorpusStats.heavyHitters(rows, col("v"), k = 64))
    assert(hh.length <= 64)
    contract(hh, exactCounts(rows))
  }

  test("merge of split halves satisfies the contract against the whole") {
    val a = (1 to 2000).map(i => s"v${i % 300}").toDF("v")
    val b = (1 to 2000).map(i => s"w${i % 150}").toDF("v")
    // mgMergeFrames renumbers each frame's sids into a disjoint
    // namespace — no manual sid surgery
    val merged = CorpusStats.mgMergeFrames(Seq(
      CorpusStats.mgSketch(a, col("v"), 32),
      CorpusStats.mgSketch(b, col("v"), 32)), 32)
    contract(collect(merged), exactCounts(a.unionByName(b)))
  }

  test("two MERGED artifacts combine via mgMergeFrames: errs sum, not max") {
    // both merged artifacts carry sid "m"; a naive union would
    // collapse their errs to a max and break the deficit bound —
    // mgMergeFrames renumbers, so the bound must hold on the union
    def skewed(pfx: String) = spark.sparkContext.parallelize(
      (0 until 2)
        .flatMap(i => Seq.fill(60)(s"$pfx-hot$i")) ++
        (0 until 200).map(i => s"$pfx-tail$i"), 4).toDF("v")
    val a = skewed("a")
    val b = skewed("b")
    val ma = CorpusStats.heavyHitters(a, col("v"), k = 4)
    val mb = CorpusStats.heavyHitters(b, col("v"), k = 4)
    val errA = collect(ma).map(_._3).max
    val errB = collect(mb).map(_._3).max
    assert(errA > 0L && errB > 0L, "test needs nonzero per-artifact errs")
    val merged = collect(CorpusStats.mgMergeFrames(Seq(ma, mb), 4))
    assert(merged.map(_._3).max >= errA + errB,
      "merged err must carry BOTH artifacts' errs (sum, not max)")
    contract(merged, exactCounts(a.unionByName(b)))
  }

  test("mgSketchBy fails fast when a task exceeds maxGroups") {
    val rows = spark.sparkContext.parallelize(
      (0 until 64).map(i => (s"g$i", "v")), 1).toDF("g", "v")
    val e = intercept[org.apache.spark.SparkException] {
      CorpusStats.mgSketchBy(rows, col("g"), col("v"), k = 4,
        maxGroups = 16).collect()
    }
    assert(e.getMessage.contains("maxGroups") ||
      Option(e.getCause).exists(_.getMessage.contains("maxGroups")))
    // under the bound the same data sketches fine
    assert(CorpusStats.mgSketchBy(rows, col("g"), col("v"), k = 4,
      maxGroups = 64).count() == 64L)
  }

  test("audit flags are all true (found, lower, upper)") {
    val rows = (1 to 3000).map(i => s"t${i % 400}").toDF("v")
    val audit = CorpusStats.heavyHittersAudit(rows, col("v"),
      k = 64, topN = 15).collect()
    assert(audit.length == 15)
    audit.foreach { r =>
      assert(r.getBoolean(2) && r.getBoolean(3) && r.getBoolean(4),
        s"audit row failed: $r")
    }
  }

  test("all-ties degeneracy: err survives an emptied summary (sentinel row)") {
    // single partition, 2k distinct singletons: compression hits with
    // every counter equal, all are dropped, err must still flow
    val rows = spark.sparkContext
      .parallelize((0 until 8).map(i => s"u$i"), 1).toDF("v")
    val sk = CorpusStats.mgSketch(rows, col("v"), k = 4).collect()
    assert(sk.nonEmpty, "sentinel row missing")
    val err = sk.map(_.getLong(3)).max
    assert(err > 0L)
    contract(collect(CorpusStats.mgMerge(
      CorpusStats.mgSketch(rows, col("v"), 4), 4)), exactCounts(rows))
  }

  test("per-group sketch: independent contracts per group") {
    val rows = ((1 to 2000).map(i => ("a", s"v${i % 300}")) ++
      (1 to 1500).map(i => ("b", s"w${i % 80}")))
      .toDF("g", "v")
    val hh = CorpusStats.heavyHittersBy(rows, col("g"), col("v"), k = 48)
      .collect().map(r => (r.getString(1), r.getString(2), r.getLong(3),
        r.getLong(4)))
    // group b has 80 distincts <= k after merge truncation headroom:
    // within each group the deficit contract must hold independently
    Seq("a", "b").foreach { g =>
      val sub = hh.filter(_._1 == g).map { case (_, v, c, e) => (v, c, e) }
      val exact = rows.filter(col("g") === g).groupBy("v")
        .agg(count(lit(1)).as("n")).as[(String, Long)].collect().toMap
      contract(sub, exact)
    }
    val audit = CorpusStats.heavyHittersByAudit(rows, col("g"), col("v"),
      k = 48, topN = 8).collect()
    assert(audit.length == 16)
    audit.foreach(r => assert(
      r.getBoolean(3) && r.getBoolean(4) && r.getBoolean(5), s"failed: $r"))
  }

  test("nulls are excluded from counting") {
    val rows = Seq("a", "a", null, "b", null).toDF("v")
    val hh = collect(CorpusStats.heavyHitters(rows, col("v"), 8))
    assert(hh.map(_._1).toSet == Set("a", "b"))
    assert(hh.map { case (v, c, _) => v -> c }.toMap ==
      Map("a" -> 2L, "b" -> 1L))
  }
}
