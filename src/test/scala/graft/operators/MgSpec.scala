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
    val merged = CorpusStats.mgMerge(
      CorpusStats.mgSketch(a, col("v"), 32)
        .unionByName(CorpusStats.mgSketch(b, col("v"), 32)
          // disjoint summary ids for the second sketch's partitions
          .withColumn("sid", col("sid") + lit(1000))), 32)
    contract(collect(merged), exactCounts(a.unionByName(b)))
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
