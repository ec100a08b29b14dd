package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class SamplingSpec extends SparkSpec {
  import spark.implicits._

  private lazy val ids = (0L until 2000L).toDF("id")

  test("uniform keeps ~rate of rows, deterministically") {
    val kept = Sampling.uniform(ids, $"id", 0.3).select("id").as[Long].collect().sorted
    // deterministic: second run is byte-identical
    val again = Sampling.uniform(ids, $"id", 0.3).select("id").as[Long].collect().sorted
    assert(kept.sameElements(again))
    // close to the target rate (md5 is uniform; 2000 draws, ±5%)
    assert(math.abs(kept.length / 2000.0 - 0.3) < 0.05)
    // edge rates
    assert(Sampling.uniform(ids, $"id", 0.0).count() == 0)
    assert(Sampling.uniform(ids, $"id", 1.0).count() == 2000)
    assertThrows[IllegalArgumentException](Sampling.uniform(ids, $"id", 1.5))
  }

  test("uniform samples are nested across rates") {
    val s10 = Sampling.uniform(ids, $"id", 0.1).select("id").as[Long].collect().toSet
    val s30 = Sampling.uniform(ids, $"id", 0.3).select("id").as[Long].collect().toSet
    assert(s10.subsetOf(s30))
  }

  test("stratified applies per-stratum rates with default") {
    val df = ids.withColumn("g", when($"id" % 2 === 0, "en").otherwise("xx"))
    val kept = Sampling.stratified(df, $"id", $"g", Map("en" -> 0.5), default = 0.0)
    val langs = kept.select("g").distinct().as[String].collect().toSeq
    assert(langs == Seq("en")) // default 0 drops every other stratum
    // the en subset equals the uniform 0.5 sample restricted to en ids
    val uni = Sampling.uniform(df.filter($"g" === "en"), $"id", 0.5).count()
    assert(kept.count() == uni)
  }

  test("group-keyed split never straddles a group across splits") {
    // leakage-safe splitting: key the coordinate on a GROUP id (e.g.
    // a near-dup cluster) and every member lands in the same split
    val df = (0L until 300L).map(i => (i, i / 3)).toDF("id", "grp")
    val parts = Sampling.split(df, $"grp", Seq("train" -> 0.8, "test" -> 0.2))
    val straddling = parts.groupBy("grp")
      .agg(countDistinct("split").as("k")).filter($"k" > 1).count()
    assert(straddling == 0)
    assert(parts.select("split").distinct().count() == 2)
  }

  test("tokenBudget selects the exact hash-ordered prefix per group") {
    // reference semantics: order each group by (hash, id), keep while
    // the PRECEDING weights sum below the budget (boundary row kept)
    val df = ids.withColumn("g", when($"id" % 2 === 0, "en").otherwise("de"))
      .withColumn("w", $"id" % 7 + 1)
    val kept = Sampling.tokenBudget(df, $"id", $"g", $"w",
      Map("en" -> 200L), default = 50L)
      .select("id", "g", "w").as[(Long, String, Long)].collect().toSet

    // naive single-window reference computed in-process
    val hashed = df.withColumn("_h",
        graft.functions.Hash60Expr.hash60($"id".cast("string")))
      .select("id", "g", "w", "_h").as[(Long, String, Long, Long)]
      .collect().toSeq
    val expect = hashed.groupBy(_._2).flatMap { case (g, rows) =>
      val budget = if (g == "en") 200L else 50L
      var cum = 0L
      rows.sortBy(r => (r._4, r._1)).takeWhile { r =>
        val ok = cum < budget; cum += r._3; ok
      }
    }.map(r => (r._1, r._2, r._3)).toSet
    assert(kept == expect)
    // budget sanity: total kept weight stays within budget + boundary
    val byGroup = kept.groupBy(_._2).view.mapValues(_.toSeq.map(_._3).sum).toMap
    assert(byGroup("en") >= 200L && byGroup("en") < 200L + 7)
    assert(byGroup("de") >= 50L && byGroup("de") < 50L + 7)
  }

  test("tokenBudget selections are nested across budgets") {
    val df = ids.withColumn("g", lit("en")).withColumn("w", lit(3L))
    val small = Sampling.tokenBudget(df, $"id", $"g", $"w", Map("en" -> 300L))
      .select("id").as[Long].collect().toSet
    val big = Sampling.tokenBudget(df, $"id", $"g", $"w", Map("en" -> 900L))
      .select("id").as[Long].collect().toSet
    assert(small.subsetOf(big))
    // zero budget (and the default for unknown groups) keeps nothing
    assert(Sampling.tokenBudget(df, $"id", $"g", $"w", Map("xx" -> 10L)).count() == 0)
  }

  test("groupCap keeps the hash-ordered first N per group, nested in N") {
    val df = (0L until 300L).map(i => (i, s"g${i % 3}")).toDF("id", "grp")
    val kept5 = Sampling.groupCap(df, $"id", $"grp", Map("g0" -> 5L), default = 2L)
    val cnt5 = kept5.groupBy("grp").count().as[(String, Long)].collect().toMap
    assert(cnt5 == Map("g0" -> 5L, "g1" -> 2L, "g2" -> 2L))
    // raising a cap only adds rows (prefix property)
    val kept9 = Sampling.groupCap(df, $"id", $"grp", Map("g0" -> 9L), default = 2L)
    val s5 = kept5.select("id").as[Long].collect().toSet
    val s9 = kept9.select("id").as[Long].collect().toSet
    assert(s5.subsetOf(s9))
    // and the kept rows are exactly the N smallest by (hash, id)
    val want = df.withColumn("h", Sampling.fraction($"id"))
      .orderBy("h", "id").filter($"grp" === "g0")
      .select("id").as[Long].collect().take(5).toSet
    assert(kept5.filter($"grp" === "g0").select("id").as[Long].collect().toSet
      == want)
  }

  test("weighted sampling favors heavy rows and is deterministic") {
    // ids 0..999 weight 1, ids 1000..1999 weight 20: the heavy half
    // should dominate a k=200 sample under u^(1/w) keys
    val df = (0L until 2000L).map(i => (i, if (i < 1000) 1L else 20L))
      .toDF("id", "w")
    val a = Sampling.weighted(df, $"id", $"w", k = 200)
      .select("id").as[Long].collect().toSet
    val heavy = a.count(_ >= 1000L)
    assert(heavy > 160, s"heavy rows in sample: $heavy")
    val b = Sampling.weighted(df, $"id", $"w", k = 200)
      .select("id").as[Long].collect().toSet
    assert(a == b)
    assert(a.size == 200)
  }

  test("weightedPerGroup: per-group winners equal the global sampler " +
      "run per group; bounded-exchange plan") {
    val df = (0L until 600L)
      .map(i => (i, s"g${i % 3}", 1L + i % 7)).toDF("id", "g", "w")
    val per = Sampling.weightedPerGroup(df, $"id", $"g", $"w", k = 10)
    val got = per.select("g", "id").as[(String, Long)].collect()
      .groupBy(_._1).map { case (g, xs) => g -> xs.map(_._2).toSet }
    for (g <- Seq("g0", "g1", "g2")) {
      val solo = Sampling.weighted(df.filter($"g" === g), $"id", $"w", 10)
        .select("id").as[Long].collect().toSet
      assert(got(g) == solo, s"group $g diverges from the global sampler")
    }
    // every group fills its k and ranks are 1..k
    assert(per.groupBy("g").count().as[(String, Long)].collect()
      .forall(_._2 == 10))
    val p = per.queryExecution.executedPlan.toString
    assert(p.contains("WindowGroupLimit"), s"no group limit:\n$p")
  }

  test("split is disjoint, exhaustive, and weight-proportional") {
    val parts = Sampling.split(ids, $"id", Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1))
    val counts = parts.groupBy("split").count().as[(String, Long)].collect().toMap
    assert(counts.values.sum == 2000) // exhaustive
    assert(math.abs(counts("train") / 2000.0 - 0.8) < 0.05)
    // disjoint by construction (one label column); appending a split
    // never moves rows between the existing ones
    val parts2 = Sampling.split(ids, $"id",
      Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1, "extra" -> 0.0))
    val joined = parts.as("a").join(parts2.as("b"), "id")
      .filter($"a.split" =!= $"b.split").count()
    assert(joined == 0)
  }

  test("mixtureBudgets clamps to supply and reports the shortfall") {
    val docs = Seq(("a", 100L), ("a", 100L), ("b", 50L), ("c", 10L))
      .toDF("src", "w")
    val out = Sampling.mixtureBudgets(docs, col("src"), col("w"),
        totalBudget = 1000L, targetShares = Map("a" -> 0.1, "b" -> 0.2))
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))).toMap
    assert(out("a") == ((200L, 100L, 100L, 0L)))  // target met
    assert(out("b") == ((50L, 200L, 50L, 150L)))  // short 150
    assert(out("c") == ((10L, 0L, 0L, 0L)))       // not in the mixture
  }

  test("suppressSmallGroups: below-k and null-key rows are withheld") {
    val docs = Seq(
      (1L, Some("en"), "s1"), (2L, Some("en"), "s1"), (3L, Some("en"), "s1"),
      (4L, Some("fr"), "s1"),                      // singleton class
      (5L, Option.empty[String], "s1"))            // null quasi-identifier
      .toDF("id", "lang", "src")
    val out = Sampling.suppressSmallGroups(docs, Seq("lang", "src"), 2)
      .collect().map(r => r.getAs[Long]("id")).toSet
    assert(out == Set(1L, 2L, 3L))
  }

  test("temperatureBudgets: sqrt flattening upweights small groups") {
    // available: a = 900, b = 100 → isq 30, 10; tot 40
    // targets: a = 400·30/40 = 300, b = 400·10/40 = 100 (= its supply)
    val docs = Seq(("a", 900L), ("b", 100L)).toDF("src", "w")
    val out = Sampling.temperatureBudgets(docs, col("src"), col("w"),
        totalBudget = 400L)
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))).toMap
    assert(out("a") == ((900L, 300L, 300L, 0L)))
    assert(out("b") == ((100L, 100L, 100L, 0L)))
    // raw proportional would give b 40; sqrt temperature gives it 100
  }

  test("temperatureBudgets: clamps to supply; zero corpus yields zero") {
    val docs = Seq(("a", 4L), ("b", 10000L)).toDF("src", "w")
    val out = Sampling.temperatureBudgets(docs, col("src"), col("w"),
        totalBudget = 10000L)
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))).toMap
    // isq: 2, 100; tot 102 → targets 196, 9803; a clamps to 4
    assert(out("a") == ((4L, 196L, 4L, 192L)))
    assert(out("b") == ((10000L, 9803L, 9803L, 0L)))
    val empty = Sampling.temperatureBudgets(
      Seq.empty[(String, Long)].toDF("src", "w"), col("src"), col("w"), 100L)
    assert(empty.count() == 0)
  }

  test("repeatWeighted: copy counts, epoch tags, sub-1 nests with uniform") {
    val docs = (1L to 400L).map(i => Tuple1(i)).toDF("doc_id")
    val out = Sampling.repeatWeighted(docs, col("doc_id"), lit(2.5))
      .groupBy($"doc_id").agg(count(lit(1)).as("n"),
        sort_array(collect_list($"epoch")).as("es"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getSeq[Long](2)))
    // every doc gets 2 or 3 copies; the mean lands near 2.5
    assert(out.forall { case (_, n, es) =>
      (n == 2L || n == 3L) && es == (0L until n) })
    val mean = out.map(_._2).sum.toDouble / out.length
    assert(mean > 2.3 && mean < 2.7, s"mean $mean")
    // rate < 1 degenerates to uniform(): identical kept set, epoch 0
    val sub = Sampling.repeatWeighted(docs, col("doc_id"), lit(0.3))
    val uni = Sampling.uniform(docs, col("doc_id"), 0.3)
    assert(sub.select($"doc_id").as[Long].collect().sorted.toSeq ==
      uni.select($"doc_id").as[Long].collect().sorted.toSeq)
    assert(sub.select($"epoch").distinct().as[Long].collect().toSeq == Seq(0L))
  }

  test("mixturePlan: targets, epoch cap, shortfall, zero-weight — hand-computed") {
    // inventory: web 100 tokens, code 20, books 10, junk 5
    val docs = Seq(
      (1L, "web", Seq.fill(100)("w").mkString(" ")),
      (2L, "code", Seq.fill(20)("c").mkString(" ")),
      (3L, "books", Seq.fill(10)("b").mkString(" ")),
      (4L, "junk", Seq.fill(5)("j").mkString(" ")))
      .toDF("doc_id", "source", "text")
    // budget 200, weights web .6 / code .2 / books .2, cap 3 epochs
    val plan = Sampling.mixturePlan(docs, $"source", $"text",
        Map("web" -> 600000L, "code" -> 200000L, "books" -> 200000L),
        budgetTokens = 200L, maxEpochsMicro = 3000000L)
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4),
          r.getLong(5), r.getLong(6)))).toMap
    // web: target 120 ≤ avail·3 = 300 → plan 120, rate 1.2 epochs
    assert(plan("web") == ((100L, 600000L, 120L, 120L, 1200000L, 0L)))
    // code: target 40 vs cap 60 → plan 40, rate 2 epochs
    assert(plan("code") == ((20L, 200000L, 40L, 40L, 2000000L, 0L)))
    // books: target 40 vs cap 30 → CAP BINDS, shortfall 10
    assert(plan("books") == ((10L, 200000L, 40L, 30L, 3000000L, 10L)))
    // undeclared source plans zero but stays visible with inventory
    assert(plan("junk") == ((5L, 0L, 0L, 0L, 0L, 0L)))
    // a DECLARED source with no corpus presence keeps its row: full
    // shortfall, rate 0 — the signal must not vanish with the source
    val missing = Sampling.mixturePlan(docs, $"source", $"text",
        Map("web" -> 500000L, "wiki" -> 500000L),
        budgetTokens = 200L, maxEpochsMicro = 3000000L)
      .filter($"source" === "wiki").collect()
    assert(missing.length == 1)
    assert(missing.head.getLong(1) == 0L &&   // avail
      missing.head.getLong(3) == 100L &&      // target
      missing.head.getLong(4) == 0L &&        // plan
      missing.head.getLong(6) == 100L)        // shortfall
  }
}
