package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class GraphsSpec extends SparkSpec {
  import spark.implicits._

  private def ranks(edges: Seq[(String, String)], iters: Int = 4) =
    Graphs.pagerank(edges.toDF("s", "d"), $"s", $"d", iterations = iters)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap

  test("hub node outranks spokes; mass stays bounded") {
    // star: a,b,c all point at hub; hub points back at a. The hub⇄a
    // 2-cycle oscillates (amplitude decays ×0.7225 per double-step),
    // so hub>a is asserted on a converged run, the rest at 4 iters.
    val pr = ranks(Seq("a" -> "hub", "b" -> "hub", "c" -> "hub", "hub" -> "a"))
    assert(pr("a") > pr("b")) // hub feeds a; b,c get only the base
    assert(pr("b") == pr("c")) // symmetric nodes rank identically
    // floors only ever LOSE mass: total ≤ scale
    assert(pr.values.sum <= 1000000000000L)
    assert(pr.values.forall(_ > 0))
    val converged =
      ranks(Seq("a" -> "hub", "b" -> "hub", "c" -> "hub", "hub" -> "a"), 30)
    assert(converged("hub") > converged("a"))
  }

  test("one iteration of a 2-cycle is hand-exact") {
    // a→b, b→a, N=2: pr0 = 5e11 each; no dangling; ew = 1e6 both.
    // contrib = (5e11·1e6)//1e6 = 5e11;
    // pr1 = (15·(1e12//2))//100 + 0 + (85·5e11)//100 = 75e9 + 425e9
    val pr = ranks(Seq("a" -> "b", "b" -> "a"), iters = 1)
    assert(pr("a") == 75000000000L + 425000000000L)
    assert(pr("b") == pr("a"))
  }

  test("dangling node donates its mass back uniformly") {
    // a→d; d has no out-edges. With no dangling redistribution d
    // would hoard mass; with it, a keeps receiving a share and both
    // stay positive across iterations.
    val pr = ranks(Seq("a" -> "d"), iters = 6)
    assert(pr("d") > pr("a")) // d still receives a's damped mass
    assert(pr("a") > 0)
    assert(pr.values.sum <= 1000000000000L)
  }

  test("multi-edges weight the transition probability") {
    // a sends 3 of 4 units to b, 1 to c — b must outrank c
    val pr = ranks(Seq("a" -> "b", "a" -> "b", "a" -> "b", "a" -> "c",
      "b" -> "a", "c" -> "a"))
    assert(pr("b") > pr("c"))
  }

  test("deterministic across runs") {
    val e = Seq("a" -> "b", "b" -> "c", "c" -> "a", "a" -> "c")
    assert(ranks(e) == ranks(e))
  }

  private def hitsOf(edges: Seq[(String, String)], iters: Int = 3) =
    Graphs.hits(edges.toDF("s", "d"), $"s", $"d", iterations = iters)
      .collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap

  test("hits: one iteration is hand-exact") {
    // a→b, a→c, d→b; h0 = 2.5e11 each.
    // a-raw: b = h(a)+h(d) = 5e11, c = 2.5e11; total 7.5e11
    // auth:  b = (5e11·1e12)//7.5e11 = 666666666666, c = 333333333333
    // h-raw: a = auth(b)+auth(c) = 999999999999, d = auth(b); total
    //        1666666666665 → hub(a) = 6e11 exactly, hub(d) = 4e11
    val out = hitsOf(Seq("a" -> "b", "a" -> "c", "d" -> "b"), iters = 1)
    assert(out("b") == ((666666666666L, 0L)))
    assert(out("c") == ((333333333333L, 0L)))
    assert(out("a") == ((0L, 600000000000L)))
    assert(out("d") == ((0L, 400000000000L)))
  }

  test("empty edge frame returns empty results, not a divide-by-zero") {
    val none = Seq.empty[(String, String)].toDF("s", "d")
    assert(Graphs.pagerank(none, $"s", $"d").count() == 0)
    val h = Graphs.hits(none, $"s", $"d")
    assert(h.count() == 0)
    assert(h.columns.toSeq == Seq("node", "auth", "hub"))
  }

  test("pagerank loop issues no driver scalar actions (no .head jobs)") {
    // the dangling-mass term must ride a broadcast 1-row frame, not a
    // per-iteration .head — watch every job's call site during a run
    // and reject any head/collect/count coming from Graphs.scala
    // (the single upfront nodes.count() is outside the loop and shows
    // as "count at", exactly once, regardless of iteration count)
    import org.apache.spark.scheduler.{SparkListener, SparkListenerJobStart}
    val sites = new java.util.concurrent.ConcurrentLinkedQueue[String]()
    val group = "graphs-spec-pagerank-actions"
    val l = new SparkListener {
      override def onJobStart(j: SparkListenerJobStart): Unit = {
        val p = Option(j.properties)
        // suites share one SparkContext and may run in parallel: keep
        // only THIS test's jobs, tagged via its thread's job group
        if (p.flatMap(x => Option(x.getProperty("spark.jobGroup.id")))
            .contains(group))
          sites.add(p.flatMap(x => Option(x.getProperty("callSite.short")))
            .getOrElse(""))
      }
    }
    spark.sparkContext.addSparkListener(l)
    try {
      spark.sparkContext.setJobGroup(group, "pagerank driver-action audit")
      ranks(Seq("a" -> "b", "b" -> "c", "c" -> "a", "a" -> "c"), iters = 4)
      Thread.sleep(500) // listener bus is async; drain before asserting
    } finally {
      spark.sparkContext.clearJobGroup()
      spark.sparkContext.removeSparkListener(l)
    }
    import scala.jdk.CollectionConverters._
    val graft = sites.asScala.filter(_.contains("Graphs.scala"))
    assert(!graft.exists(_.startsWith("head at")),
      s"driver .head inside pagerank: ${graft.mkString(", ")}")
    assert(graft.count(_.startsWith("count at")) <= 1,
      s"per-iteration counts inside pagerank: ${graft.mkString(", ")}")
  }

  private def ppr(edges: Seq[(String, String)], tel: Seq[String],
      iters: Int = 4) =
    Graphs.personalizedPagerank(edges.toDF("s", "d"), $"s", $"d",
        tel.toDF("node"), iterations = iters)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap

  test("ppr: teleporting to every node IS plain pagerank") {
    val e = Seq("a" -> "b", "b" -> "c", "c" -> "a", "a" -> "c")
    assert(ppr(e, Seq("a", "b", "c")) == ranks(e))
  }

  test("ppr: rank concentrates at the seed and decays with distance") {
    // chain a→b→c→d, teleport {a}: a gets the restart mass, b the
    // damped flow from a, and so on — strictly falling along the chain
    val pr = ppr(Seq("a" -> "b", "b" -> "c", "c" -> "d", "d" -> "a"),
      Seq("a"))
    assert(pr("a") > pr("b") && pr("b") > pr("c") && pr("c") > pr("d"))
  }

  test("ppr: non-seed nodes with no in-links get exactly zero") {
    // a→b with teleport {b}: a receives neither restart nor link mass
    val pr = ppr(Seq("a" -> "b"), Seq("b"), iters = 2)
    assert(pr("a") == 0L)
    assert(pr("b") > 0L)
  }

  test("ppr: teleport set outside the graph is rejected loudly") {
    intercept[IllegalArgumentException] {
      ppr(Seq("a" -> "b"), Seq("zzz"))
    }
  }

  private def triOf(edges: Seq[(String, String)]) =
    Graphs.triangles(edges.toDF("s", "d"), $"s", $"d")
      .collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2),
        if (r.isNullAt(3)) None else Some(r.getDouble(3))))).toMap

  test("triangles: K4 — every node in 3 triangles, clustering 1.0") {
    val k4 = for {
      a <- Seq("a", "b", "c", "d"); b <- Seq("a", "b", "c", "d")
      if a < b
    } yield a -> b
    val out = triOf(k4)
    assert(out.values.forall(_ == ((3L, 3L, Some(1.0)))))
  }

  test("triangles: path has none; clustering null below degree 2") {
    val out = triOf(Seq("a" -> "b", "b" -> "c", "c" -> "d"))
    assert(out.values.forall(_._2 == 0L))
    assert(out("a") == ((1L, 0L, None))) // deg 1: coefficient undefined
    assert(out("b") == ((2L, 0L, Some(0.0))))
  }

  test("triangles: direction, multi-edges, and self-loops are ignored") {
    // one triangle however the edges point or repeat; self-loop dropped
    val base = triOf(Seq("a" -> "b", "b" -> "c", "c" -> "a"))
    val noisy = triOf(Seq("b" -> "a", "b" -> "c", "a" -> "c",
      "a" -> "c", "c" -> "c"))
    assert(base == noisy)
    assert(base("a") == ((2L, 1L, Some(1.0))))
  }

  test("triangles: hub counts every rim pair that closes") {
    // hub-x-y and hub-y-z triangles share the hub: hub has 2, y has 2
    // (in both), x and z have 1 each
    val out = triOf(Seq("hub" -> "x", "hub" -> "y", "hub" -> "z",
      "x" -> "y", "y" -> "z"))
    assert(out("hub")._2 == 2L && out("y")._2 == 2L)
    assert(out("x")._2 == 1L && out("z")._2 == 1L)
    // hub: deg 3, 2 triangles of 3 possible pairs → 2/3
    assert(out("hub")._3.get == 0.666667)
  }

  test("ppr loop issues no driver scalar actions (no .head jobs)") {
    // same audit as pagerank's: the dangling term must ride a
    // broadcast 1-row frame; the only counts are the upfront
    // nodes/teleport cardinalities (2), outside the loop
    import org.apache.spark.scheduler.{SparkListener, SparkListenerJobStart}
    val sites = new java.util.concurrent.ConcurrentLinkedQueue[String]()
    val group = "graphs-spec-ppr-actions"
    val l = new SparkListener {
      override def onJobStart(j: SparkListenerJobStart): Unit = {
        val p = Option(j.properties)
        if (p.flatMap(x => Option(x.getProperty("spark.jobGroup.id")))
            .contains(group))
          sites.add(p.flatMap(x => Option(x.getProperty("callSite.short")))
            .getOrElse(""))
      }
    }
    spark.sparkContext.addSparkListener(l)
    try {
      spark.sparkContext.setJobGroup(group, "ppr driver-action audit")
      ppr(Seq("a" -> "b", "b" -> "c", "c" -> "a"), Seq("a"), iters = 4)
      Thread.sleep(500)
    } finally {
      spark.sparkContext.clearJobGroup()
      spark.sparkContext.removeSparkListener(l)
    }
    import scala.jdk.CollectionConverters._
    val graft = sites.asScala.filter(_.contains("Graphs.scala"))
    assert(!graft.exists(_.startsWith("head at")),
      s"driver .head inside ppr: ${graft.mkString(", ")}")
    assert(graft.count(_.startsWith("count at")) <= 2,
      s"per-iteration counts inside ppr: ${graft.mkString(", ")}")
  }

  test("hits: multi-edges weight the scores; stable under iteration") {
    // a cites b twice, c once — b the stronger authority at any depth
    val e = Seq("a" -> "b", "a" -> "b", "a" -> "c")
    val out = hitsOf(e, iters = 3)
    assert(out("b")._1 > out("c")._1)
    assert(out("a")._2 > 0 && out("a")._1 == 0)
    assert(hitsOf(e, iters = 3) == out) // deterministic
  }
}
