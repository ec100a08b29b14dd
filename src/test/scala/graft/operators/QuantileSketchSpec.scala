package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** The fixed-grid quantile sketch: exact below the bound, one-cell
 * error above it, and a merge that is associative AND a homomorphism
 * (merging part sketches equals sketching the union). */
class QuantileSketchSpec extends SparkSpec {
  import spark.implicits._

  private val K = 64

  private def frameOf(rows: Seq[(String, Double)]): DataFrame =
    rows.toDF("source", "v")

  private def sketch(rows: Seq[(String, Double)]): DataFrame =
    CorpusStats.quantileSketch(frameOf(rows), $"source", $"v", K)

  private def collectSk(df: DataFrame): Seq[(String, Long, Long, Long, Long, Long)] =
    df.select("source", "sk_w", "sk_min", "sk_max", "cell", "n")
      .as[(String, Long, Long, Long, Long, Long)].collect().sorted.toSeq

  // reference: lower order statistic at rank ⌊q·(n−1)⌋ (0-based), micro
  private def exactLower(vs: Seq[Double], q: Double): Long = {
    val micro = vs.map(v => math.round(v * 1e6)).sorted
    micro(math.floor(q * (micro.size - 1)).toInt)
  }

  private val rng = new scala.util.Random(42)

  test("exact tier: range under the bound keeps width 1 and exact quantiles") {
    (1 to 5).foreach { _ =>
      val vs = Seq.fill(200)((rng.nextInt(K - 3)).toDouble * 1e-6)
      val sk = sketch(vs.map(("g", _)))
      assert(sk.select("sk_w").distinct().as[Long].collect().toSeq == Seq(1L))
      val qs = Seq("p10" -> 0.1, "p50" -> 0.5, "p90" -> 0.9)
      val r = CorpusStats.quantileSketchQuantiles(sk, qs).head()
      qs.zipWithIndex.foreach { case ((name, q), i) =>
        assert(r.getAs[Long](s"${name}_micro") == exactLower(vs, q),
          s"$name mismatch")
      }
    }
  }

  test("grid tier: ≤ k cells, pow2 width, estimates within one cell") {
    (1 to 5).foreach { _ =>
      val vs = Seq.fill(500)(rng.nextDouble() * 1000 - 300) // wide range
      val sk = sketch(vs.map(("g", _)))
      val w = sk.select("sk_w").distinct().as[Long].head()
      assert((w & (w - 1)) == 0 && w >= 1) // power of two
      assert(sk.count() <= K)
      val qs = Seq("p01" -> 0.01, "p50" -> 0.5, "p99" -> 0.99)
      val r = CorpusStats.quantileSketchQuantiles(sk, qs).head()
      qs.foreach { case (name, q) =>
        val est = r.getAs[Long](s"${name}_micro")
        val truth = exactLower(vs, q)
        assert(math.abs(est - truth) < w,
          s"$name: |$est - $truth| >= width $w")
      }
    }
  }

  test("merge is a homomorphism: part sketches merge to the union's sketch") {
    (1 to 5).foreach { _ =>
      val parts = Seq.fill(3)(Seq.fill(300)(
        ("g" + rng.nextInt(3), rng.nextDouble() * 2000 - 500)))
      val direct = sketch(parts.flatten)
      val merged = CorpusStats.quantileSketchMerge(
        sketch(parts(0)).unionByName(sketch(parts(1)))
          .unionByName(sketch(parts(2))), K)
      assert(collectSk(merged) == collectSk(direct))
    }
  }

  test("merge is associative") {
    val parts = Seq.fill(3)(Seq.fill(200)(
      ("g" + rng.nextInt(2), rng.nextDouble() * 5000)))
    val Seq(a, b, c) = parts.map(sketch)
    val left = CorpusStats.quantileSketchMerge(
      CorpusStats.quantileSketchMerge(a.unionByName(b), K).unionByName(c), K)
    val right = CorpusStats.quantileSketchMerge(
      a.unionByName(CorpusStats.quantileSketchMerge(b.unionByName(c), K)), K)
    assert(collectSk(left) == collectSk(right))
  }

  test("negative values grid on floor cells; nulls and NaN drop") {
    val df = Seq(("g", Some(-5.5)), ("g", Some(-0.25)), ("g", Some(3.0)),
      ("g", None), ("g", Some(Double.NaN)))
      .toDF("source", "v")
    val sk = CorpusStats.quantileSketch(df, $"source", $"v", K)
    val n = sk.agg(sum($"n")).head().getLong(0)
    assert(n == 3L) // null and NaN excluded
    val r = CorpusStats.quantileSketchQuantiles(sk,
      Seq("p0" -> 0.0, "p100" -> 1.0)).head()
    // p0 is EXACT: the min's cell start never exceeds the min, so the
    // clamp returns sk_min itself. p100 is the max's cell start —
    // within one width below the true max.
    val w = sk.select("sk_w").distinct().as[Long].head()
    assert(r.getAs[Long]("p0_micro") == -5500000L)
    val p100 = r.getAs[Long]("p100_micro")
    assert(p100 <= 3000000L && 3000000L - p100 < w)
  }

  test("percentileRankSketch equals the exact operator on width-1 groups") {
    val rows = (0 until 300).map(i =>
      (i.toLong, "g" + (i % 2), rng.nextInt(K - 3).toDouble * 1e-6))
    val df = rows.toDF("id", "source", "v")
    val est = CorpusStats.percentileRankSketch(df, $"source", $"v", K)
      .select($"id", $"pct_rank_est").as[(Long, Double)].collect().toMap
    val exact = CorpusStats.percentileRank(df, $"source", $"v")
      .select($"id", $"pct_rank").as[(Long, Double)].collect().toMap
    assert(est == exact)
  }

  test("percentileRankSketch error is bounded by the row's cell population") {
    val rows = (0 until 400).map(i =>
      (i.toLong, rng.nextDouble() * 1000 - 200))
    val df = rows.map { case (i, v) => (i, "g", v) }.toDF("id", "source", "v")
    val est = CorpusStats.percentileRankSketch(df, $"source", $"v", K)
      .select($"id", $"pct_rank_est").as[(Long, Double)].collect().toMap
    val exact = CorpusStats.percentileRank(df, $"source", $"v")
      .select($"id", $"pct_rank").as[(Long, Double)].collect().toMap
    // lower boundary of the cell: estimate never exceeds the true
    // rank, and sits within one cell's population of it
    val sk = sketch(rows.map { case (_, v) => ("g", v) })
    val maxCell = sk.agg(max($"n")).head().getLong(0).toDouble
    est.foreach { case (id, e) =>
      assert(e <= exact(id) + 1e-12)
      assert(exact(id) - e <= maxCell / (rows.size - 1) + 1e-12,
        s"row $id: est $e vs exact ${exact(id)}")
    }
  }

  test("per-group widths are independent") {
    val rows = Seq.fill(100)(("narrow", rng.nextInt(10).toDouble * 1e-6)) ++
      Seq.fill(100)(("wide", rng.nextDouble() * 1e6))
    val sk = sketch(rows)
    val ws = sk.select("source", "sk_w").distinct()
      .as[(String, Long)].collect().toMap
    assert(ws("narrow") == 1L)
    assert(ws("wide") > 1L)
  }
}
