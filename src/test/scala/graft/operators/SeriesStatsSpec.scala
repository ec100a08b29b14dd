package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class SeriesStatsSpec extends SparkSpec {
  import spark.implicits._

  test("gapFill: missing buckets appear with nulls and is_gap") {
    val b = Seq((0L, 1.0), (2000L, 2.0), (3000L, 3.0)).toDF("bucket_ms", "v")
    val got = SeriesStats.gapFill(b, 1000L).orderBy("bucket_ms")
      .collect().map(r => (r.getLong(0),
        if (r.isNullAt(1)) None else Some(r.getDouble(1)), r.getBoolean(2)))
    assert(got.toSeq == Seq(
      (0L, Some(1.0), false), (1000L, None, true),
      (2000L, Some(2.0), false), (3000L, Some(3.0), false)))
  }

  test("gapFill: per-series spines are independent") {
    val b = Seq(("a", 0L, 1.0), ("a", 2000L, 2.0), ("b", 5000L, 5.0))
      .toDF("k", "bucket_ms", "v")
    val got = SeriesStats.gapFill(b, 1000L, partitionBy = Seq("k"))
      .orderBy("k", "bucket_ms")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getBoolean(3)))
    // b's spine is a single bucket — a's gap never leaks into it
    assert(got.toSeq == Seq(("a", 0L, false), ("a", 1000L, true),
      ("a", 2000L, false), ("b", 5000L, false)))
  }

  test("gapFill: spans wider than one chunk are contiguous") {
    // 3000 buckets > the 1024-bucket chunk: the two-level explode
    // must produce exactly the arithmetic sequence, no seams
    val b = Seq((0L, 1.0), (2999000L, 2.0)).toDF("bucket_ms", "v")
    val got = SeriesStats.gapFill(b, 1000L)
    assert(got.count() == 3000)
    assert(got.agg(min("bucket_ms"), max("bucket_ms"), countDistinct("bucket_ms"))
      .collect().head.toSeq == Seq(0L, 2999000L, 3000L))
    assert(got.filter(!col("is_gap")).count() == 2)
  }

  test("gapFill: empty input produces an empty spine") {
    val b = Seq.empty[(Long, Double)].toDF("bucket_ms", "v")
    assert(SeriesStats.gapFill(b, 1000L).isEmpty)
  }

  test("smooth: rolling mean is partial at the head, ewma renormalizes") {
    val b = Seq((0L, 1.0), (1000L, 2.0), (2000L, 3.0)).toDF("bucket_ms", "v")
    val got = SeriesStats.smooth(b, col("v"), rollN = 2, alpha = 0.5,
        ewmaLags = 2).orderBy("bucket_ms")
      .collect().map(r => (r.getLong(0), r.getDouble(2), r.getDouble(3)))
    // roll2: 1, 1.5, 2.5 ; ewma (w = 1, 0.5):
    //   t0 = 1 ; t1 = (2 + .5)/1.5 = 1.666667 ; t2 = (3 + 1)/1.5 = 2.666667
    assert(got.toSeq == Seq((0L, 1.0, 1.0), (1000L, 1.5, 1.666667),
      (2000L, 2.5, 2.666667)))
  }

  test("smooth: null buckets drop out of both smoothers") {
    val b = Seq((0L, Some(2.0)), (1000L, None), (2000L, Some(4.0)))
      .toDF("bucket_ms", "v")
    val got = SeriesStats.smooth(b, col("v"), rollN = 3, alpha = 0.5,
        ewmaLags = 3).orderBy("bucket_ms")
      .collect().map(r => (if (r.isNullAt(2)) None else Some(r.getDouble(2)),
        if (r.isNullAt(3)) None else Some(r.getDouble(3))))
    // roll at t1 = avg(2) = 2 (null skipped); ewma t1 = 2·0.5/0.5 = 2
    // ewma t2 = (4·1 + 2·0.25)/1.25 = 3.6 (the null lag's weight gone)
    assert(got.toSeq == Seq((Some(2.0), Some(2.0)), (Some(2.0), Some(2.0)),
      (Some(3.0), Some(3.6))))
  }

  test("anomaly: z against per-series integer-exact stats") {
    val b = Seq(("a", 0L, 0.0), ("a", 1L, 0.0), ("a", 2L, 0.0),
        ("a", 3L, 0.0), ("a", 4L, 10.0), ("b", 0L, 7.0))
      .toDF("k", "bucket_ms", "n")
    val got = SeriesStats.anomaly(b, col("n"), threshold = 1.5,
        partitionBy = Seq("k")).orderBy("k", "bucket_ms")
      .collect().map(r => (r.getString(0),
        if (r.isNullAt(3)) None else Some(r.getDouble(3)), r.getBoolean(4)))
    // a: m = 2, var = 20 − 4 = 16 → z = ±(x−2)/4 ; b: σ = 0 → null z
    assert(got.toSeq == Seq(("a", Some(-0.5), false), ("a", Some(-0.5), false),
      ("a", Some(-0.5), false), ("a", Some(-0.5), false),
      ("a", Some(2.0), true), ("b", None, false)))
  }

  test("anomaly: global stats when unpartitioned") {
    val b = Seq((0L, 1.0), (1L, 3.0)).toDF("bucket_ms", "n")
    val got = SeriesStats.anomaly(b, col("n"), threshold = 0.5)
      .orderBy("bucket_ms")
      .collect().map(r => (r.getDouble(2), r.getBoolean(3)))
    // m = 2, var = 5 − 4 = 1 → z = ∓1
    assert(got.toSeq == Seq((-1.0, true), (1.0, true)))
  }

  test("smooth: an all-null window yields null ewma, not DIVIDE_BY_ZERO") {
    // gapFill-style input: ≥ ewmaLags consecutive null buckets put an
    // exact 0.0 in the EWMA denominator — must come back null, the
    // docstring's 'null buckets contribute nothing', not an ANSI error
    val b = Seq((0L, Some(2.0)), (1000L, None), (2000L, None),
        (3000L, None)).toDF("bucket_ms", "v")
    val got = SeriesStats.smooth(b, col("v"), rollN = 2, alpha = 0.5,
        ewmaLags = 2).orderBy("bucket_ms")
      .collect().map(r => if (r.isNullAt(3)) None else Some(r.getDouble(3)))
    // t2, t3: both the bucket and its single lag are null → null ewma
    assert(got.toSeq == Seq(Some(2.0), Some(2.0), None, None))
  }

  test("seasonal: phase means absorb the cycle; residual is the rest") {
    // period 2, groupMs 1000: phases 0,1,0,1 over values 10,1,12,3 —
    // phase-0 mean 11, phase-1 mean 2
    val b = Seq((0L, 10.0), (1000L, 1.0), (2000L, 12.0), (3000L, 3.0))
      .toDF("bucket_ms", "v")
    val got = SeriesStats.seasonal(b, col("v"), groupMs = 1000L, period = 2)
      .orderBy("bucket_ms")
      .collect().map(r => (r.getLong(2), r.getDouble(3), r.getDouble(4)))
    assert(got.toSeq == Seq((0L, 11.0, -1.0), (1L, 2.0, -1.0),
      (0L, 11.0, 1.0), (1L, 2.0, 1.0)))
  }

  test("seasonal: profiles are per-series when partitioned") {
    val b = Seq(("a", 0L, 4.0), ("a", 2000L, 6.0), ("b", 0L, 100.0))
      .toDF("k", "bucket_ms", "v")
    val got = SeriesStats.seasonal(b, col("v"), groupMs = 1000L,
        period = 2, partitionBy = Seq("k"))
      .orderBy("k", "bucket_ms")
      .collect().map(r => (r.getString(0), r.getDouble(4), r.getDouble(5)))
    // a's phase-0 mean is 5 (residuals ∓1); b's profile is its own
    assert(got.toSeq == Seq(("a", 5.0, -1.0), ("a", 5.0, 1.0),
      ("b", 100.0, 0.0)))
  }

  test("changepoint: level shift peaks |cusum| at the shift") {
    // 4 buckets at 1 then 4 at 5: μ = 3, cusum walks -2,-4,-6,-8 then
    // back up — the peak (|cusum| = 8) is the last low bucket
    val b = (0L to 7L).map(i => (i * 1000L, if (i < 4) 1L else 5L))
      .toDF("bucket_ms", "n")
    val got = SeriesStats.changepoint(b, col("n")).orderBy("bucket_ms")
      .collect().map(r => (r.getLong(0), r.getDouble(2), r.getBoolean(3)))
    assert(got.map(_._2).toSeq == Seq(-2.0, -4.0, -6.0, -8.0,
      -6.0, -4.0, -2.0, 0.0))
    assert(got.filter(_._3).map(_._1).toSeq == Seq(3000L))
  }

  test("changepoint: per-series peaks are independent; ties earliest") {
    val b = Seq(("a", 0L, 1L), ("a", 1000L, 3L), // shift at bucket 0
      ("b", 0L, 2L), ("b", 1000L, 2L)) // flat: cusum 0 everywhere, tie
      .toDF("k", "bucket_ms", "n")
    val got = SeriesStats.changepoint(b, col("n"), partitionBy = Seq("k"))
      .orderBy("k", "bucket_ms")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(3),
        r.getBoolean(4)))
    assert(got.filter(_._4).map(x => (x._1, x._2)).toSeq ==
      Seq(("a", 0L), ("b", 0L))) // flat series: earliest bucket wins
    assert(got.filter(_._1 == "a").map(_._3).toSeq == Seq(-1.0, 0.0))
  }

  test("changepoint: null buckets drop out of the walk, never flag") {
    // gapFill-shaped input: 1, null, 1 — occupied cusums are 0 (μ=1),
    // the gap emits null and cannot be the flagged peak
    val b = Seq((0L, Some(1L)), (1000L, None), (2000L, Some(1L)))
      .toDF("bucket_ms", "n")
    val got = SeriesStats.changepoint(b, col("n")).orderBy("bucket_ms")
      .collect().map(r => (if (r.isNullAt(2)) None else Some(r.getDouble(2)),
        r.getBoolean(3)))
    assert(got.toSeq == Seq((Some(0.0), true), (None, false),
      (Some(0.0), false)))
  }

  test("changepoint: all-null series emits null cusums, no flags") {
    val b = Seq((0L, Option.empty[Long]), (1000L, None)).toDF("bucket_ms", "n")
    val got = SeriesStats.changepoint(b, col("n")).orderBy("bucket_ms")
      .collect().map(r => (r.isNullAt(2), r.getBoolean(3)))
    assert(got.toSeq == Seq((true, false), (true, false)))
  }

  test("changepoint: fractional values quantize losslessly at 6 dp") {
    val b = Seq((0L, 0.5), (1000L, 1.5)).toDF("bucket_ms", "v")
    val got = SeriesStats.changepoint(b, col("v")).orderBy("bucket_ms")
      .collect().map(r => r.getDouble(2))
    // μ = 1 → cusum = -0.5, 0
    assert(got.toSeq == Seq(-0.5, 0.0))
  }

  test("gapFill: misaligned buckets fail loudly instead of vanishing") {
    // 1500 is not on the 0 + k·1000 grid — a silent LEFT join from
    // the spine would drop the row; the guard must raise instead
    val b = Seq((0L, 1.0), (1500L, 2.0)).toDF("bucket_ms", "v")
    val e = intercept[Exception] {
      SeriesStats.gapFill(b, 1000L).collect()
    }
    def msgs(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(x => Option(x.getMessage).toSeq ++ msgs(x.getCause))
    assert(msgs(e).exists(_.contains("gapFill")), e.toString)
  }

  test("anomaly: quantizeMicro z derives from exact integer sums " +
      "(property over non-integral series)") {
    // the cross-engine contract: after vi = round(v·1e6), z must equal
    // what ANY engine computes from the exact integer Σvi / Σvi² —
    // recompute those sums here in BigInt (the independent "engine")
    // over seeded random NON-integral values and compare at 6 dp
    val rnd = new scala.util.Random(0xC0FFEE)
    val series = (0 until 400).map { i =>
      ("s" + (i % 3), i.toLong * 1000L,
        (rnd.nextDouble() - 0.5) * math.pow(10, rnd.nextInt(5) - 1))
    }
    val b = series.toDF("k", "bucket_ms", "v")
    val got = SeriesStats.anomaly(b, col("v"), threshold = 2.0,
        partitionBy = Seq("k"), quantizeMicro = true)
      .orderBy("k", "bucket_ms")
      .collect().map(r => (r.getString(0), r.getLong(1),
        if (r.isNullAt(3)) None else Some(r.getDouble(3))))
    val expected = series.groupBy(_._1).flatMap { case (k, rows) =>
      val vis = rows.map(r => BigDecimal(r._3 * 1e6)
        .setScale(0, BigDecimal.RoundingMode.HALF_UP).toBigInt)
      val n = vis.size
      val s = vis.sum
      val ss = vis.map(x => x * x).sum
      val m = s.toDouble / n
      val v = ss.toDouble / n - m * m
      rows.zip(vis).map { case (r, vi) =>
        // the emit contract is zi = round(z·10⁶) then zi/10⁶ — a
        // SCALE-0 half-away round of the double product, not the old
        // round(z, 6) shortest-repr walk (they differ at 5e-7 ties)
        (r._1, r._2, if (v > 0)
          Some(BigDecimal((vi.toDouble - m) / math.sqrt(v) * 1e6)
            .setScale(0, BigDecimal.RoundingMode.HALF_UP).toDouble / 1e6)
          else None)
      }
    }.toSeq.sortBy(x => (x._1, x._2))
    assert(got.toSeq == expected)
  }

  test("seasonal + anomaly(quantizeMicro) composes deterministically " +
      "on non-integral residuals") {
    // the events_seasonal shape: residuals are derived non-integral
    // doubles; two runs with different partition layouts must agree
    // exactly (order-free integer sums, no double-summation drift)
    val rnd = new scala.util.Random(42)
    val b = (0 until 300).map(i =>
      (i.toLong * 3600000L, 50.0 + 10 * math.sin(i % 24) + rnd.nextDouble()))
      .toDF("bucket_ms", "v")
    def run(parts: Int) = SeriesStats.anomaly(
        SeriesStats.seasonal(b.repartition(parts), col("v"),
          groupMs = 3600000L, period = 24),
        col("residual"), threshold = 2.0, quantizeMicro = true)
      .orderBy("bucket_ms")
      .collect().map(r => (r.getLong(0),
        if (r.isNullAt(5)) None else Some(r.getDouble(5)), r.getBoolean(6)))
    assert(run(1).toSeq == run(13).toSeq)
  }

  test("seasonal: microQuantize emits half-up micro means and exact " +
      "integer residuals") {
    // period 2 over counts 10,1,12,3 + a phase-0 third value 11:
    // phase-0 mean = 33/3 = 11 exactly; phase-1 mean = 4/2 = 2.
    // And a half-up tie: phase-1 of series b has counts 1,2 —
    // mean 1.5 → smv_micro 1500000 (half-up), residuals ∓0.5
    val b = Seq(("a", 0L, 10.0), ("a", 1000L, 1.0), ("a", 2000L, 12.0),
        ("a", 3000L, 3.0), ("a", 4000L, 11.0),
        ("b", 1000L, 1.0), ("b", 3000L, 2.0))
      .toDF("k", "bucket_ms", "v")
    val got = SeriesStats.seasonal(b, col("v"), groupMs = 1000L,
        period = 2, partitionBy = Seq("k"), microQuantize = true)
      .orderBy("k", "bucket_ms")
      .collect().map(r => (r.getString(0), r.getDouble(4), r.getDouble(5),
        r.getLong(6)))
    assert(got.toSeq == Seq(
      ("a", 11.0, -1.0, -1000000L), ("a", 2.0, -1.0, -1000000L),
      ("a", 11.0, 1.0, 1000000L), ("a", 2.0, 1.0, 1000000L),
      ("a", 11.0, 0.0, 0L),
      ("b", 1.5, -0.5, -500000L), ("b", 1.5, 0.5, 500000L)))
  }

  test("seasonal: microQuantize rejects negative values loudly") {
    val b = Seq((0L, 1.0), (1000L, -2.0)).toDF("bucket_ms", "v")
    val e = intercept[Exception] {
      SeriesStats.seasonal(b, col("v"), groupMs = 1000L, period = 2,
        microQuantize = true).collect()
    }
    def msgs(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(x => Option(x.getMessage).toSeq ++ msgs(x.getCause))
    assert(msgs(e).exists(_.contains("non-negative")), e.toString)
  }

  test("seasonal: microQuantize phase sums survive LONG-overflow scale") {
    // per-phase Σn = 6e12 — raw-LONG micro math (Σn·2e6 = 1.2e19)
    // overflows Long.MaxValue; the DECIMAL(38,0) sums must not.
    // Individual micro values (2e18, 4e18) still fit in LONG.
    val b = Seq((0L, 2.0e12), (2000L, 4.0e12)).toDF("bucket_ms", "v")
    val got = SeriesStats.seasonal(b, col("v"), groupMs = 1000L,
        period = 2, microQuantize = true)
      .orderBy("bucket_ms")
      .collect().map(r => (r.getDouble(3), r.getLong(5)))
    // mean 3e12 → residuals ∓1e12 (micro: ∓1e18)
    assert(got.toSeq == Seq((3.0e12, -1000000000000000000L),
      (3.0e12, 1000000000000000000L)))
  }

  test("anomaly: microValue's null pattern drives the stats, not the " +
      "double column's") {
    // v is non-null on every row but the supplied micro column is null
    // on one — mean/var must come from the micro column's 2 occupied
    // rows (count(vi) = 2), not count(v) = 3
    val b = Seq((0L, 1.0, Some(1000000L)), (1000L, 9.0, None),
        (2000L, 3.0, Some(3000000L)))
      .toDF("bucket_ms", "v", "vi")
    val got = SeriesStats.anomaly(b, col("v"), threshold = 0.5,
        quantizeMicro = true, microValue = Some(col("vi")))
      .orderBy("bucket_ms")
      .collect().map(r => (if (r.isNullAt(3)) None else Some(r.getDouble(3)),
        r.getBoolean(4)))
    // micro stats over {1e6, 3e6}: m = 2e6, σ = 1e6 → z = ∓1; the
    // null-vi row scores null and never flags
    assert(got.toSeq == Seq((Some(-1.0), true), (None, false),
      (Some(1.0), true)))
  }

  test("anomaly: microValue without quantizeMicro is rejected") {
    val b = Seq((0L, 1.0)).toDF("bucket_ms", "v")
    val e = intercept[IllegalArgumentException] {
      SeriesStats.anomaly(b, col("v"), microValue = Some(col("v")))
    }
    assert(e.getMessage.contains("quantizeMicro"))
  }

  test("seasonal(microQuantize) + anomaly(microValue) is the exact " +
      "integer composition (the events_seasonal shape)") {
    // counts with a seasonal profile; verify against an independent
    // BigInt recomputation of the full micro pipeline
    val rnd = new scala.util.Random(7)
    val rows = (0 until 240).map { i =>
      ("t" + (i % 2), i.toLong * 3600000L,
        (20 + 10 * (i % 24 % 5) + rnd.nextInt(8)).toDouble)
    }
    val b = rows.toDF("k", "bucket_ms", "n")
    val got = SeriesStats.anomaly(
        SeriesStats.seasonal(b, col("n"), groupMs = 3600000L, period = 24,
          partitionBy = Seq("k"), microQuantize = true),
        col("residual"), threshold = 2.0, partitionBy = Seq("k"),
        quantizeMicro = true, microValue = Some(col("residual_micro")))
      .orderBy("k", "bucket_ms")
      .collect()
      // cols: k, bucket_ms, n, phase, seasonal_mean, residual,
      //       residual_micro, z, is_anomaly
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(4),
        r.getDouble(5), if (r.isNullAt(7)) None else Some(r.getDouble(7))))
    val expected = rows.groupBy(_._1).flatMap { case (k, rs) =>
      val byPhase = rs.groupBy(r => (r._2 / 3600000L) % 24)
      val smv = byPhase.map { case (ph, prs) =>
        val s = prs.map(r => BigInt(r._3.toLong)).sum
        val c = prs.size
        ph -> (s * 2000000 + c) / (c * 2) // half-up in exact BigInt
      }
      val vis = rs.map(r =>
        BigInt(r._3.toLong) * 1000000 - smv((r._2 / 3600000L) % 24))
      val n = vis.size
      val s = vis.sum
      val ss = vis.map(x => x * x).sum
      val m = s.toDouble / n
      val vr = ss.toDouble / n - m * m
      rs.zip(vis).map { case (r, vi) =>
        (r._1, r._2, smv((r._2 / 3600000L) % 24).toDouble / 1e6,
          vi.toDouble / 1e6,
          if (vr > 0) Some(BigDecimal(
              (vi.toDouble - m) / math.sqrt(vr) * 1e6)
            .setScale(0, BigDecimal.RoundingMode.HALF_UP).toDouble / 1e6)
          else None)
      }
    }.toSeq.sortBy(x => (x._1, x._2))
    assert(got.toSeq == expected)
  }

  test("twap: hold-until-next weighting clipped to buckets; nulls " +
      "excluded; equal-ts ties deterministic via ord") {
    // bucket width 10 s. v=10 held 2 s, v=20 held 8 s (clipped at the
    // bucket end even though the next sample is at 14 s) → 18.0;
    // the null sample at 6 s must not clip v=20's hold
    val ev = Seq(
      (0L, 1L, Some(10.0)), (2000L, 2L, Some(20.0)),
      (6000L, 3L, None), (14000L, 4L, Some(30.0)))
      .toDF("ts_ms", "eid", "v")
      .withColumn("tns", col("ts_ms") * 1000000L)
    val got = SeriesStats.twap(ev, col("tns"), col("eid"), col("v"),
        groupMs = 10000L)
      .orderBy("bucket_ms").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    assert(got.toSeq == Seq((0L, 2L, 18.0), (10000L, 1L, 30.0)))
    // equal-ts tie: ord decides which sample's value holds — the
    // first (by ord) holds 0 ns, the second holds to bucket end
    val tie = Seq((1000L, 1L, 5.0), (1000L, 2L, 7.0))
      .toDF("ts_ms", "eid", "v")
      .withColumn("tns", col("ts_ms") * 1000000L)
    val t = SeriesStats.twap(tie, col("tns"), col("eid"), col("v"), 10000L)
      .collect().map(r => (r.getLong(1), r.getDouble(2)))
    assert(t.toSeq == Seq((2L, 7.0)))
  }

  test("forecast: phase-mean projection, ±zσ residual band, " +
      "hand-computed") {
    // period 2 over buckets 0..3000: phase-0 mean (2+4)/2 = 3,
    // phase-1 mean (4+6)/2 = 5; residual micro ±1e6 everywhere →
    // σ = 1e6, band half-width = 2e6
    val b = Seq(("a", 0L, 2.0), ("a", 1000L, 4.0),
        ("a", 2000L, 4.0), ("a", 3000L, 6.0))
      .toDF("k", "bucket_ms", "n")
    val got = SeriesStats.forecast(b, col("n"), groupMs = 1000L,
        period = 2, horizon = 3, z = 2.0, partitionBy = Seq("k"))
      .orderBy("bucket_ms").collect()
      .map(r => (r.getLong(1), r.getLong(2), r.getDouble(3),
        r.getDouble(4), r.getDouble(5)))
    assert(got.toSeq == Seq(
      (4000L, 0L, 3.0, 1.0, 5.0),
      (5000L, 1L, 5.0, 3.0, 7.0),
      (6000L, 0L, 3.0, 1.0, 5.0)))
  }

  test("forecast: zero-spread series emits null bands; negative " +
      "values fail loudly") {
    val flat = Seq(("a", 0L, 5.0), ("a", 1000L, 5.0))
      .toDF("k", "bucket_ms", "n")
    val got = SeriesStats.forecast(flat, col("n"), 1000L, period = 1,
        horizon = 2, partitionBy = Seq("k"))
      .orderBy("bucket_ms").collect()
    assert(got.map(_.getLong(1)).toSeq == Seq(2000L, 3000L))
    assert(got.forall(r => r.getDouble(3) == 5.0 && r.isNullAt(4) &&
      r.isNullAt(5)))
    val neg = Seq(("a", 0L, -2.0)).toDF("k", "bucket_ms", "n")
    val e = intercept[Exception] {
      SeriesStats.forecast(neg, col("n"), 1000L, 1, 1,
        partitionBy = Seq("k")).collect()
    }
    assert(e.getMessage.contains("non-negative"))
  }

  test("forecast: series shorter than one period emits the full " +
      "horizon, null forecast for unseen phases") {
    // period 3 but only phases 0 and 1 observed: the phase-2 future
    // bucket must still emit (null forecast/bands), not vanish
    val b = Seq(("a", 0L, 2.0), ("a", 1000L, 4.0))
      .toDF("k", "bucket_ms", "n")
    val got = SeriesStats.forecast(b, col("n"), groupMs = 1000L,
        period = 3, horizon = 3, partitionBy = Seq("k"))
      .orderBy("bucket_ms").collect()
    assert(got.map(_.getLong(1)).toSeq == Seq(2000L, 3000L, 4000L))
    val byPhase = got.map(r => r.getLong(2) ->
      (if (r.isNullAt(3)) None else Some(r.getDouble(3)))).toMap
    assert(byPhase(0L) == Some(2.0) && byPhase(1L) == Some(4.0))
    assert(byPhase(2L).isEmpty) // unseen phase: emitted, null forecast
    assert(got.filter(_.getLong(2) == 2L)
      .forall(r => r.isNullAt(4) && r.isNullAt(5)))
  }

  test("hopping: each event lands in windowMs/slideMs windows; " +
      "occupied windows only; exact decimal sums") {
    // slide 1000ms, window 2000ms (k=2). Events at 500 (v=1), 1500
    // (v=2), 9500 (v=4, isolated), plus a null value at 1500.
    val ev = Seq((500L, Some(1.0)), (1500L, Some(2.0)),
        (1500L, None), (9500L, Some(4.0)))
      .toDF("ts_ms", "v")
      .withColumn("ts_ns", col("ts_ms") * 1000000L)
    val got = SeriesStats.hopping(ev, col("ts_ns"), col("v"),
        windowMs = 2000L, slideMs = 1000L)
      .orderBy("window_ms").collect()
      .map(r => (r.getLong(0), r.getLong(1),
        if (r.isNullAt(2)) None else Some(r.getDouble(2)),
        if (r.isNullAt(3)) None else Some(r.getDouble(3)),
        if (r.isNullAt(4)) None else Some(r.getDouble(4))))
    // windows: [-1000,1000) sees v=1; [0,2000) sees 1+2; [1000,3000)
    // sees 2; [8000,10000) and [9000,11000) see the isolated 4. The
    // null-value row contributes presence (its fine bucket exists)
    // but not to n/sum/min/max.
    assert(got.toSeq == Seq(
      (-1000L, 1L, Some(1.0), Some(1.0), Some(1.0)),
      (0L, 2L, Some(3.0), Some(1.0), Some(2.0)),
      (1000L, 1L, Some(2.0), Some(2.0), Some(2.0)),
      (8000L, 1L, Some(4.0), Some(4.0), Some(4.0)),
      (9000L, 1L, Some(4.0), Some(4.0), Some(4.0))))
  }

  test("hopping: per-series windows are independent; all-null fine " +
      "buckets emit n=0 null-stat windows") {
    val ev = Seq(("a", 100L, Some(1.0)), ("b", 100L, None))
      .toDF("k", "ts_ms", "v")
      .withColumn("ts_ns", col("ts_ms") * 1000000L)
    val got = SeriesStats.hopping(ev, col("ts_ns"), col("v"),
        windowMs = 1000L, slideMs = 1000L, partitionBy = Seq("k"))
      .orderBy("k", "window_ms").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.isNullAt(3)))
    assert(got.toSeq == Seq(("a", 0L, 1L, false), ("b", 0L, 0L, true)))
    // window must divide into slides
    val e = intercept[IllegalArgumentException] {
      SeriesStats.hopping(ev, col("ts_ns"), col("v"), 1500L, 1000L)
    }
    assert(e.getMessage.contains("multiple"))
  }

  test("hopping: property — matches the brute-force window sweep on " +
      "random events for several window/slide shapes") {
    val rng = new scala.util.Random(20260815L)
    val events = (1 to 400).map { _ =>
      (rng.nextInt(20000).toLong,
        if (rng.nextInt(10) == 0) None else Some(rng.nextInt(100).toDouble))
    }
    val df = events.toDF("ts_ms", "v")
      .withColumn("ts_ns", col("ts_ms") * 1000000L)
    for ((w, s) <- Seq((2000L, 500L), (2000L, 1000L), (2000L, 2000L),
        (3000L, 1000L))) {
      val got = SeriesStats.hopping(df, col("ts_ns"), col("v"), w, s)
        .collect().map(r => r.getLong(0) -> ((r.getLong(1),
          if (r.isNullAt(2)) None else Some(r.getDouble(2)),
          if (r.isNullAt(3)) None else Some(r.getDouble(3)),
          if (r.isNullAt(4)) None else Some(r.getDouble(4))))).toMap
      // brute force: a window at every slide multiple that contains
      // at least one event row (null-valued rows included)
      val starts = events.map(_._1 / s * s)
        .flatMap(b => (0L until w / s).map(i => b - i * s)).distinct
      val expected = starts.flatMap { ws =>
        val in = events.filter(e => e._1 >= ws && e._1 < ws + w)
        if (in.isEmpty) None else {
          val vs = in.flatMap(_._2)
          Some(ws -> ((vs.size.toLong,
            if (vs.isEmpty) None
            else Some(vs.map(BigDecimal(_)).sum.toDouble),
            if (vs.isEmpty) None else Some(vs.min),
            if (vs.isEmpty) None else Some(vs.max))))
        }
      }.toMap
      assert(got == expected, s"window=$w slide=$s")
    }
  }

  test("gapFill: adaptive chunking keeps wide spines contiguous") {
    // 3,000,000 buckets: fixed 1024-chunking would make the OUTER
    // array ~2930 elements; adaptive √n chunking (~1733 per level)
    // must still produce the exact arithmetic sequence, no seams
    val b = Seq((0L, 1.0), (2999999000L, 2.0)).toDF("bucket_ms", "v")
    val got = SeriesStats.gapFill(b, 1000L)
    assert(got.agg(min("bucket_ms"), max("bucket_ms"), countDistinct("bucket_ms"),
        count(lit(1))).collect().head.toSeq ==
      Seq(0L, 2999999000L, 3000000L, 3000000L))
  }
}
