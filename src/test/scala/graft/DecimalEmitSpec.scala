package graft

import graft.operators.SeriesEngine
import graft.operators.SeriesEngine.SeriesQuery
import org.apache.spark.sql.functions._

/**
 * The SURVEY §7.5 >2⁶⁴ cast cliff, pinned (round-10 watch item):
 * some engines convert a wide decimal/hugeint to double as
 * `upper·2⁶⁴ + lower` — two roundings, one ulp off nearest once the
 * unscaled integer passes 2⁶⁴ (verified against DuckDB for
 * 177709953702200000000). `functions.decToDouble` is the guard: a
 * tiered-scale emit whose chosen branch always casts an unscaled
 * integer below 2⁶³ (single correct rounding on any engine), equal to
 * the plain cast below 9·10⁶.
 */
class DecimalEmitSpec extends SparkSpec {
  import spark.implicits._

  /** The documented foreign conversion: fl(fl(upper)·2⁶⁴ + fl(lower)).
   * Multiplying by 2⁶⁴ is exact (power of two), so the error is the
   * upper rounding plus the final add — up to one ulp off nearest. */
  private def twoRoundingToDouble(u: BigInt): Double = {
    val sign = u.signum
    val a = u.abs
    val upper = (a >> 64).toDouble
    val lower = (a & ((BigInt(1) << 64) - 1)).toDouble
    sign * (upper * 1.8446744073709552e19 + lower)
  }

  test("the cliff is real: two-rounding conversion is one ulp off past 2^64") {
    // the recorded round-10 finding (SURVEY §7.5): JVM correct
    // rounding and the two-rounding path disagree on this value
    val bad = BigInt("177709953702200000000")
    val correct = new java.math.BigDecimal(bad.bigInteger).doubleValue()
    val foreign = twoRoundingToDouble(bad)
    assert(correct != foreign,
      s"expected a divergence at $bad: both gave $correct")
    assert(math.abs(correct - foreign) <= math.ulp(correct) * 1.5)
    // below 2^63 the conversion is a single rounding: never diverges
    val rng = new scala.util.Random(11L)
    (0 until 2000).foreach { _ =>
      val v = BigInt(62, rng) + 1
      assert(twoRoundingToDouble(v) ==
        new java.math.BigDecimal(v.bigInteger).doubleValue())
      assert(twoRoundingToDouble(-v) ==
        new java.math.BigDecimal((-v).bigInteger).doubleValue())
    }
    // past 2^64 divergence needs the double-rounding boundary, which
    // random draws essentially never hit — construct it: values
    // v = m·2^14 + 2^13 ± ε around a 53-bit mantissa m at 67 bits sit
    // exactly on the outer rounding's half-way point, where the inner
    // (lower-word) rounding can mislead the outer one
    val diverged = (0 until 2000).count { _ =>
      val m = (BigInt(52, rng) | (BigInt(1) << 52)) // 53-bit mantissa
      val v = (m << 14) + (BigInt(1) << 13) - BigInt(rng.nextInt(3))
      twoRoundingToDouble(v) !=
        new java.math.BigDecimal(v.bigInteger).doubleValue()
    }
    assert(diverged > 0, "no divergence found past 2^64 in 2000 samples")
  }

  /** JVM mirror of decToDouble's tier selection. */
  private def expectedEmit(s: BigDecimal): Double = {
    val a = s.abs
    val tiered =
      if (a <= BigDecimal(9000000L)) s
      else if (a <= BigDecimal(9000000000000L))
        s.setScale(6, BigDecimal.RoundingMode.HALF_UP)
      else s.setScale(0, BigDecimal.RoundingMode.HALF_UP)
    // the guard's invariant: whatever branch fires, the cast's
    // unscaled integer sits below 2^63 — single-rounding territory
    // on every engine
    assert(tiered.underlying.unscaledValue.abs
      .compareTo(java.math.BigInteger.valueOf(Long.MaxValue)) < 0,
      s"unscaled ${tiered.underlying.unscaledValue} crosses 2^63 for $s")
    tiered.doubleValue
  }

  test("decToDouble: plain-cast-identical below 9e6, portable tiers above") {
    val rng = new scala.util.Random(7L)
    val small = (0 until 300).map(_ =>
      BigDecimal(BigInt(43, rng) - (BigInt(1) << 42), 12)) // |x| <~ 8.8e6, scale 12
    val large = (0 until 300).map { i =>
      val bits = 60 + rng.nextInt(40) // unscaled up to ~2^100 ≫ 2^64
      BigDecimal(BigInt(bits, rng) * (if (i % 2 == 0) 1 else -1), 12)
    }
    val df = (small ++ large).map(x => Tuple1(x.setScale(12))).toDF("s")
      .select(col("s").cast("decimal(38,12)").as("s"))
    val got = df.select(col("s"), graft.functions.decToDouble(col("s")))
      .collect()
    got.foreach { r =>
      val s = BigDecimal(r.getDecimal(0))
      assert(r.getDouble(1) == expectedEmit(s), s"emit mismatch for $s")
      if (s.abs <= BigDecimal(9000000L))
        assert(r.getDouble(1) == s.doubleValue, s"below-cliff drift for $s")
    }
  }

  test("hot-bucket avg past the old cliff: exact, and the old cast wasn't") {
    // one bucket whose DECIMAL(38,12) sum has unscaled 1.777e20 > 2^64:
    // the round-10 construction cast that directly (one-ulp-off on
    // two-rounding engines); the tiered emit rounds to 6 dp first
    // (exact here) and casts an unscaled 1.777e14 — single rounding
    val ts = 1704067200000000000L
    val docs = Seq(
      (ts, 1L, """{"v": 177709953.7022}"""),
      (ts + 1000000000L, 2L, """{"v": 0}""")).toDF("ts", "seq", "doc")
    val q = SeriesQuery(groupMs = 3600000L, ptrs = Seq("/v", "/v"),
      reducers = Seq("avg", "sum"))
    val row = SeriesEngine.query(docs, q).collect().head
    val exactMean = (BigDecimal("177709953.7022") / 2).doubleValue
    assert(row.getDouble(1) == exactMean)
    // and the value this bucket's sum casts under the OLD emit path
    // genuinely diverges on a two-rounding engine:
    val oldUnscaled = BigInt("177709953702200000000")
    assert(twoRoundingToDouble(oldUnscaled) !=
      new java.math.BigDecimal(oldUnscaled.bigInteger).doubleValue())
  }
}
