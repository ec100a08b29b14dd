package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/**
 * Bucket-series post-processing: operators that consume bucketized
 * series frames (`bucket_ms` LONG plus value columns, optionally
 * prefixed by series keys — the shape [[SeriesEngine.query]] emits)
 * and produce the derived series a monitoring/graphing consumer wants
 * next: gap-filled spines (cubism-style graphing needs one value per
 * regular step; the engine, like the reference's query.go:264-289,
 * emits only occupied buckets), smoothed curves, anomaly flags.
 *
 * Scale shape shared by all three: inputs are BUCKET frames — row
 * count bounded by time-range / granularity (× #series), not by the
 * event volume that produced them, so a per-series ordered window
 * here spans thousands of rows even when the events table is 100 TB.
 * The expensive collapse (events → buckets) already happened inside
 * the engine's partial-aggregated groupBy.
 */
object SeriesStats {

  /**
   * Emit one row for EVERY bucket between each series' first and last
   * occupied bucket, stepping by `groupMs`: occupied buckets keep
   * their value columns, missing ones appear with nulls and
   * `is_gap = true`. Downstream `coalesce(v, 0)` / interpolation is
   * the caller's policy choice.
   *
   * The spine is built in two explode levels (re-distributed between
   * the levels): a year of 1-second buckets is 31M rows, and a single
   * `sequence(lo, hi)` array that size would be one 250 MB value in
   * one task. The per-series chunk size adapts to the span —
   * `max(1024, ⌈√#buckets⌉)` buckets per chunk — so BOTH explode
   * levels stay balanced: neither the outer chunk array nor any inner
   * bucket array exceeds ~√#buckets elements (≈5.6k for the 31M-row
   * case) no matter how extreme the range-to-granularity ratio. The
   * join back to the data is a plain equi-join on (keys, bucket).
   *
   * Alignment precondition, checked loudly: every occupied input
   * bucket must sit on its series' `lo + k·groupMs` grid. A LEFT join
   * from the spine would silently DROP misaligned rows (data loss);
   * instead an `assert_true` guard fails the job with a clear message
   * when the input grid does not match `groupMs`.
   */
  def gapFill(buckets: DataFrame, groupMs: Long,
      bucketCol: String = "bucket_ms",
      partitionBy: Seq[String] = Nil): DataFrame = {
    require(groupMs > 0, "groupMs must be positive")
    val parts = partitionBy.map(col)
    val bounds = buckets
      .groupBy(parts: _*)
      .agg(min(col(bucketCol)).as("__lo"), max(col(bucketCol)).as("__hi"))
    val chunks = bounds
      .withColumn("__step", greatest(lit(groupMs * 1024L), lit(groupMs) *
        ceil(sqrt(((col("__hi") - col("__lo")) / lit(groupMs) + 1)
          .cast("double"))).cast("long")))
      .select(parts :+ col("__hi") :+ col("__step") :+
        explode(sequence(col("__lo"), col("__hi"), col("__step"))).as("__cs"): _*)
    val spine = chunks
      .repartition(parts :+ col("__cs"): _*)
      .select(parts :+
        explode(sequence(col("__cs"),
          least(col("__cs") + (col("__step") - groupMs), col("__hi")),
          lit(groupMs))).as(bucketCol): _*)
    // #series-sized frame broadcast back for the misalignment guard;
    // the filter is always-true (assert_true returns null) but forces
    // the check to run on every occupied row
    val loF = broadcast(bounds.select(parts :+ col("__lo"): _*))
    val checked =
      (if (parts.isEmpty) buckets.crossJoin(loF)
       else buckets.join(loF, partitionBy))
        .where(assert_true(
          pmod(col(bucketCol) - col("__lo"), lit(groupMs)) === 0,
          concat(lit(s"gapFill: input bucket "), col(bucketCol),
            lit(s" is not on the series' lo + k*$groupMs grid — " +
              "wrong groupMs or misaligned buckets"))).isNull)
        .drop("__lo")
    spine.join(checked.withColumn("__present", lit(true)),
        partitionBy :+ bucketCol, "left")
      .withColumn("is_gap", col("__present").isNull)
      .drop("__present")
  }

  /**
   * Trailing smoothers over an ordered bucket series: `roll_mean`
   * (mean of the last `rollN` buckets, partial at the head) and
   * `ewma` — exponentially weighted moving average, computed in its
   * weight-normalized truncated form (pandas `ewm(adjust=True)`):
   * `y_t = Σ_{j<L} (1−α)^j · x_{t−j} / Σ_{j<L} (1−α)^j` over the
   * available lags. Truncation at `ewmaLags` is principled — the
   * dropped tail's total weight is (1−α)^L, under 6% at the defaults
   * — and is what makes the smoother a fixed window expression
   * (one pass, no recursion) instead of a sequential fold.
   *
   * Weights are derived in exact DECIMAL arithmetic and only then
   * rounded to doubles (`BigDecimal.valueOf(1−α).pow(j)`), so an
   * external system writing the same weights as decimal literals
   * (e.g. the DuckDB oracle: 0.7^3 = `0.343::DOUBLE`) reproduces them
   * bit-for-bit — `math.pow` would differ in the last ulp.
   *
   * Buckets with a null value contribute nothing to either smoother
   * (their weight is dropped from the EWMA denominator; `roll_mean`
   * is SQL `avg`, which skips nulls).
   */
  def smooth(buckets: DataFrame, value: Column, rollN: Int = 4,
      alpha: Double = 0.3, ewmaLags: Int = 8,
      bucketCol: String = "bucket_ms",
      partitionBy: Seq[String] = Nil): DataFrame = {
    require(rollN >= 1, "rollN must be >= 1")
    require(ewmaLags >= 1, "ewmaLags must be >= 1")
    require(alpha > 0 && alpha <= 1, "alpha in (0, 1]")
    val w = Window.partitionBy(partitionBy.map(col): _*)
      .orderBy(col(bucketCol))
    val v = value.cast("double")
    val terms = (0 until ewmaLags).map { j =>
      val wj = java.math.BigDecimal.valueOf(1 - alpha).pow(j).doubleValue()
      val x = if (j == 0) v else lag(v, j).over(w)
      (when(x.isNotNull, lit(wj) * x).otherwise(lit(0.0)),
        when(x.isNotNull, lit(wj)).otherwise(lit(0.0)))
    }
    // an all-null window (possible when smoothing gapFill output with
    // >= ewmaLags consecutive gaps) has denominator exactly 0.0 —
    // guard it so the result is null, not an ANSI DIVIDE_BY_ZERO
    val num = terms.map(_._1).reduce(_ + _)
    val den = terms.map(_._2).reduce(_ + _)
    // 6-dp emit via SCALE-0 rounding of the scaled product (the
    // micro-z discipline — see anomaly): round(x, 6) is engine-
    // private at 5e-7 ties of derived rationals, round(x·10⁶) is not
    def q6(c: Column): Column = round(c * lit(1000000.0)) / lit(1000000.0)
    buckets
      .withColumn("roll_mean",
        q6(avg(v).over(w.rowsBetween(-(rollN - 1), 0))))
      .withColumn("ewma", q6(when(den > 0.0, num / den)))
  }

  /**
   * Per-series z-score anomaly flags over a bucket series: each
   * bucket's value against its own series' mean/σ (population), over
   * the OCCUPIED buckets ([[gapFill]] first — with zeros coalesced in
   * — to score absences too). Emits `z` (6 dp) and
   * `is_anomaly = |z| > threshold`, null-z rows (σ = 0, or a null
   * value) never flagged.
   *
   * Engine-reproducible by construction: sums run in DECIMAL
   * (order-free — a double sum would vary with partition order), the
   * square is taken per-row in double BEFORE the decimal cast, and
   * mean/variance come from the same `ss/n − (s/n)²` scalar
   * arithmetic any other engine computes from identical sums. The
   * stats frame is #series-sized and broadcasts back onto the bucket
   * frame; `stddev_pop` would be one pass fewer but its Welford order
   * is engine-private.
   */
  /**
   * Seasonal decomposition over a bucket series (the seasonal-means
   * half of an STL-style decomposition): each bucket's phase is its
   * position in a `period`-bucket cycle (`(bucket div groupMs) mod
   * period` — e.g. hour-of-day for hourly buckets, period 24), the
   * seasonal component is the per-(series, phase) mean over all
   * cycles, and `residual = value − seasonal_mean` is the
   * deseasonalized series. Compose with [[anomaly]] on `residual` for
   * seasonality-aware flags — a nightly traffic dip stops looking
   * anomalous once the hour-of-day profile absorbs it.
   *
   * Engine-reproducible like [[anomaly]]: phase means come from
   * order-free DECIMAL sums over identical doubles; the residual is
   * one double subtraction. The profile frame is
   * (#series · period)-sized and broadcasts back onto the buckets —
   * no window, no sort, one map-side-combined groupBy.
   *
   * `microQuantize = true` (requires an INTEGRAL `value`, e.g. a
   * count series) makes the whole decomposition rounding-free across
   * engines: the phase mean is computed directly in integer
   * micro-units — `smv_micro = (2·Σn·10⁶ + cnt) div (2·cnt)`, i.e.
   * round-half-up of Σn·10⁶/cnt in pure BIGINT arithmetic (all terms
   * positive, so floor and truncate agree on any engine) — and the
   * residual is the exact integer `vi = n·10⁶ − smv_micro`, emitted
   * alongside as `residual_micro` for [[anomaly]]'s `microValue`.
   * The emitted `seasonal_mean`/`residual` doubles are each a SINGLE
   * correctly-rounded IEEE division of an exactly-representable
   * integer by 10⁶ — no `round(double)` anywhere, so no engine's
   * tie-rounding convention can ever enter the result.
   */
  def seasonal(buckets: DataFrame, value: Column, groupMs: Long,
      period: Int, bucketCol: String = "bucket_ms",
      partitionBy: Seq[String] = Nil,
      microQuantize: Boolean = false): DataFrame = {
    require(groupMs > 0, "groupMs must be positive")
    require(period >= 1, "period must be >= 1")
    val parts = partitionBy.map(col)
    val v = value.cast("double")
    val wp = buckets.withColumn("phase",
      pmod(graft.functions.ldiv(col(bucketCol), groupMs), lit(period.toLong)))
    if (microQuantize) {
      // integral inputs only: round() here is a no-op defending
      // against `.0` float noise, never a tie decision
      val nLong = round(v).cast("long")
      // the (2a+c) div (2c) half-up formula needs a ≥ 0: IntegralDivide
      // truncates toward zero, so a negative Σn would silently flip it
      // to round-half-DOWN on floor-div engines. Counts are the
      // contract; fail loudly rather than drift.
      val wpc = wp.where(assert_true(nLong.isNull || nLong >= 0,
        concat(lit("seasonal(microQuantize): requires non-negative " +
          "integral values, got "), v)).isNull)
      // sums in DECIMAL(38,0): a raw LONG sum wraps silently past
      // ~4.6e12 per (series, phase) once scaled by 2·10⁶
      val profile = wpc.groupBy(parts :+ col("phase"): _*)
        .agg(sum(nLong.cast("decimal(38,0)")).as("__sn"),
          count(nLong).as("__cnt"))
        .select(parts :+ col("phase") :+
          graft.functions.ldiv(
            col("__sn") * lit(2000000L) + col("__cnt"),
            col("__cnt").cast("decimal(38,0)") * lit(2L)).as("__smv_micro"): _*)
      val vi = nLong * lit(1000000L) - col("__smv_micro")
      wpc.join(broadcast(profile), partitionBy :+ "phase")
        .select(buckets.columns.map(col) :+ col("phase") :+
          (col("__smv_micro").cast("double") / lit(1000000.0))
            .as("seasonal_mean") :+
          (vi.cast("double") / lit(1000000.0)).as("residual") :+
          vi.as("residual_micro"): _*)
    } else {
      val profile = wp.groupBy(parts :+ col("phase"): _*)
        .agg(graft.functions.decToDouble(sum(v.cast("decimal(38,12)")))
          .as("__s"),
          count(v).as("__n"))
        .select(parts :+ col("phase") :+
          (col("__s") / col("__n")).as("seasonal_mean"): _*)
      // equi-join reorders its keys to the front; restore input order
      wp.join(broadcast(profile), partitionBy :+ "phase")
        .select(buckets.columns.map(col) :+ col("phase") :+
          col("seasonal_mean") :+
          (v - col("seasonal_mean")).as("residual"): _*)
    }
  }

  /**
   * CUSUM changepoint detection over a bucket series (Page,
   * Biometrika 1954; the cumulative-sum-of-deviations estimator): for
   * each series, `cusum_i = Σ_{j≤i}(x_j − μ)` over the ordered
   * buckets, and the estimated changepoint is the bucket where
   * `|cusum|` peaks — a level shift at time t makes the deviation sum
   * grow until t and shrink after, so the peak localizes the shift.
   * Emits every bucket with its `cusum` (6 dp) plus
   * `is_changepoint = true` on the peak bucket (earliest on ties).
   *
   * Engine-reproducible by construction, the integer discipline of
   * [[Graphs.pagerank]]: values quantize to micro-units
   * (`vi = round(v·10⁶)` — exact for integral inputs like counts),
   * and `cusum_i·n = n·Σvi_{j≤i} − i·Σvi` is computed in
   * DECIMAL(38,0) LONG products — order-free, no float summation
   * anywhere until the single final division. Overflow bound:
   * `n · Σ|vi| < 10³⁸`, comfortable to ~10¹⁴ micro-unit-weighted
   * buckets per series.
   *
   * Scale shape: per-series totals are a map-side-combined groupBy
   * broadcast back (#series rows); the ordered cumulative window runs
   * over BUCKET frames (range/granularity-bounded, like the rest of
   * this family); the peak is a second #series-sized aggregate
   * broadcast back. No global sort, no driver scalars.
   *
   * Null-valued buckets (e.g. [[gapFill]]'s inserted grid rows, or a
   * reducer cell with no extractable value) contribute nothing: they
   * are excluded from the totals AND the walk index, emit a null
   * `cusum`, and are never flagged — the same "nulls drop out"
   * contract as [[smooth]]/[[anomaly]].
   */
  def changepoint(buckets: DataFrame, value: Column,
      bucketCol: String = "bucket_ms",
      partitionBy: Seq[String] = Nil): DataFrame = {
    val parts = partitionBy.map(col)
    val withVi = buckets.withColumn("__vi",
      round(value.cast("double") * lit(1000000.0)).cast("long"))
    val totals = withVi.groupBy(parts: _*)
      .agg(sum(col("__vi")).as("__sv"), count(col("__vi")).as("__n"))
    val joined =
      if (partitionBy.isEmpty) withVi.crossJoin(broadcast(totals))
      else withVi.join(broadcast(totals), partitionBy)
    val wOrd = Window.partitionBy(parts: _*).orderBy(col(bucketCol))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    // sum and count both skip nulls, so a null bucket's (__cum, __i)
    // repeat the previous occupied bucket's — its own __s is nulled
    val scored = joined
      .withColumn("__cum", sum(col("__vi")).over(wOrd))
      .withColumn("__i", count(col("__vi")).over(wOrd))
      .withColumn("__s", when(col("__vi").isNotNull,
        col("__cum").cast("decimal(38,0)") * col("__n") -
          col("__sv").cast("decimal(38,0)") * col("__i")))
    // peak per series: max |cusum|, earliest bucket on ties — one
    // max(struct) aggregate (map-side combined), broadcast back;
    // null-__s rows drop out of the max
    val peak = scored.groupBy(parts: _*)
      .agg(max(when(col("__s").isNotNull,
        struct(abs(col("__s")).as("a"), (-col(bucketCol)).as("nb"))))
        .as("__m"))
      .select(parts :+ (-col("__m.nb")).as("__cpb"): _*)
    val flagged =
      if (partitionBy.isEmpty) scored.crossJoin(broadcast(peak))
      else scored.join(broadcast(peak), partitionBy)
    flagged
      // integer-ratio emit (no round(double) — see functions.ratio6):
      // cusum = s / (n·10⁶) quantized half-away at 6 dp in pure
      // integral arithmetic, then ONE IEEE division
      .withColumn("cusum",
        graft.functions.ratio6(col("__s"), col("__n") * lit(1000000L)))
      .withColumn("is_changepoint",
        coalesce(col(bucketCol) === col("__cpb"), lit(false)))
      .drop("__vi", "__sv", "__n", "__cum", "__i", "__s", "__cpb")
  }

  /**
   * `quantizeMicro = true` switches the sums onto [[changepoint]]'s
   * integer micro-unit discipline: values quantize to
   * `vi = round(v·10⁶)` LONGs, and mean/variance derive from EXACT
   * integer sums (`Σvi`, `Σvi²` in DECIMAL(38,0)) before the single
   * scalar double division. Required when `value` is a DERIVED
   * NON-INTEGRAL double (e.g. [[seasonal]]'s residual): casting such
   * doubles to DECIMAL(38,12) quantizes at the 12th decimal in an
   * engine-private way (Spark rounds the exact decimal expansion;
   * other engines multiply by 10¹² in float), so cross-engine sums
   * drift in the last decimal and a 6-dp-rounded z can flip on a tie.
   * The micro-unit z is the z of the 6-dp-quantized series — scale
   * cancels in (vi − μ)/σ — and is bit-reproducible on any engine
   * that rounds half away from zero. Integral inputs (counts) are
   * unchanged by the default path, which stays DECIMAL(38,12)-exact.
   *
   * In micro mode the EMIT edge is rounding-free too: instead of
   * `round(z_double, 6)` — whose half-way tie behavior is
   * engine/version-private (a shortest-repr BigDecimal walk on the
   * JVM vs a scaled `std::round` elsewhere flipped one z at the
   * 5·10⁻⁷ boundary) — the raw z is quantized to an integer micro-z
   * `zi = round(z·10⁶)` (a SCALE-0 round, where the tie point 0.5 IS
   * exactly representable so every engine's half-away convention
   * agrees) and the emitted `z` is the single IEEE division
   * `zi / 10⁶`. The flag compares the integer: `|zi| > threshold·10⁶`.
   * Callers that already hold the exact integer micro-residual (e.g.
   * [[seasonal]]'s `residual_micro`) pass it as `microValue` so the
   * sums use it directly instead of re-deriving it from the double.
   */
  def anomaly(buckets: DataFrame, value: Column, threshold: Double = 2.0,
      partitionBy: Seq[String] = Nil,
      quantizeMicro: Boolean = false,
      microValue: Option[Column] = None): DataFrame = {
    require(threshold > 0, "threshold must be positive")
    require(microValue.isEmpty || quantizeMicro,
      "microValue requires quantizeMicro = true (it would be silently ignored)")
    val parts = partitionBy.map(col)
    val v = value.cast("double")
    // cntTerm counts the SAME column the sums aggregate: with a
    // caller-supplied microValue whose null pattern differs from
    // `value`, counting `value` would silently bias mean and variance
    val (scoreV, sumTerm, sqTerm, cntTerm) =
      if (quantizeMicro) {
        val vi = microValue.getOrElse(round(v * lit(1000000.0)).cast("long"))
        (vi.cast("double"),
          vi.cast("decimal(38,0)"),
          vi.cast("decimal(19,0)") * vi.cast("decimal(19,0)"),
          vi)
      } else {
        (v, v.cast("decimal(38,12)"), (v * v).cast("decimal(38,12)"), v)
      }
    val stats = buckets
      .groupBy(parts: _*)
      .agg(graft.functions.decToDouble(sum(sumTerm)).as("__s"),
        graft.functions.decToDouble(sum(sqTerm)).as("__ss"),
        count(cntTerm).as("__n"))
      .select(parts :+ (col("__s") / col("__n")).as("__m") :+
        (col("__ss") / col("__n") -
          (col("__s") / col("__n")) * (col("__s") / col("__n"))).as("__var"): _*)
    val joined =
      if (partitionBy.isEmpty) buckets.crossJoin(broadcast(stats))
      else buckets.join(broadcast(stats), partitionBy)
    val zRaw = when(col("__var") > 0,
      (scoreV - col("__m")) / sqrt(col("__var")))
    if (quantizeMicro) {
      val thrMicro = math.round(threshold * 1000000.0)
      joined
        .withColumn("__zi", round(zRaw * lit(1000000.0)).cast("long"))
        .withColumn("z", col("__zi").cast("double") / lit(1000000.0))
        .withColumn("is_anomaly",
          coalesce(abs(col("__zi")) > lit(thrMicro), lit(false)))
        .drop("__m", "__var", "__zi")
    } else {
      joined
        // scale-0 quantization (see quantizeMicro doc): both engines
        // round the SAME z·10⁶ product, where half-away conventions
        // agree — round(z, 6) is engine-private at 5e-7 ties
        .withColumn("z", round(zRaw * lit(1000000.0)) / lit(1000000.0))
        .withColumn("is_anomaly",
          coalesce(abs(col("z")) > threshold, lit(false)))
        .drop("__m", "__var")
    }
  }

  /**
   * Seasonal-naive forecasting with residual bands — the projection
   * step after [[seasonal]]'s decomposition: the next `horizon`
   * buckets beyond each series' last observed bucket are forecast as
   * their phase's historical mean, with a ±z·σ band from the
   * deseasonalized residual spread (σ pooled per series — the same
   * stat [[anomaly]] scores against, so "outside the band" for an
   * arrival agrees with `is_anomaly` by construction). The capacity
   * check a monitoring consumer runs off the graphing engine's
   * buckets.
   *
   * Integral inputs only (counts — the [[seasonal]] microQuantize
   * contract, enforced by the same loud guard): phase means are
   * half-up BIGINT divides over DECIMAL(38,0) sums, residuals are
   * exact integer micro-units, σ·z quantizes to an integer micro
   * half-width, and every emitted decimal is ONE IEEE division of an
   * exact integer by 10⁶ — engine-portable end to end. A zero-spread
   * or single-point series emits null bands (never a false ±0 band).
   *
   * Scale shape: two map-side-combined aggregates over the BUCKET
   * frame (phase profile, per-series stats), a `horizon`-element
   * explode off the #series-sized stats frame, and broadcast joins —
   * nothing event-volume-sized moves.
   */
  def forecast(buckets: DataFrame, value: Column, groupMs: Long,
      period: Int, horizon: Int, z: Double = 2.0,
      bucketCol: String = "bucket_ms",
      partitionBy: Seq[String] = Nil): DataFrame = {
    require(groupMs > 0, "groupMs must be positive")
    require(period >= 1, "period must be >= 1")
    require(horizon >= 1, "horizon must be >= 1")
    require(z > 0, "z must be positive")
    val parts = partitionBy.map(col)
    val v = value.cast("double")
    val nLong = round(v).cast("long")
    val wp = buckets
      .where(assert_true(nLong.isNull || nLong >= 0,
        concat(lit("forecast: requires non-negative integral values, " +
          "got "), v)).isNull)
      .withColumn("__phase",
        pmod(graft.functions.ldiv(col(bucketCol), groupMs),
          lit(period.toLong)))
    val profile = wp.groupBy(parts :+ col("__phase"): _*)
      .agg(sum(nLong.cast("decimal(38,0)")).as("__sn"),
        count(nLong).as("__cnt"))
      .select(parts :+ col("__phase") :+
        graft.functions.ldiv(col("__sn") * lit(2000000L) + col("__cnt"),
          col("__cnt").cast("decimal(38,0)") * lit(2L))
          .as("__smv_micro"): _*)
    val withVi = wp.join(broadcast(profile), partitionBy :+ "__phase")
    val vi = nLong * lit(1000000L) - col("__smv_micro")
    val stats = withVi.groupBy(parts: _*)
      .agg(sum(vi.cast("decimal(38,0)")).cast("double").as("__s"),
        sum(vi.cast("decimal(19,0)") * vi.cast("decimal(19,0)"))
          .cast("double").as("__ss"),
        count(vi).as("__n"), max(col(bucketCol)).as("__maxb"))
    val fut = stats
      .select(parts :+ col("__maxb") :+ col("__s") :+ col("__ss") :+
        col("__n") :+
        explode(sequence(lit(1L), lit(horizon.toLong))).as("__k"): _*)
      .withColumn(bucketCol, col("__maxb") + col("__k") * groupMs)
      .withColumn("__phase",
        pmod(graft.functions.ldiv(col(bucketCol), groupMs),
          lit(period.toLong)))
      // LEFT join: a series shorter than one full period has phases
      // with no profile row — those future buckets still emit (all
      // `horizon` of them), with null forecast/bands, rather than
      // silently vanishing from the horizon
      .join(broadcast(profile), partitionBy :+ "__phase", "left")
    val mean = col("__s") / col("__n")
    val variance = col("__ss") / col("__n") - mean * mean
    val hw = when(variance > 0, round(sqrt(variance) * lit(z))).cast("long")
    fut.select(parts :+ col(bucketCol) :+ col("__phase").as("phase") :+
      (col("__smv_micro").cast("double") / lit(1000000.0)).as("forecast") :+
      ((col("__smv_micro") - hw).cast("double") / lit(1000000.0)).as("lo") :+
      ((col("__smv_micro") + hw).cast("double") / lit(1000000.0)).as("hi"): _*)
  }

  /**
   * Time-weighted average (TWAP) per bucket — the mean that weights
   * each sample by HOW LONG it was the current value, the correct
   * center for irregularly-sampled gauges (a value sampled once and
   * held for 59 minutes must not count the same as 59 one-minute
   * samples; the reference's `avg` reducer is sample-weighted,
   * `query.go:311-333`). Each sample holds `[ts, next-sample-ts)`
   * clipped to its own bucket's end; the last sample in a bucket
   * holds to bucket end. Samples do NOT carry across bucket
   * boundaries (an empty bucket emits nothing rather than inheriting
   * a stale value — the engine's occupied-buckets-only contract;
   * callers wanting step interpolation run [[gapFill]] + a
   * `last(ignoreNulls)` window downstream). Null-valued samples are
   * excluded entirely (they neither hold value nor clip neighbors).
   *
   * Portability: durations are exact integer nanoseconds, values
   * micro-quantize (`round(v·10⁶)`), the weighted sum runs in
   * DECIMAL(38,0), and the twap quantizes to an integer micro value
   * by a HALF-UP INTEGRAL division (`(2·|Σvi·Δt| + ΣΔt) div
   * (2·ΣΔt)`, sign re-attached) before the single IEEE `/10⁶` emit —
   * deliberately NOT `(Σvi·Δt)ᴰ/(ΣΔt)ᴰ`: casting a >2⁵³ integer to
   * double is not correctly rounded on every engine (DuckDB's
   * hugeint→double goes through two roundings and lands one ulp off),
   * so the big integers must never touch a double. A bucket whose
   * total held time is 0 (all samples on the bucket's last instant)
   * emits null. `ord` breaks equal-timestamp ordering
   * deterministically.
   *
   * Scale shape: one per-series ordered window over the events (the
   * same exchange class as the engine's lookahead `c*` rate family)
   * then a map-side-combined rollup to bucket-frame size.
   */
  def twap(events: DataFrame, tsNs: Column, ord: Column, value: Column,
      groupMs: Long, partitionBy: Seq[String] = Nil): DataFrame = {
    require(groupMs > 0, "groupMs must be positive")
    val parts = partitionBy.map(col)
    val v = value.cast("double")
    val groupNs = groupMs * 1000000L
    val w = Window.partitionBy(
      (if (parts.isEmpty) Seq(lit(1)) else parts): _*).orderBy(tsNs, ord)
    val bucket = graft.functions.ldiv(tsNs, groupNs) * groupMs
    val bucketEndNs = (graft.functions.ldiv(tsNs, groupNs) + 1L) * groupNs
    val dt = least(coalesce(lead(tsNs, 1).over(w), bucketEndNs),
      bucketEndNs) - tsNs
    val vi = round(v * lit(1000000.0)).cast("long")
    events.filter(v.isNotNull)
      .select(parts :+ bucket.as("bucket_ms") :+
        vi.as("__vi") :+ dt.as("__dt"): _*)
      .groupBy(parts :+ col("bucket_ms"): _*)
      .agg(count(lit(1)).as("n"),
        sum(col("__dt")).as("__sdt"),
        sum(col("__vi").cast("decimal(38,0)") * col("__dt")).as("__svd"))
      .select(parts :+ col("bucket_ms") :+ col("n") :+ {
        val d0 = col("__sdt").cast("decimal(38,0)")
        val mag = graft.functions.ldiv(
          abs(col("__svd")) * lit(2L) + d0, d0 * lit(2L))
        val micro = when(col("__svd") < 0, -mag).otherwise(mag)
        when(col("__sdt") > 0,
          micro.cast("double") / lit(1000000.0)).as("twap")
      }: _*)
  }

  /**
   * Hopping (sliding) window aggregation over raw events — the
   * overlapping-window upgrade of the engine's tumbling buckets
   * (reference `query.go:264-289` only ever floors each row into ONE
   * bucket; a window of `windowMs` sliding every `slideMs` assigns
   * each row to `windowMs / slideMs` windows). Emits one row per
   * (series keys, window start) with `n`, `sum_v`, `min_v`, `max_v`
   * over the window `[window_ms, window_ms + windowMs)`.
   *
   * Scale shape — two-level, so the k-fold window overlap NEVER
   * multiplies the event volume: level 1 collapses events into
   * `slideMs` tumbling fine buckets with an ordinary map-side-combined
   * groupBy (the 100 TB pass; sums in DECIMAL(38,12) so the result is
   * order-free); level 2 explodes each FINE BUCKET row to its
   * k = windowMs/slideMs covering window starts and re-aggregates —
   * bucket-frame work, bounded by time-range/slideMs × #series, not
   * by event volume. A window row exists iff ≥1 event row fell in it
   * (matching the engine's occupied-buckets-only contract); `sum_v`
   * is the exact DECIMAL sum rounded to 6 dp IN DECIMAL (half-away on
   * every engine — no double is involved until the final cast, whose
   * scaled-integer magnitude stays far below the 2⁶⁴ threshold where
   * some engines' wide-int→double conversion drifts an ulp; SURVEY
   * §7.5).
   *
   * `tsNs` is epoch nanoseconds; window starts are epoch ms on the
   * `slideMs` grid (truncating division — the non-negative-ts
   * convention every bucket operator here shares).
   */
  def hopping(events: DataFrame, tsNs: Column, value: Column,
      windowMs: Long, slideMs: Long,
      partitionBy: Seq[String] = Nil): DataFrame = {
    require(slideMs > 0, "slideMs must be positive")
    require(windowMs > 0 && windowMs % slideMs == 0,
      "windowMs must be a positive multiple of slideMs")
    val k = windowMs / slideMs
    val parts = partitionBy.map(col)
    val v = value.cast("double")
    val fine = events
      .groupBy(parts :+
        (graft.functions.ldiv(tsNs, slideMs * 1000000L) * slideMs)
          .as("__fine"): _*)
      .agg(sum(v.cast("decimal(38,12)")).as("__s"), count(v).as("__n"),
        min(v).as("__mn"), max(v).as("__mx"))
    fine
      .select(parts :+
        explode(sequence(col("__fine") - lit((k - 1) * slideMs),
          col("__fine"), lit(slideMs))).as("window_ms") :+
        col("__s") :+ col("__n") :+ col("__mn") :+ col("__mx"): _*)
      .groupBy(parts :+ col("window_ms"): _*)
      .agg(sum(col("__n")).as("n"),
        graft.functions.decToDouble(sum(col("__s")).cast("decimal(38,6)"))
          .as("sum_v"),
        min(col("__mn")).as("min_v"), max(col("__mx")).as("max_v"))
  }

  /**
   * Per-time-bucket quantiles off the mergeable fixed-grid sketch
   * ([[graft.operators.CorpusStats.quantileSketch]]) — the p50/p95/p99
   * latency-dashboard readout `sum/min/max` aggregates can't give.
   * Each (partition, window) group grids independently (≤ `k` cells),
   * so a bucket of continuous values costs two bounded shuffles and
   * never materializes a distinct-value histogram; estimates are
   * clamped cell starts — exact when a bucket's micro range fits the
   * bound, within one cell width otherwise. Group count is
   * #windows · #partitions (the broadcast pre-pass frame), the same
   * bound [[hopping]]'s fine-bucket frame lives under.
   */
  def windowQuantiles(events: DataFrame, tsNs: Column, value: Column,
      windowMs: Long, qs: Seq[(String, Double)], k: Int = 4096,
      partitionBy: Seq[String] = Nil): DataFrame = {
    require(windowMs > 0, "windowMs must be positive")
    val parts = partitionBy.map(col)
    val keyed = events.select(parts :+
      (graft.functions.ldiv(tsNs, windowMs * 1000000L) * windowMs)
        .as("window_ms") :+ value.cast("double").as("__v"): _*)
    val grp = struct(parts :+ col("window_ms"): _*)
    val out = CorpusStats.quantileSketchQuantiles(
      CorpusStats.quantileSketch(keyed, grp, col("__v"), k), qs)
    out.select(partitionBy.map(p => col(s"source.$p").as(p)) ++
      (col("source.window_ms").as("window_ms") +: col("n_rows") +:
        qs.flatMap { case (n, _) => Seq(col(s"${n}_micro"), col(n)) }): _*)
  }
}
