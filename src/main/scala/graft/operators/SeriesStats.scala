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
    buckets
      .withColumn("roll_mean",
        round(avg(v).over(w.rowsBetween(-(rollN - 1), 0)), 6))
      .withColumn("ewma", round(when(den > 0.0, num / den), 6))
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
  def anomaly(buckets: DataFrame, value: Column, threshold: Double = 2.0,
      partitionBy: Seq[String] = Nil): DataFrame = {
    require(threshold > 0, "threshold must be positive")
    val parts = partitionBy.map(col)
    val v = value.cast("double")
    val stats = buckets
      .groupBy(parts: _*)
      .agg(sum(v.cast("decimal(38,12)")).cast("double").as("__s"),
        sum((v * v).cast("decimal(38,12)")).cast("double").as("__ss"),
        count(v).as("__n"))
      .select(parts :+ (col("__s") / col("__n")).as("__m") :+
        (col("__ss") / col("__n") -
          (col("__s") / col("__n")) * (col("__s") / col("__n"))).as("__var"): _*)
    val joined =
      if (partitionBy.isEmpty) buckets.crossJoin(broadcast(stats))
      else buckets.join(broadcast(stats), partitionBy)
    joined
      .withColumn("z",
        round(when(col("__var") > 0, (v - col("__m")) / sqrt(col("__var"))), 6))
      .withColumn("is_anomaly", coalesce(abs(col("z")) > threshold, lit(false)))
      .drop("__m", "__var")
  }
}
