package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/**
 * Ordered-step funnel analysis over an event stream: for each user,
 * how far along a fixed step sequence (e.g. view → click → purchase)
 * did they get, where step `i+1` counts only if it happens at-or-after
 * some qualifying occurrence of step `i`? The classic product-
 * analytics conversion query (ClickHouse's `windowFunnel` family).
 * The reference engine has no multi-series correlation at all (every
 * query is one series, `query.go:54`); this is the cross-event
 * extension of its time-bucketed model.
 *
 * Semantics: `f_0` = the user's earliest step-0 event; a step-`i`
 * event at time `t` QUALIFIES iff a qualifying step-`i−1` event
 * exists at time ≤ `t` (equal timestamps chain — the RANGE window
 * frame makes ties deterministic regardless of within-tie row order);
 * `f_i` = the earliest qualifying step-`i` time. Depth = the largest
 * `i+1` with `f_i` defined; `f_i` is monotone in `i`.
 *
 * Scale shape: ONE shuffle total. All step passes are cumulative-min
 * RANGE windows over the same (user, ts) partitioning+sort — Catalyst
 * plans one Exchange + one Sort feeding a Window chain — and the
 * final per-user rollup reuses the window's hash partitioning, so
 * adding funnel steps adds zero shuffles. No per-user event buffering
 * (nothing like `collect_list`): state per row is one running min per
 * step.
 */
object Funnel {

  /**
   * Per-user funnel reach. Output: `user_id`, `depth` (0..n steps
   * completed in order), `first_us` (time of the first step-0 event,
   * null if depth 0), `convert_us` (completion time minus `first_us`,
   * null unless the full funnel completed). `ts` must be a numeric
   * (epoch) column; its unit is the unit of `convert_us` and `within`.
   *
   * `within` (optional) anchors a conversion deadline at the FIRST
   * step-0 event: later steps qualify only inside
   * `[first, first + within]` — the "converted within 24 h of first
   * visit" business metric. Anchoring at the first occurrence keeps
   * the semantics deterministic and one-pass (the sliding-anchor
   * variant that maximizes depth over any occurrence needs per-user
   * event buffering — a different cost class at 100 TB).
   */
  def stepReach(df: DataFrame, user: Column, ts: Column, step: Column,
      steps: Seq[String], within: Option[Long] = None): DataFrame = {
    require(steps.nonEmpty, "need at least one funnel step")
    require(steps.distinct == steps, "funnel steps must be distinct")
    require(within.forall(_ > 0), "within must be positive")
    val cum = Window.partitionBy(col("_u")).orderBy(col("_ts"))
      .rangeBetween(Window.unboundedPreceding, Window.currentRow)
    var cur = df.select(user.as("_u"), ts.as("_ts"), step.as("_s"))
      .withColumn("_v0", when(col("_s") === steps.head, col("_ts")))
    for (i <- 1 until steps.length) {
      val deadline = within.fold(lit(true))(w =>
        col("_ts") <= min(col("_v0")).over(cum) + w)
      cur = cur
        .withColumn(s"_r${i - 1}", min(col(s"_v${i - 1}")).over(cum))
        .withColumn(s"_v$i", when(
          col("_s") === steps(i) && col(s"_r${i - 1}").isNotNull && deadline,
          col("_ts")))
    }
    val mins = steps.indices.map(i => min(col(s"_v$i")).as(s"_f$i"))
    val depth = steps.indices.foldLeft(lit(0)) { (acc, i) =>
      when(col(s"_f$i").isNotNull, lit(i + 1)).otherwise(acc)
    }
    cur.groupBy(col("_u").as("user_id"))
      .agg(mins.head, mins.tail: _*)
      .select(col("user_id"), depth.as("depth"),
        col("_f0").as("first_us"),
        (col(s"_f${steps.length - 1}") - col("_f0")).as("convert_us"))
  }

  /**
   * Top user journeys: the most common ordered event-type sequences,
   * truncated to each user's first `maxSteps` events — the
   * path-analysis query ("where do users actually go?") that funnels
   * are the directed special case of.
   *
   * Scale shape: truncation runs FIRST through the `row_number ≤ k`
   * shape the optimizer lowers to a map-side partial
   * `WindowGroupLimit`, so no user contributes more than `maxSteps`
   * rows past the first exchange and per-user state is bounded by
   * construction (this is the guard that makes the per-user
   * `collect_list` safe — a bot with 10⁸ events still folds to
   * `maxSteps` entries). Path assembly sorts the bounded struct list
   * in-row; the final path rollup is a heavy-hitter aggregate whose
   * top-k lowers to `TakeOrderedAndProject`.
   *
   * Ordering ties (equal `ts`) break by `tie` — pass a unique column
   * so paths are deterministic and engine-portable.
   */
  def topPaths(df: DataFrame, user: Column, ts: Column, step: Column,
      tie: Column, maxSteps: Int, k: Int): DataFrame = {
    require(maxSteps >= 1 && k >= 1, "maxSteps and k must be >= 1")
    val firstN = TopK.perGroup(
      df.select(user.as("_u"), ts.as("_ts"), step.as("_s"), tie.as("_tb")),
      col("_u"), col("_ts").asc, col("_tb"), maxSteps)
    val paths = firstN
      .groupBy(col("_u"))
      .agg(array_sort(collect_list(struct(col("rank"), col("_s")))).as("evs"))
      .select(col("_u"),
        concat_ws(">", transform(col("evs"), e => e.getField("_s"))).as("path"))
    paths.groupBy(col("path")).agg(count(lit(1)).as("users"))
      .orderBy(col("users").desc, col("path"))
      .limit(k)
  }

  /** Conversions with a ROW identity: duplicate (key, ts) conversion
   * rows are DISTINCT conversions (an at-least-once upstream, or two
   * same-µs purchases) and must each receive full credit — `__cix`
   * numbers the copies (they are indistinguishable, so any
   * assignment yields identical results), and every attribution
   * window/rollup keys on (key, ts, __cix). */
  private def convFrame(conversions: DataFrame, key: Column,
      convTs: Column): DataFrame =
    conversions.select(key.as("__k"), convTs.as("__cts"))
      .withColumn("__cix", row_number().over(
        Window.partitionBy(col("__k"), col("__cts")).orderBy(col("__cts"))))

  /** Touches ⋈ conversions restricted to the lookback window, as a
   * BUCKETED interval join (the [[RangeJoin.pointInInterval]]
   * construction, width = the lookback itself): touches carry their
   * single time bucket, each conversion explodes to the ≤2 buckets
   * its window spans, and the join key is (key, bucket) — so a
   * touch only ever pairs with conversions whose window can contain
   * it. A plain key join would cross ALL of a key's touches with all
   * its conversions and range-filter after the fact: per-key work
   * quadratic in the key's event count, 10⁴× at a 100× probe. The
   * bucket pairing is exact for any timestamp sign (trunc-div is
   * monotone, a point owns one bucket), so the residual filter is
   * the original predicate and the output is row-identical. */
  private def inWindowJoin(t: DataFrame, conv: DataFrame,
      lookbackUs: Long): DataFrame = {
    val p = t.withColumn("__bkt",
      graft.functions.ldiv(col("__tts"), lookbackUs))
    val c = conv.withColumn("__bkt", explode(sequence(
      graft.functions.ldiv(col("__cts") - lookbackUs + 1, lookbackUs),
      graft.functions.ldiv(col("__cts"), lookbackUs))))
    p.join(c, Seq("__k", "__bkt"))
      .filter(col("__tts") <= col("__cts") &&
        col("__tts") > col("__cts") - lookbackUs)
      .drop("__bkt")
  }

  private def channelRollup(weighted: DataFrame): DataFrame =
    weighted.groupBy(col("channel"))
      .agg(count(lit(1)).as("touches"),
        countDistinct(col("__k"), col("__cts"), col("__cix"))
          .as("conversions_touched"),
        sum(col("__ppm")).as("__credit_ppm"))
      .select(col("channel"), col("touches"), col("conversions_touched"),
        round(col("__credit_ppm").cast("double") / lit(1000000.0), 6)
          .as("credit"))

  /**
   * Linear multi-touch attribution: every conversion's credit splits
   * EQUALLY across the same key's touches inside the lookback window
   * (`cts − lookbackUs < tts ≤ cts`), rolled up per channel — the
   * "which channel actually drives conversions" statistic that
   * last-touch ([[AsOf.join]]) systematically biases toward the final
   * click. Emits (channel, touches, conversions_touched, credit):
   * `credit` sums each touch's `1/n` share; `conversions_touched`
   * counts distinct conversions the channel participated in.
   *
   * Portability: per-touch shares are INTEGER micro-credits
   * (`10⁶ div n`, floor — every engine reproduces the floor), summed
   * as longs — no float summation order anywhere; the emitted credit
   * is one final division. A conversion's total attributed credit is
   * therefore ≤ 1 by exactly the floor dust (documented, determinate).
   *
   * Scale shape: touches ⋈ conversions is the BUCKETED interval
   * equi-join of [[inWindowJoin]] — keyed on (key, lookback-width
   * time bucket), so out-of-window events are dropped by the join
   * key itself instead of crossing every touch with every conversion
   * per key. The per-conversion touch count is one bounded window
   * over the join output (no second join of the same subtree), and
   * the rollup is map-side-combined.
   * Conversions with NO in-window touch simply contribute nothing
   * (the reference set for conversion-rate math is the caller's).
   */
  def linearAttribution(touches: DataFrame, conversions: DataFrame,
      key: Column, touchTs: Column, channel: Column, convTs: Column,
      lookbackUs: Long): DataFrame = {
    require(lookbackUs > 0, "lookbackUs must be positive")
    val t = touches.select(key.as("__k"), touchTs.as("__tts"),
      channel.as("channel"))
    val inWindow = inWindowJoin(t, convFrame(conversions, key, convTs),
      lookbackUs)
    channelRollup(inWindow
      .withColumn("__n", count(lit(1)).over(
        Window.partitionBy(col("__k"), col("__cts"), col("__cix"))))
      .withColumn("__ppm", graft.functions.ldiv(lit(1000000L), col("__n"))))
  }

  /**
   * Time-decay multi-touch attribution: each in-window touch weighs
   * `2^(−Δt/halfLife)` of a conversion's credit (Δt = conversion −
   * touch), normalized per conversion — recency-weighted without
   * last-touch's winner-take-all. The standard third member of the
   * attribution family next to [[linearAttribution]] (uniform) and
   * [[positionAttribution]] (U-shaped).
   *
   * Portability: raw weights quantize to ppm (`round(10⁶·2^(−Δt/h))`
   * — the same quantize-after-libm discipline as the micro-nat LM
   * scores), the per-conversion total is a LONG window sum, and each
   * share is the integer `w·10⁶ div Σw` — no float division or
   * float summation anywhere after the quantize. Touches older than
   * ~20 half-lives round to weight 0 and zero credit.
   */
  def timeDecayAttribution(touches: DataFrame, conversions: DataFrame,
      key: Column, touchTs: Column, channel: Column, convTs: Column,
      lookbackUs: Long, halfLifeUs: Long): DataFrame = {
    require(lookbackUs > 0, "lookbackUs must be positive")
    require(halfLifeUs > 0, "halfLifeUs must be positive")
    val t = touches.select(key.as("__k"), touchTs.as("__tts"),
      channel.as("channel"))
    val inWindow = inWindowJoin(t, convFrame(conversions, key, convTs),
      lookbackUs)
    val conv = Window.partitionBy(col("__k"), col("__cts"), col("__cix"))
    inWindow
      .withColumn("__w", round(lit(1000000.0) *
        pow(lit(0.5), (col("__cts") - col("__tts")).cast("double") /
          lit(halfLifeUs.toDouble))).cast("long"))
      .withColumn("__wtot", sum(col("__w")).over(conv))
      .withColumn("__ppm", when(col("__wtot") > 0,
        graft.functions.ldiv(
          (col("__w").cast("decimal(38,0)") * lit(1000000L))
            .cast("decimal(38,0)"), col("__wtot"))).otherwise(lit(0L)))
      .transform(channelRollup)
  }

  /**
   * Position-based (U-shaped) multi-touch attribution: per
   * conversion, the FIRST and LAST in-window touches take 40% each
   * and the middles split the remaining 20% — the discovery-plus-
   * closer weighting. Degenerate sets follow the standard convention:
   * one touch takes 100%, two touches 50/50. Same integer-ppm
   * portability and join shape as [[linearAttribution]]; the only
   * addition is an ORDERED per-conversion window — bounded by one
   * user's in-window touch count, never corpus-sized. `tie` breaks
   * equal-timestamp touches deterministically (an event id).
   */
  def positionAttribution(touches: DataFrame, conversions: DataFrame,
      key: Column, touchTs: Column, tie: Column, channel: Column,
      convTs: Column, lookbackUs: Long): DataFrame = {
    require(lookbackUs > 0, "lookbackUs must be positive")
    val t = touches.select(key.as("__k"), touchTs.as("__tts"),
      tie.as("__tie"), channel.as("channel"))
    val inWindow = inWindowJoin(t, convFrame(conversions, key, convTs),
      lookbackUs)
    val conv = Window.partitionBy(col("__k"), col("__cts"), col("__cix"))
    val weighted = inWindow
      .withColumn("__rn", row_number().over(
        conv.orderBy(col("__tts"), col("__tie"))))
      .withColumn("__n", count(lit(1)).over(conv))
      .withColumn("__ppm",
        when(col("__n") === 1, lit(1000000L))
          .when(col("__n") === 2, lit(500000L))
          .when(col("__rn") === 1 || col("__rn") === col("__n"), lit(400000L))
          .otherwise(graft.functions.ldiv(lit(200000L), col("__n") - 2)))
    channelRollup(weighted)
  }
}
