package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/**
 * Deterministic sampling for training-data pipelines: membership is a
 * pure function of the row's id (60-bit md5 hash mapped to [0, 1)),
 * so samples are reproducible across runs, engines, and cluster
 * layouts — no RNG state, no per-partition seeds, and any engine with
 * md5 can recompute the exact same subset (the correctness oracle
 * does). Both operators are one codegen'd filter over the scan: no
 * shuffle, no driver involvement, linear at any scale.
 */
object Sampling {

  /** `hash60(id) / 2^60 ∈ [0, 1)` — the uniform deterministic
   * coordinate every sampling decision derives from. Ids are hashed
   * as strings so long and string keys sample identically. */
  def fraction(id: Column): Column =
    graft.functions.Hash60Expr.hash60(id.cast("string")) /
      lit(1152921504606846976.0) // 2^60

  /** Uniform `rate` sample: keep iff fraction(id) < rate. */
  def uniform(df: DataFrame, id: Column, rate: Double): DataFrame = {
    require(rate >= 0 && rate <= 1, "rate must be in [0, 1]")
    df.filter(fraction(id) < lit(rate))
  }

  /**
   * Stratified sampling with per-stratum rates (per-language /
   * per-source quotas): keep a row iff `fraction(id) < rate(stratum)`,
   * with `default` for strata not in the map. One scan, no shuffle;
   * the rate lookup compiles to a CASE chain.
   *
   * Because every decision reuses the SAME id coordinate, the kept
   * sets are NESTED across rates (a 10% sample is a subset of a 20%
   * one) — lowering a stratum's quota never introduces previously
   * unseen rows, which keeps incremental re-runs of a corpus build
   * monotone.
   */
  def stratified(df: DataFrame, id: Column, stratum: Column,
      rates: Map[String, Double], default: Double = 0.0): DataFrame = {
    require((default +: rates.values.toSeq).forall(r => r >= 0 && r <= 1),
      "rates must be in [0, 1]")
    val rate = rates.foldLeft(lit(default)) { case (acc, (k, r)) =>
      when(stratum === lit(k), lit(r)).otherwise(acc)
    }
    df.filter(fraction(id) < rate)
  }

  /**
   * Deterministic K-way split (train/validation/test): assigns each
   * row a split label by cumulative weight over the id coordinate.
   * Splits are disjoint, exhaustive, and stable under re-runs; rows
   * never migrate between splits when weights are appended (only when
   * earlier weights change).
   */
  def split(df: DataFrame, id: Column,
      weights: Seq[(String, Double)]): DataFrame = {
    require(weights.nonEmpty && weights.forall(_._2 >= 0), "weights must be >= 0")
    val total = weights.map(_._2).sum
    require(total > 0, "weights must sum > 0")
    val f = fraction(id)
    // thresholds are (w1+…+wi)/total with LEFT-TO-RIGHT addition —
    // the exact FP ops an external engine writes as literal
    // `(w1+…+wi)/(w1+…+wn)`, so boundary rows land identically
    val (cases, _) = weights.foldLeft((lit(null).cast("string"), 0.0)) {
      case ((acc, cumRaw), (name, w)) =>
        val nextRaw = cumRaw + w
        val lo = cumRaw / total
        val hi = nextRaw / total
        (when(f >= lit(lo) && f < lit(hi), lit(name)).otherwise(acc), nextRaw)
    }
    // float edge: f is strictly < 1, but guard the last bucket anyway
    df.withColumn("split", coalesce(cases, lit(weights.last._1)))
  }

  /**
   * Weighted sampling without replacement (Efraimidis–Spirakis): each
   * row draws key `u^(1/w)` with `u = fraction(id)` — its
   * deterministic uniform coordinate — and the k largest keys win,
   * which selects each row with probability proportional to `w`
   * without ever materializing a cumulative distribution. One scan;
   * the top-k lowers to `TakeOrderedAndProject`, so each partition
   * ships only k candidates.
   *
   * The emitted `key` is rounded to 6 dp and the ordering ties break
   * by id, so any md5-capable engine reproduces the identical sample
   * (floating `pow` agrees across engines far past 6 dp).
   */
  def weighted(df: DataFrame, id: Column, weight: Column, k: Int): DataFrame = {
    require(k >= 1, "k must be >= 1")
    // scale-0 quantization of the scaled key — the selection ORDER
    // depends on it, so an engine-private round(x, 6) tie would flip
    // which rows make the sample
    val key = round(pow(fraction(id), lit(1.0) / weight.cast("double")) *
      lit(1000000.0)) / lit(1000000.0)
    df.filter(weight > 0)
      .withColumn("key", key)
      .orderBy(col("key").desc, id)
      .limit(k)
  }

  /**
   * Per-group weighted sampling without replacement — [[weighted]]
   * partitioned by a group column ("k quality-weighted exemplars per
   * domain/language", the stratified form mixture builders actually
   * run): same Efraimidis–Spirakis `u^(1/w)` keys, same 6-dp
   * scale-0-quantized ordering with id tie-break, but the top-k is
   * per group via the `row_number ≤ k` shape the optimizer lowers to
   * a PARTIAL WindowGroupLimit — each partition ships at most k rows
   * per group, so a million-group corpus never funnels through one
   * task (the global [[weighted]]'s `TakeOrderedAndProject` can't do
   * groups). Output adds the per-group `rank` (best key first).
   */
  def weightedPerGroup(df: DataFrame, id: Column, group: Column,
      weight: Column, k: Int): DataFrame = {
    require(k >= 1, "k must be >= 1")
    val key = round(pow(fraction(id), lit(1.0) / weight.cast("double")) *
      lit(1000000.0)) / lit(1000000.0)
    TopK.perGroup(df.filter(weight > 0).withColumn("key", key),
      group, col("key").desc, id, k)
  }

  /**
   * Deterministic fractional UPSAMPLING — rates above 1 (the ">1
   * epoch" side of mixture training, where a small high-quality
   * source repeats while web bulk subsamples): each row emits
   * `⌊rate⌋ + (fraction(id) < rate − ⌊rate⌋ ? 1 : 0)` copies, tagged
   * `epoch = 0..n−1` so downstream shuffling/sharding can spread the
   * copies (feed `concat(id, '#', epoch)` as the export/packing key).
   * Rates below 1 degenerate to [[uniform]] exactly (same coordinate,
   * same kept set — a mixture plan can move a source across 1.0
   * without re-shuffling which rows it keeps). The expected copy
   * count is exactly `rate`; determinism means re-runs and engines
   * agree on WHICH rows got the extra copy.
   *
   * Scale shape: a pure scan projection + bounded explode (`⌈rate⌉`
   * elements) — no shuffle, no state.
   */
  def repeatWeighted(df: DataFrame, id: Column, rate: Column): DataFrame = {
    val r = rate.cast("double")
    val copies = (floor(r).cast("long") +
      when(fraction(id) < r - floor(r), 1L).otherwise(0L)).as("__n")
    df.withColumn("__n", copies)
      .filter(col("__n") > 0)
      .withColumn("epoch", explode(sequence(lit(0L), col("__n") - 1)))
      .drop("__n")
  }

  /**
   * Per-group document cap (per-domain / per-source caps of web
   * pipelines): keep at most `caps(group)` rows per group — the
   * deterministic hash-ordered first N, so re-runs and engines agree
   * on WHICH rows survive, and raising a cap only adds rows.
   * Exactly [[tokenBudget]] with unit weight, inheriting its
   * bucketed no-giant-window scale shape.
   */
  def groupCap(df: DataFrame, id: Column, group: Column,
      caps: Map[String, Long], default: Long = 0L): DataFrame =
    tokenBudget(df, id, group, lit(1L), caps, default)

  /**
   * Token-budget mixture sampling (the data-mixing step of a training
   * build): per group (language / source / domain), keep the
   * deterministic hash-ordered prefix of rows whose `weight` (token
   * or char count) fills the group's budget — a row is kept iff the
   * weights of all rows BEFORE it in (hash, id) order sum below the
   * budget, so the boundary row is included and the selection is
   * exactly reproducible by any engine with md5 (the oracle's window
   * recomputes it). Like [[stratified]], selections are NESTED:
   * raising a budget only adds rows, never replaces them.
   *
   * Scale shape (the reason this is not one window over the corpus):
   * a per-group window is a single partition per group — at 100 TB a
   * group is billions of rows through one task. Instead the hash
   * space is cut into 4096 ordered buckets:
   *
   *  1. per-(group, bucket) weight sums — map-side partial agg, the
   *     shuffle carries ≤ |groups|·4096 rows;
   *  2. running bucket prefix-sums over that TINY frame (the only
   *     per-group window, ≤4096 rows per group), broadcast back;
   *  3. rows in buckets wholly past the budget are FILTERED OUT
   *     before any shuffle — what survives is ≈ the selected prefix,
   *     so the exact within-bucket window (partitioned by
   *     (group, bucket), each ~1/4096 of a group) shuffles only
   *     ~budget-sized data, not the corpus.
   *
   * Weights sum as LONGs — no float summation-order sensitivity in
   * the kept-set boundary.
   */
  /**
   * Mixture-budget planning: turn a TARGET mixture (per-group shares
   * of a total token budget) into the per-group budgets
   * [[tokenBudget]] consumes, reconciled against what each group can
   * actually supply. `budget = min(floor(total · share), available)`
   * — a group short of its target share contributes what it has (the
   * shortfall is reported, not silently redistributed: redistribution
   * policy is a caller decision), and groups outside the target map
   * get zero. One map-side-combined aggregate over the corpus; the
   * arithmetic is integer/floor so any engine reproduces the plan.
   */
  def mixtureBudgets(df: DataFrame, group: Column, weight: Column,
      totalBudget: Long, targetShares: Map[String, Double]): DataFrame = {
    require(totalBudget >= 0, "totalBudget must be >= 0")
    require(targetShares.values.forall(s => s >= 0 && s <= 1),
      "shares must be in [0, 1]")
    val share = targetShares.foldLeft(lit(0.0)) { case (acc, (g, s)) =>
      when(col("source") === lit(g), lit(s)).otherwise(acc)
    }
    df.groupBy(group.as("source"))
      .agg(sum(weight.cast("long")).as("available"))
      .withColumn("target",
        floor(lit(totalBudget.toDouble) * share).cast("long"))
      .withColumn("budget", least(col("target"), col("available")))
      .withColumn("shortfall", col("target") - col("budget"))
  }

  /**
   * Temperature-flattened mixture planning (the multilingual-sampling
   * rebalance, cf. XLM-R: `p_i ∝ q_i^α` with α < 1 upweights
   * low-resource groups): per-group budgets proportional to
   * `√available` — α = 0.5, the canonical flattening — reconciled
   * against supply exactly like [[mixtureBudgets]]. The fixed α is
   * what buys ENGINE-EXACT arithmetic: `⌊√n⌋` is deterministic in
   * IEEE doubles (sqrt is correctly rounded; weights ≤ 2⁵² hold to
   * ~4.5e15 tokens per group), so shares are a ratio of exact LONG
   * sums and `target = (totalBudget · ⌊√a_i⌋) div Σ⌊√a_j⌋` is pure
   * integer — no float mixture share anywhere near a floor boundary.
   * For other temperatures, compute driver-side shares and feed
   * [[mixtureBudgets]]. One map-side-combined aggregate; the totals
   * ride a broadcast 1-row frame.
   */
  def temperatureBudgets(df: DataFrame, group: Column, weight: Column,
      totalBudget: Long): DataFrame = {
    require(totalBudget >= 0, "totalBudget must be >= 0")
    val avail = df.groupBy(group.as("source"))
      .agg(sum(weight.cast("long")).as("available"))
      .withColumn("__isq",
        floor(sqrt(col("available").cast("double"))).cast("long"))
    val tot = avail.agg(sum(col("__isq")).as("__tot"))
    avail.crossJoin(broadcast(tot))
      .withColumn("target", when(col("__tot") > 0,
        graft.functions.ldiv(
          (lit(totalBudget).cast("decimal(38,0)") * col("__isq"))
            .cast("decimal(38,0)"), col("__tot"))).otherwise(lit(0L)))
      .withColumn("budget", least(col("target"), col("available")))
      .withColumn("shortfall", col("target") - col("budget"))
      .drop("__isq", "__tot")
  }

  /**
   * Small-group suppression — the k-anonymity gate before an export:
   * rows whose quasi-identifier combination (the `keys` columns)
   * occurs fewer than `minSize` times are dropped, so no released
   * group is small enough to single out an individual/source. The
   * standard pre-release privacy screen for grouped corpus stats and
   * per-source exports; emits the surviving rows unchanged plus
   * `group_size` for audit.
   *
   * Scale shape: one map-side-combined count per key combination,
   * joined back (AQE broadcasts the count frame when the key space
   * is small); rows with a NULL in any key column never match the
   * count join and are suppressed too — a null quasi-identifier is
   * its own singleton class.
   */
  def suppressSmallGroups(df: DataFrame, keys: Seq[String],
      minSize: Long): DataFrame = {
    require(keys.nonEmpty, "keys must be non-empty")
    require(minSize >= 1, "minSize must be >= 1")
    val counts = df.groupBy(keys.map(col): _*)
      .agg(count(lit(1)).as("group_size"))
      .filter(col("group_size") >= minSize)
    df.join(counts, keys)
  }

  /**
   * Training-mixture planner — the data-recipe calculation a corpus
   * build runs LAST: given per-source available tokens (one
   * aggregate scan), target mixture weights (ppm of the budget), a
   * total token budget, and an epoch cap, emit per source:
   * `target_tokens` (the weight's share of the budget),
   * `plan_tokens` (target capped at `maxEpochs` passes over the
   * source — the repetition ceiling the data-diet literature keeps),
   * `rate_ppm` (plan/available — ≤ 10⁶ feeds [[sample]]'s rate,
   * > 10⁶ is fractional epochs for [[upsample]]), and
   * `shortfall_tokens` (what the cap refuses — the number that says
   * "find more of this source or re-weight"). All integer-exact
   * truncating arithmetic (`ldiv`), so the plan is
   * engine-reproducible and auditable; sources without a declared
   * weight plan 0 (present in the output with their inventory), and
   * DECLARED sources absent from the corpus still emit their row
   * (avail 0, full shortfall) — the "find more of this source"
   * signal must not vanish exactly when the source is missing.
   * Everything after the one avail aggregate is a constant-folded
   * projection over ≤ |sources| rows.
   */
  def mixturePlan(df: DataFrame, source: Column, text: Column,
      weightsPpm: Map[String, Long], budgetTokens: Long,
      maxEpochsMicro: Long = 4000000L): DataFrame = {
    val avail = df.groupBy(source.as("source"))
      .agg(sum(size(TextOps.tokens(text)).cast("long")).as("avail_tokens"))
    mixturePlanFromInventory(avail, weightsPpm, budgetTokens,
      maxEpochsMicro)
  }

  /** [[mixturePlan]] off a prebuilt per-source token INVENTORY
   * (`(source, avail_tokens)`) — identical plan, none of the corpus
   * scan. The inventory is a plain per-source sum, so it merges
   * exactly across splits/batches (the wordTypeHistogram artifact
   * discipline): a standing stream keeps one current per micro-batch
   * ([[graft.streaming.SeriesStream.mixtureInventoryStream]]) and a
   * 100-TB corpus re-plans its mixture with zero corpus scans. */
  def mixturePlanFromInventory(inventory: DataFrame,
      weightsPpm: Map[String, Long], budgetTokens: Long,
      maxEpochsMicro: Long = 4000000L): DataFrame = {
    require(budgetTokens >= 0, "budgetTokens must be >= 0")
    require(maxEpochsMicro >= 0, "maxEpochsMicro must be >= 0")
    require(weightsPpm.values.forall(_ >= 0), "weights must be >= 0")
    import graft.functions.ldiv
    val spark = inventory.sparkSession
    import spark.implicits._
    val declared = weightsPpm.keys.toSeq.sorted.toDF("source")
    val inv = inventory.select(col("source"),
        col("avail_tokens").cast("long").as("avail_tokens"))
      .join(declared, Seq("source"), "full_outer")
      .na.fill(0L, Seq("avail_tokens"))
    val wCol = weightsPpm.toSeq.sortBy(_._1).foldLeft(lit(0L)) {
      case (acc, (k, w)) =>
        when(col("source") === lit(k), lit(w)).otherwise(acc)
    }
    inv
      .withColumn("weight_ppm", wCol)
      .withColumn("target_tokens",
        ldiv(col("weight_ppm") * lit(budgetTokens), lit(1000000L)))
      .withColumn("plan_tokens", least(col("target_tokens"),
        ldiv(col("avail_tokens") * lit(maxEpochsMicro), lit(1000000L))))
      .withColumn("rate_ppm",
        when(col("avail_tokens") > 0,
          ldiv(col("plan_tokens") * lit(1000000L), col("avail_tokens")))
          .otherwise(lit(0L)))
      .withColumn("shortfall_tokens",
        col("target_tokens") - col("plan_tokens"))
  }

  /** Apply a [[mixturePlan]] to a document frame: per-source
   * `rate_ppm` admission through [[repeatWeighted]] — sources above
   * 1.0 repeat (epoch-tagged copies), sources below subsample, and
   * the kept set is id-hash deterministic, so applying the SAME plan
   * to the same docs — batch or streamed, once or replayed — admits
   * bit-identical rows. Undeclared sources (no plan row) drop. The
   * plan is |sources|-bounded, so it broadcasts. */
  def applyMixture(docs: DataFrame, id: Column, source: Column,
      plan: DataFrame): DataFrame =
    repeatWeighted(
      docs.withColumn("__src", source)
        .join(broadcast(plan.select(col("source").as("__src"),
          col("rate_ppm"))), Seq("__src"))
        .drop("__src"),
      id, col("rate_ppm").cast("double") / lit(1000000.0))
      .drop("rate_ppm")

  def tokenBudget(df: DataFrame, id: Column, group: Column, weight: Column,
      budgets: Map[String, Long], default: Long = 0L): DataFrame = {
    require((default +: budgets.values.toSeq).forall(_ >= 0),
      "budgets must be >= 0")
    val budgetOf: Column => Column = g => budgets.foldLeft(lit(default)) {
      case (acc, (k, b)) => when(g === lit(k), lit(b)).otherwise(acc)
    }
    val base = df
      .withColumn("_h", graft.functions.Hash60Expr.hash60(id.cast("string")))
      .withColumn("_grp", group)
      .withColumn("_w", weight.cast("long"))
      .withColumn("_bkt", shiftright(col("_h"), 48)) // 4096 hash-range buckets
    val bucketPrefix = base.groupBy(col("_grp"), col("_bkt"))
      .agg(sum(col("_w")).as("_bsum"))
      .withColumn("_bbefore", coalesce(
        sum(col("_bsum")).over(Window.partitionBy(col("_grp"))
          .orderBy(col("_bkt")).rowsBetween(Window.unboundedPreceding, -1)),
        lit(0L)))
      .select(col("_grp"), col("_bkt"), col("_bbefore"))
    val inBucket = Window.partitionBy(col("_grp"), col("_bkt"))
      .orderBy(col("_h"), id).rowsBetween(Window.unboundedPreceding, -1)
    base
      .join(broadcast(bucketPrefix), Seq("_grp", "_bkt"))
      // whole-bucket prune: buckets past the boundary never reach the
      // exact window below — the window's input is ~the selected set
      .filter(col("_bbefore") < budgetOf(col("_grp")))
      .withColumn("_before",
        col("_bbefore") + coalesce(sum(col("_w")).over(inBucket), lit(0L)))
      .filter(col("_before") < budgetOf(col("_grp")))
      .drop("_h", "_grp", "_w", "_bkt", "_bbefore", "_before")
  }
}
