package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.functions.ldiv

/**
 * Graph centrality over an edge frame: PageRank (Page et al., 1999)
 * as a fixed-iteration, join-based computation — the link-analysis
 * pass of a web-crawl curation pipeline (rank pages before filtering)
 * and the generic "which node matters" statistic for any
 * transition/citation/co-occurrence graph a corpus build derives.
 *
 * Determinism across engines is the design constraint (the oracle is
 * a different engine): ALL arithmetic is integer. Rank mass lives in
 * units of `1/scale` (default 1e-12); edge transition probabilities
 * are pre-normalized to integer micro-fractions
 * (`ew = (w · 10⁶) div outw(src)`, computed ONCE); every division is
 * a floor on non-negative longs, which every engine reproduces
 * bit-exactly. Floors leak a little mass per iteration — the ranking
 * is unaffected and the leak is the price of cross-engine hash
 * equality (float summation order would differ).
 *
 * Overflow bounds (documented, `require`-checked where cheap):
 * `pr ≤ scale ≤ 1e12`, `ew ≤ 1e6`, so the per-edge product
 * `pr·ew ≤ 1e18 < 2⁶³`; `w·10⁶` holds to ~9.2e12 edges per src —
 * comfortably past a 100 TB corpus graph.
 *
 * Scale shape: one group-by to collapse raw edges, one to compute
 * out-weights; each iteration is edges ⋈ ranks on `src` (both sides
 * partitioned by the join key; AQE broadcasts the rank frame when
 * |nodes| is small) followed by a map-side-combined sum per `dst`.
 * Ranks `localCheckpoint` per round (the [[Dedup.clusters]]
 * discipline) so lineage stays flat; the dangling mass is the one
 * driver scalar per round — O(1) data, same as k-means' moved-count.
 * Nothing corpus-sized ever sits in driver memory.
 */
object Graphs {

  /**
   * `edges`: one row per edge occurrence (or pre-weighted via
   * repetition); multi-edges aggregate by count. Self-loops are legal
   * and count toward out-weight. Returns (node, pr) with `pr` the
   * integer rank in `1/scale` units — `pr/scale` sums to ≤ 1 (floor
   * leak) and starts uniform.
   */
  /**
   * HITS hubs-and-authorities (Kleinberg, JACM 1999): the two-score
   * complement of [[pagerank]] for directed graphs where "points at
   * good things" (hub) and "is pointed at by good hubs" (authority)
   * are distinct qualities — link curation, citation analysis,
   * crawler seed selection. Fixed `iterations` of the mutual
   * recursion, edge multiplicity as weight.
   *
   * Portability construction (different from pagerank's, deliberately:
   * HITS normalizes GLOBALLY per step, so per-edge pre-normalization
   * can't bound the products): per-step sums accumulate in
   * DECIMAL(38,0) — exact, order-free, no overflow to ~1e38 — and
   * re-normalize to integer `scale` units via integral division
   * (`div`/`//`, floor on non-negatives in every engine). Scores stay
   * LONGs ≤ scale between steps; the per-step total is a broadcast
   * 1-row frame folded into the normalize step — no driver round-trip.
   * Bound: Σ(score·w) per step ≤ scale · total-edge-weight ≤ 1e38 ⇒
   * fine to ~1e14 weighted edges at the default scale.
   *
   * Scale shape: per iteration, two edges⋈scores equi-joins (src then
   * dst) each followed by a map-side-combined sum — identical exchange
   * structure to one pagerank round, run twice. Nodes without
   * in-edges (resp. out-edges) get authority (resp. hub) 0, exactly
   * as the oracle's left join + coalesce does.
   */
  def hits(edges: DataFrame, src: Column, dst: Column,
      iterations: Int = 3, scale: Long = 1000000000000L): DataFrame = {
    require(iterations >= 1, "iterations must be >= 1")
    require(scale >= 1 && scale <= 1000000000000L, "scale in [1, 1e12]")
    val e = edges.select(src.cast("string").as("src"),
        dst.cast("string").as("dst"))
      .groupBy(col("src"), col("dst")).agg(count(lit(1)).as("w"))
      .localCheckpoint() // re-joined twice per iteration
    val nodes = e.select(col("src").as("node"))
      .union(e.select(col("dst").as("node"))).distinct()
      .localCheckpoint()
    val n = nodes.count()
    // no edges ⇒ no nodes: an empty (node, auth, hub) frame, not a
    // division-by-zero on the uniform init
    if (n == 0)
      return nodes.select(col("node"), lit(0L).as("auth"), lit(0L).as("hub"))
    // normalize a raw DECIMAL score column to LONG scale units:
    // (raw * scale) div total — floor, identical in any engine. The
    // per-step total rides as a broadcast 1-row frame crossJoined into
    // the normalize select, NOT a driver .head — the only per-step
    // barrier is the localCheckpoint itself
    def norm(raw: Column, total: Column): Column =
      coalesce(ldiv((raw.cast("decimal(38,0)") * lit(scale))
        .cast("decimal(38,0)"), total), lit(0L))
    var hub = nodes.withColumn("hub", lit(scale / n)).localCheckpoint()
    var auth = nodes.withColumn("auth", lit(scale / n))
    var k = 0
    while (k < iterations) {
      val araw = e.join(hub.withColumnRenamed("node", "src"), "src")
        .groupBy(col("dst").as("node"))
        .agg(sum(col("hub").cast("decimal(38,0)") * col("w")).as("ar"))
      auth = nodes.join(araw, Seq("node"), "left")
        .crossJoin(broadcast(araw.agg(sum(col("ar")).as("__atot"))))
        .select(col("node"), norm(col("ar"), col("__atot")).as("auth"))
        .localCheckpoint()
      val hraw = e.join(auth.withColumnRenamed("node", "dst"), "dst")
        .groupBy(col("src").as("node"))
        .agg(sum(col("auth").cast("decimal(38,0)") * col("w")).as("hr"))
      hub = nodes.join(hraw, Seq("node"), "left")
        .crossJoin(broadcast(hraw.agg(sum(col("hr")).as("__htot"))))
        .select(col("node"), norm(col("hr"), col("__htot")).as("hub"))
        .localCheckpoint()
      k += 1
    }
    nodes.join(auth, "node").join(hub, "node")
      .select(col("node"), col("auth"), col("hub"))
  }

  def pagerank(edges: DataFrame, src: Column, dst: Column,
      iterations: Int = 4, dampingPct: Int = 85,
      scale: Long = 1000000000000L): DataFrame = {
    require(iterations >= 1, "iterations must be >= 1")
    require(dampingPct >= 0 && dampingPct <= 100, "dampingPct in [0,100]")
    require(scale >= 1 && scale <= 1000000000000L,
      "scale in [1, 1e12] (pr*ew must stay under 2^63)")
    val e = edges.select(src.cast("string").as("src"),
        dst.cast("string").as("dst"))
      .groupBy(col("src"), col("dst")).agg(count(lit(1)).as("w"))
    val outw = e.groupBy(col("src")).agg(sum(col("w")).as("ow"))
    // per-edge µ-transition-probability, fixed for all iterations —
    // pre-dividing caps the per-iteration product at pr·1e6 no matter
    // how heavy the edge, which is what makes LONG arithmetic safe at
    // any corpus size
    val ew = e.join(outw, "src")
      .select(col("src"), col("dst"),
        ldiv(col("w") * lit(1000000L), col("ow")).as("ew"))
      .localCheckpoint() // re-joined every iteration
    val nodes = e.select(col("src").as("node"))
      .union(e.select(col("dst").as("node"))).distinct()
      .localCheckpoint() // re-joined every iteration
    val n = nodes.count()
    // no edges ⇒ no nodes: empty result, not a division-by-zero
    if (n == 0) return nodes.select(col("node"), lit(0L).as("pr"))
    val dangling = nodes.join(e.select(col("src").as("node")).distinct(),
        Seq("node"), "left_anti")
      .localCheckpoint() // dangling-mass probe every iteration
    val base = ((100L - dampingPct) * (scale / n)) / 100L
    var pr = nodes.withColumn("pr", lit(scale / n)).localCheckpoint()
    var k = 0
    while (k < iterations) {
      // dangling nodes donate their mass uniformly. The mass rides as
      // a broadcast 1-row frame crossJoined into the update select
      // (same construction as hits' norm total), NOT a driver .head —
      // the only per-iteration barrier is the localCheckpoint itself.
      // Integer shape mirrors the old driver math exactly:
      // (dampingPct * (dm div n)) div 100, all on non-negative LONGs.
      val dmF = broadcast(pr.join(dangling, Seq("node"), "left_semi")
        .agg(coalesce(sum(col("pr")), lit(0L)).as("__dm")))
      val contrib = ew.join(pr.withColumnRenamed("node", "src"), "src")
        .groupBy(col("dst").as("node"))
        .agg(sum(ldiv(col("pr") * col("ew"), 1000000L)).as("c"))
      pr = nodes.join(contrib, Seq("node"), "left")
        .crossJoin(dmF)
        .select(col("node"),
          (lit(base) +
            ldiv(lit(dampingPct.toLong) * ldiv(col("__dm"), n), 100L) +
            ldiv(lit(dampingPct.toLong) * coalesce(col("c"), lit(0L)), 100L))
            .as("pr"))
        .localCheckpoint()
      k += 1
    }
    pr
  }
}
