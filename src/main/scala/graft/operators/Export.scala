package graft.operators

import org.apache.spark.sql.{Column, DataFrame, DataFrameWriter, Row}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/**
 * Deterministic export sharding: the "global shuffle" step that turns
 * a curated corpus into N training shards whose contents AND order are
 * a pure function of the row ids — so re-running the export (on any
 * engine, any cluster layout, after any upstream re-partitioning)
 * produces byte-identical shards, and a dataloader seeking shard `s`
 * position `p` always finds the same document. The shuffle coordinate
 * is the same 60-bit md5 every sampling decision uses
 * ([[Sampling.fraction]]), so shard membership is also independent of
 * (and uncorrelated with) any sample/split taken upstream.
 */
object Export {

  /**
   * Shard assignment + within-shard position: `shard = h mod n`,
   * `pos` = rank of `h` within the shard (ties — 60-bit md5
   * collisions — break by id). Hash-ordering within the shard IS the
   * deterministic shuffle: adjacent corpus rows land far apart.
   *
   * Scale shape: the per-shard `row_number` window is the export
   * format's own requirement (each shard is written in order), and a
   * shard is sized `corpus / n` BY CONSTRUCTION — at 100 TB you pick
   * `n` so a shard is a file-sized unit (thousands of shards), which
   * makes each window partition one output file's worth of rows:
   * exactly the `repartition(n) + sortWithinPartitions` shape of the
   * physical write in [[writeShards]].
   */
  def shards(df: DataFrame, id: Column, n: Int): DataFrame = {
    require(n >= 1, "need at least one shard")
    val h = graft.functions.Hash60Expr.hash60(id.cast("string"))
    df.select(id.as("doc_id"), h.as("_h"))
      .withColumn("shard", pmod(col("_h"), lit(n.toLong)).cast("int"))
      .withColumn("pos", row_number().over(
        Window.partitionBy(col("shard")).orderBy(col("_h"), col("doc_id"))) - 1)
      .drop("_h")
  }

  /**
   * Per-shard export manifest: the checksum/accounting sidecar a
   * released dataset ships next to its shards — doc counts, token and
   * byte volumes, and an order-free content checksum per shard, so a
   * consumer (or a later re-export) can verify shard integrity without
   * re-reading payloads. One map-side-combined groupBy over the same
   * shard assignment [[shards]]/[[writeShards]] compute — no window,
   * no sort.
   *
   * The checksum is `Σ hash60(id || ':' || fingerprint) mod 2⁶¹−1`
   * per shard — order-free LONG addition (mod a Mersenne prime keeps
   * the sum in-range at any shard size), so any engine that can md5
   * reproduces it: a re-run that drops, duplicates, or alters one row
   * moves the sum with probability ~1.
   */
  def manifest(df: DataFrame, id: Column, text: Column, n: Int): DataFrame = {
    require(n >= 1, "need at least one shard")
    val h = graft.functions.Hash60Expr.hash60(id.cast("string"))
    val rowSum = graft.functions.Hash60Expr.hash60(
      concat(id.cast("string"), lit(":"), TextOps.fingerprint(text)))
    df.select(pmod(h, lit(n.toLong)).cast("int").as("shard"),
        text.as("__t"), rowSum.as("__rh"))
      .groupBy(col("shard"))
      .agg(count(lit(1)).as("n_docs"),
        sum(size(TextOps.tokens(col("__t"))).cast("long")).as("n_tokens"),
        sum(length(col("__t")).cast("long")).as("n_chars"),
        // DECIMAL sum: a LONG sum of 60-bit values overflows (ANSI
        // throws) beyond a handful of rows; decimal is exact to 1e38
        pmod(sum(col("__rh").cast("decimal(38,0)")),
          lit(2305843009213693951L).cast("decimal(38,0)"))
          .cast("long").as("checksum"))
  }

  /**
   * The physical write path: one task per shard, rows pre-sorted in
   * the deterministic (hash, id) order — no driver involvement, no
   * global sort. Returns the writer so callers pick format/path:
   * `Export.writeShards(df, $"doc_id", 1024).parquet(out)`.
   */
  def writeShards(df: DataFrame, id: Column, n: Int): DataFrameWriter[Row] = {
    require(n >= 1, "need at least one shard")
    val h = graft.functions.Hash60Expr.hash60(id.cast("string"))
    df.withColumn("_h", h)
      .withColumn("shard", pmod(col("_h"), lit(n.toLong)).cast("int"))
      .repartition(n, col("shard"))
      // the partitionBy writer REQUIRES task rows ordered by the
      // partition column and inserts its own (unstable) sort when they
      // aren't — which could silently scramble the (hash, id) order.
      // Leading the sort with `shard` satisfies the writer's required
      // ordering exactly, so no extra sort is inserted and every
      // shard file is written in the deterministic (hash, id) order.
      .sortWithinPartitions(col("shard"), col("_h"), id)
      .drop("_h")
      .write.partitionBy("shard")
  }

  /**
   * Deterministic PER-EPOCH shuffle of packed training windows:
   * training runs want a DIFFERENT global order each epoch that is
   * still restartable — rank every window by
   * `hash60(seed ‖ ':' ‖ seq)` and lay the ranks out as
   * (shard, pos), so epoch e's order is a pure function of
   * (seed_e, window ids): different seeds give independent
   * permutations, the same seed reproduces the epoch byte-for-byte
   * on any engine/cluster/partitioning, and a resumed run seeks
   * (shard, pos) to exactly where it stopped. Every window appears
   * exactly once per epoch (the rank is a permutation — ties on the
   * 60-bit hash break by `seq`).
   *
   * Same scale shape as [[shards]]: shard-partitioned rank windows,
   * each `windows / n` rows by construction — pick `n` at file-unit
   * granularity and the physical write is
   * `repartition(n) + sortWithinPartitions` exactly.
   */
  def epochShuffle(windows: DataFrame, seq: Column, seed: Long,
      n: Int): DataFrame = {
    require(n >= 1, "need at least one shard")
    val h = graft.functions.Hash60Expr.hash60(
      concat(lit(seed.toString), lit(":"), seq.cast("string")))
    windows.select(seq.as("seq"), h.as("_h"))
      .withColumn("shard", pmod(col("_h"), lit(n.toLong)).cast("int"))
      .withColumn("pos", row_number().over(
        Window.partitionBy(col("shard"))
          .orderBy(col("_h"), col("seq"))) - 1)
      .drop("_h")
  }

  /**
   * The physical write path for [[epochShuffle]] — [[writeShards]]'
   * discipline for the per-epoch order: one task per shard, windows
   * pre-sorted in the epoch's (hash, seq) order, `partitionBy` sees
   * rows already ordered by the partition column so no writer-side
   * sort is inserted. Callers pick format/path:
   * `Export.writeEpoch(wins, $"seq", seed, 1024).parquet(out)` —
   * re-running with the same seed writes byte-identical shard files.
   */
  def writeEpoch(windows: DataFrame, seq: Column, seed: Long,
      n: Int): DataFrameWriter[Row] = {
    require(n >= 1, "need at least one shard")
    val h = graft.functions.Hash60Expr.hash60(
      concat(lit(seed.toString), lit(":"), seq.cast("string")))
    windows.withColumn("_h", h)
      .withColumn("shard", pmod(col("_h"), lit(n.toLong)).cast("int"))
      .repartition(n, col("shard"))
      .sortWithinPartitions(col("shard"), col("_h"), seq)
      .drop("_h")
      .write.partitionBy("shard")
  }

  /**
   * RANGE-partitioned shard assignment — [[shards]]' hash layout
   * randomizes for training; this layout CLUSTERS by a sort key
   * (length, timestamp, score) so each shard's files carry tight
   * zone-map min/max and a range scan touches one shard — the
   * length-bucketed-serving / curriculum-ordering counterpart.
   * Assignment is the EXACT 0-based rank read off the (key, count)
   * histogram: `shard = ⌊rank·n / total⌋`, ties share a rank and
   * therefore a shard, so shard key-ranges never overlap and the
   * boundaries are engine-reproducible integers (no sampling-based
   * RangePartitioner nondeterminism). The corpus collapses to the
   * histogram FIRST ([[graft.operators.CorpusStats.quantiles]]'
   * argument): the ordered window runs over distinct KEYS, not rows —
   * exact for discrete keys; bin continuous ones first (or grid them
   * with the quantile sketch).
   */
  def rangedShards(df: DataFrame, id: Column, key: Column,
      n: Int): DataFrame = {
    // cast FIRST, then null-filter: a non-null key that fails the
    // long cast (a non-numeric string) must be excluded the same way
    // a null is — filtering on the raw key would let it through to
    // the equi-join with a null __k, where it silently vanishes with
    // no accounting ([[rangedCuts]] applies the identical rule, so
    // assignment and [[rangedShardStats]] agree row-for-row)
    df.withColumn("__k", key.cast("long")).filter(col("__k").isNotNull)
      .join(broadcast(rangedCuts(df, key, n)
        .select(col("k").as("__k"), col("shard"))), Seq("__k"))
      .select(id.as("doc_id"), col("__k").as("key"), col("shard"))
  }

  /** Per-shard accounting for [[rangedShards]]: row count and the
   * key range each shard covers — computed off the histogram alone
   * (no row join), so the audit costs one distinct-key pass. */
  def rangedShardStats(df: DataFrame, key: Column, n: Int): DataFrame =
    rangedCuts(df, key, n)
      .groupBy(col("shard"))
      .agg(sum(col("c")).as("n_docs"), min(col("k")).as("min_key"),
        max(col("k")).as("max_key"))

  /**
   * Post-takedown manifest for PACKED WINDOW layouts — the
   * densitometer [[graft.operators.Packing.windowsTakedown]] leaves
   * the curator without: takedown drops whole windows and leaves
   * `seq` holes a dataloader must skip, and nothing in the windows
   * frame says how degraded each shard-range has become or proves
   * which windows survived unchanged. One row per `windowsPerShard`-
   * window coordinate range (the same contiguous ranges
   * [[graft.operators.Packing.shardAssignments]] schedules writers
   * over):
   *
   *  - `expected_windows` (the range's size in the ORIGINAL layout,
   *    from `totalWindows` — the pre-takedown window count the
   *    curator has from the pack step), `n_windows` surviving,
   *    `holes`, and `hole_density_micro = ⌊holes·10⁶/expected⌋`.
   *  - `n_tokens`: surviving token volume.
   *  - `checksum`: order-free `Σ hash60(seq‖':'‖n_tokens‖':'‖
   *    span_sum) mod 2⁶¹−1` over surviving windows, where `span_sum`
   *    is the doc-span fold `Σ doc_id·(start+len)` — so a re-read
   *    proves the survivors are the SAME windows at the SAME
   *    coordinates with the SAME doc composition, without re-hashing
   *    token payloads (the spans trace is the takedown unit, so it
   *    is also the right integrity unit). Shards whose every window
   *    dropped still emit their row (holes = expected, null
   *    checksum).
   *
   * REPACK THRESHOLD (the documented trigger for the from-scratch
   * [[graft.operators.Packing.packSequences]] rebuild): repack when
   * global hole density exceeds ~20% (⌊Σholes·10⁶/Σexpected⌋ >
   * 200000) or any single shard exceeds ~50% — below that, skipping
   * holes costs a dataloader a seek per hole and the layout keeps
   * its coordinates; above it, most of every shard read is waste and
   * the per-shard accounting here no longer amortizes the scan. The
   * thresholds are operational (seek overhead vs rebuild cost), not
   * statistical — a compliance-driven takedown of any size is
   * already complete once the windows are dropped.
   *
   * Scale shape: one map-side-combined rollup over (window → shard
   * range) rows — the span fold is per-window, nothing shuffles but
   * the ≤ totalWindows/windowsPerShard summary rows; the shard
   * skeleton is a `spark.range` of that same size.
   */
  def windowsManifest(windows: DataFrame, totalWindows: Long,
      windowsPerShard: Long): DataFrame = {
    require(windowsPerShard > 0, "windowsPerShard must be > 0")
    require(totalWindows >= 0, "totalWindows must be >= 0")
    require(windows.columns.contains("doc_spans"),
      "windowsManifest needs the doc_spans trace (materialize windows " +
        "with the span-carrying overload) — it is the takedown unit, " +
        "so it is the integrity unit too")
    val nShards = (totalWindows + windowsPerShard - 1) / windowsPerShard
    val spanSum = aggregate(col("doc_spans"), lit(0L), (a, x) =>
      a + x.getField("doc_id") * (x.getField("start") + x.getField("len")))
    val rh = graft.functions.Hash60Expr.hash60(concat(
      col("seq").cast("string"), lit(":"), col("n_tokens").cast("string"),
      lit(":"), col("__ss").cast("string")))
    val perShard = windows
      .select(col("seq"), col("n_tokens"), spanSum.as("__ss"))
      .select(graft.functions.ldiv(col("seq"), lit(windowsPerShard))
          .as("shard"),
        col("n_tokens"), rh.as("__rh"))
      .groupBy(col("shard"))
      .agg(count(lit(1)).as("n_windows"),
        sum(col("n_tokens")).as("n_tokens"),
        // same DECIMAL-exact mod-Mersenne sum as [[manifest]]
        pmod(sum(col("__rh").cast("decimal(38,0)")),
          lit(2305843009213693951L).cast("decimal(38,0)"))
          .cast("long").as("checksum"))
    val skeleton = windows.sparkSession.range(nShards)
      .select(col("id").as("shard"),
        (least(lit(totalWindows), (col("id") + 1) * windowsPerShard) -
          col("id") * windowsPerShard).as("expected_windows"))
    skeleton.join(perShard, Seq("shard"), "left")
      .select(col("shard"), col("expected_windows"),
        coalesce(col("n_windows"), lit(0L)).as("n_windows"),
        (col("expected_windows") - coalesce(col("n_windows"), lit(0L)))
          .as("holes"),
        graft.functions.ldiv(
          (col("expected_windows") - coalesce(col("n_windows"), lit(0L))) *
            lit(1000000L), col("expected_windows"))
          .as("hole_density_micro"),
        coalesce(col("n_tokens"), lit(0L)).as("n_tokens"),
        col("checksum"))
  }

  private def rangedCuts(df: DataFrame, key: Column, n: Int): DataFrame = {
    require(n >= 1, "need at least one shard")
    // same cast-then-filter rule as [[rangedShards]]: uncastable keys
    // leave the histogram too, so stats never count a row the
    // assignment dropped
    val hist = df.select(key.cast("long").as("k"))
      .filter(col("k").isNotNull)
      .groupBy(col("k")).agg(count(lit(1)).as("c"))
    val tot = hist.agg(coalesce(sum(col("c")), lit(0L)).as("t"))
    hist
      .withColumn("hi", sum(col("c")).over(Window.orderBy(col("k"))))
      .withColumn("lo", col("hi") - col("c"))
      .crossJoin(broadcast(tot))
      .withColumn("shard",
        graft.functions.ldiv(col("lo") * lit(n.toLong), col("t"))
          .cast("int"))
      .select(col("k"), col("c"), col("shard"))
  }
}
