package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.ldiv

/**
 * Deterministic sequence packing — the last step of a training-data
 * build: lay the cleaned corpus out as one token stream in a
 * reproducible order and cut it into fixed-length training windows.
 * Every doc learns which window its tokens start in, at what offset,
 * and how many windows it spans; a writer task can then materialize
 * any window range independently (shard w knows exactly which docs
 * intersect it), which is what makes the layout resumable and
 * shardable at 100 TB.
 *
 * Stream order is (hash60(id), id) — the same portable coordinate the
 * sampling family uses, so the layout is a pure function of doc ids:
 * stable across runs, engines, partitionings, and appends of later
 * shards.
 *
 * Scale shape, mirroring [[Sampling.tokenBudget]]: the global running
 * sum would be one window over the corpus, so the hash space is cut
 * into 4096 ordered buckets — per-bucket sums partial-aggregate
 * map-side (the shuffle carries ≤4096 rows), the bucket prefix runs
 * on that tiny frame, and the exact within-bucket running sum windows
 * only ~1/4096 of the stream per partition.
 */
object Packing {

  /**
   * Assign each row its position in the packed stream of `seqLen`-unit
   * windows: `start_seq` (window containing the row's first unit),
   * `offset` (position within that window), `n_seqs` (windows the row
   * intersects; 0 for empty rows). Weights are token/char counts and
   * must be >= 0.
   */
  def packSequences(df: DataFrame, id: Column, weight: Column,
      seqLen: Long): DataFrame = {
    require(seqLen > 0, "seqLen must be > 0")
    val base = df
      .withColumn("_h", graft.functions.Hash60Expr.hash60(id.cast("string")))
      .withColumn("_w", weight.cast("long"))
      .withColumn("_bkt", shiftright(col("_h"), 48))
    val bucketPrefix = base.groupBy(col("_bkt"))
      .agg(sum(col("_w")).as("_bsum"))
      .withColumn("_bbefore", coalesce(
        sum(col("_bsum")).over(Window.orderBy(col("_bkt"))
          .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .select(col("_bkt"), col("_bbefore"))
    val inBucket = Window.partitionBy(col("_bkt"))
      .orderBy(col("_h"), id).rowsBetween(Window.unboundedPreceding, -1)
    base
      .join(broadcast(bucketPrefix), Seq("_bkt"))
      .withColumn("_cum",
        col("_bbefore") + coalesce(sum(col("_w")).over(inBucket), lit(0L)))
      .withColumn("start_seq", ldiv(col("_cum"), seqLen))
      .withColumn("offset", col("_cum") - col("start_seq") * seqLen)
      .withColumn("n_seqs", when(col("_w") === 0, lit(0L))
        .otherwise(ldiv(col("_cum") + col("_w") - 1, seqLen) -
          col("start_seq") + 1))
      .drop("_h", "_w", "_bkt", "_bbefore", "_cum")
  }

  /**
   * Writer-task assignment over [[packSequences]]' layout: one row
   * per (shard, doc) for every doc whose token span intersects the
   * shard's window range [shard·windowsPerShard, (shard+1)·
   * windowsPerShard). This is what makes the layout MATERIALIZABLE at
   * 100 TB: shard writer s reads exactly its own assignment slice
   * (ordered by (start_seq, offset) it reconstructs its windows
   * without seeing any other shard's docs), writers run independently
   * and restart independently, and a failed shard re-materializes
   * from the same deterministic assignment. Output size is linear:
   * docs + (total windows)/windowsPerShard boundary repeats. Empty
   * docs (n_seqs = 0) occupy no window and appear in no shard.
   */
  def shardAssignments(packed: DataFrame,
      windowsPerShard: Long): DataFrame = {
    require(windowsPerShard > 0, "windowsPerShard must be > 0")
    packed.filter(col("n_seqs") > 0)
      .withColumn("shard", explode(sequence(
        ldiv(col("start_seq"), windowsPerShard),
        ldiv(col("start_seq") + col("n_seqs") - 1L, windowsPerShard))))
  }

  /**
   * Per-group [[packSequences]]: each group (language, source,
   * curriculum stage) packs into its OWN window stream, so no
   * training window ever mixes groups — the layout a multilingual or
   * staged build actually wants. `start_seq`/`offset`/`n_seqs` are
   * group-local (window w of group g); compose with
   * [[materializeWindows]] per group by filtering, or with
   * [[shardAssignments]] whose shard ids then also become
   * group-local. Same deterministic (hash60(id), id) order and the
   * same 4096-bucket two-level prefix per group — the broadcast
   * prefix frame grows to 4096·|groups| rows (sources/languages:
   * thousands at worst). Rows with a NULL group pack into their own
   * stream (the join is null-safe).
   */
  def packSequencesBy(df: DataFrame, group: Column, id: Column,
      weight: Column, seqLen: Long): DataFrame = {
    require(seqLen > 0, "seqLen must be > 0")
    val base = df
      .withColumn("_g", group)
      .withColumn("_h", graft.functions.Hash60Expr.hash60(id.cast("string")))
      .withColumn("_w", weight.cast("long"))
      .withColumn("_bkt", shiftright(col("_h"), 48))
    val bucketPrefix = base.groupBy(col("_g"), col("_bkt"))
      .agg(sum(col("_w")).as("_bsum"))
      .withColumn("_bbefore", coalesce(
        sum(col("_bsum")).over(Window.partitionBy(col("_g"))
          .orderBy(col("_bkt"))
          .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .select(col("_g").as("_g2"), col("_bkt").as("_bkt2"),
        col("_bbefore"))
    val inBucket = Window.partitionBy(col("_g"), col("_bkt"))
      .orderBy(col("_h"), id).rowsBetween(Window.unboundedPreceding, -1)
    base
      .join(broadcast(bucketPrefix),
        col("_g") <=> col("_g2") && col("_bkt") === col("_bkt2"))
      .withColumn("_cum",
        col("_bbefore") + coalesce(sum(col("_w")).over(inBucket), lit(0L)))
      .withColumn("start_seq", ldiv(col("_cum"), seqLen))
      .withColumn("offset", col("_cum") - col("start_seq") * seqLen)
      .withColumn("n_seqs", when(col("_w") === 0, lit(0L))
        .otherwise(ldiv(col("_cum") + col("_w") - 1, seqLen) -
          col("start_seq") + 1))
      .drop("_g", "_g2", "_h", "_w", "_bkt", "_bkt2", "_bbefore", "_cum")
  }

  /**
   * Materialize [[packSequences]]' layout: the actual training
   * windows, one row per `seq` with its `seqLen` token ids in stream
   * order (the final window may be shorter). `packed` must carry the
   * SAME token array the weights were computed from
   * (`weight = size(tokens)` — the [[packSequences]] call's
   * contract); each doc contributes one slice per window it
   * intersects, and a window reassembles its pieces by stream
   * position. This is the writer step [[shardAssignments]] schedules:
   * filter to one shard's assignment slice and the same code
   * materializes just that shard.
   *
   * Scale shape: one explode to (doc, window)-piece rows (docs +
   * total-windows boundary repeats — linear), ONE shuffle keyed on
   * `seq` to lay the stream out (the unavoidable write shuffle), and
   * every window group is ≤ seqLen tokens by construction, so no
   * reducer ever buffers more than one window.
   */
  def materializeWindows(packed: DataFrame, tokens: Column,
      seqLen: Long): DataFrame =
    materializeWindows(packed, lit(null).cast("long"), tokens, seqLen)
      .drop("doc_spans")

  /**
   * [[materializeWindows]] carrying DOC-BOUNDARY metadata: alongside
   * `token_ids`, each window emits `doc_spans:
   * array<struct<doc_id, start, len>>` — which document contributed
   * tokens `[start, start+len)` of the window, in window order. This
   * is what a trainer needs to build attention masks that stop
   * cross-document attention inside a packed window, and what a
   * takedown trace follows from a training window back to its source
   * docs. Spans tile the window exactly: starts are 0, len₀, len₀+l₁,
   * … and Σ len = n_tokens (PackingSpec pins it).
   *
   * Same plan as the spans-free form — the spans reassemble from the
   * SAME slice explode and the SAME per-window sort, no extra shuffle
   * (the doc id rides the piece struct).
   */
  def materializeWindows(packed: DataFrame, id: Column, tokens: Column,
      seqLen: Long): DataFrame = {
    require(seqLen > 0, "seqLen must be > 0")
    val L = lit(seqLen)
    val pieces = packed.filter(col("n_seqs") > 0)
      .withColumn("__cum", col("start_seq") * L + col("offset"))
      .withColumn("__toks", tokens)
      .withColumn("__did", id)
      .select(
        explode(sequence(col("start_seq"),
          col("start_seq") + col("n_seqs") - 1)).as("seq"),
        col("__cum"), col("__toks"), col("__did"))
      .withColumn("__a",
        greatest(lit(0L), col("seq") * L - col("__cum")))
      .withColumn("__b", least(size(col("__toks")).cast("long"),
        (col("seq") + 1) * L - col("__cum")))
      .withColumn("pos", greatest(lit(0L), col("__cum") - col("seq") * L))
      .select(col("seq"), col("pos"),
        slice(col("__toks"), (col("__a") + 1).cast("int"),
          (col("__b") - col("__a")).cast("int")).as("piece"),
        col("__did"))
    // positions within a window are disjoint across docs, so the
    // (pos, …) struct sort is total and orders pieces AND spans alike
    pieces.groupBy(col("seq"))
      .agg(array_sort(collect_list(
        struct(col("pos"), col("piece"), col("__did")))).as("__ps"))
      .select(col("seq"),
        flatten(transform(col("__ps"), x => x.getField("piece")))
          .as("token_ids"),
        transform(col("__ps"), x => struct(
          x.getField("__did").as("doc_id"),
          x.getField("pos").as("start"),
          size(x.getField("piece")).cast("long").as("len")))
          .as("doc_spans"))
      .withColumn("n_tokens", size(col("token_ids")).cast("long"))
  }

  /**
   * TAKEDOWN for PACKED TRAINING WINDOWS — the one standing artifact
   * family whose delete cannot be a row retire: removing a doc from
   * the packed stream shifts every downstream token offset, so a
   * takedown invalidates the layout, not just some rows. The industry
   * practice (and this operator) is to DROP every window that
   * contains any deleted doc's tokens and keep the rest byte-
   * identical: the surviving windows never contained deleted content,
   * their `(seq, token_ids, doc_spans)` are untouched, and a
   * dataloader keeps seeking them at their original coordinates; the
   * dropped window ids leave holes a training run skips. A full
   * repack ([[packSequences]] over corpus ∖ ids) remains the
   * from-scratch option when hole density grows.
   *
   * The trace is the `doc_spans` metadata [[materializeWindows]]'
   * span-carrying overload emits — exactly what it exists for: a
   * window names its source docs, so the affected set is
   * `spans.doc_id ∩ ids`. Windows materialized WITHOUT spans carry
   * no trace and cannot be taken down (require fails loudly).
   *
   * Scale shape: one explode of the span doc-ids (windows × spans-
   * per-window rows — linear, spans are ≤ docs-per-window by
   * construction), a join against the distinct takedown ids (AQE
   * broadcasts the typical small batch), and one anti-join on `seq`.
   * The windows' token payloads are never shuffled — only (seq, did)
   * pairs move.
   */
  def windowsTakedown(windows: DataFrame, ids: DataFrame,
      id: Column): DataFrame = {
    require(windows.columns.contains("doc_spans"),
      "windowsTakedown needs the doc_spans trace — materialize windows " +
        "with the span-carrying overload (materializeWindows(packed, id, " +
        "tokens, seqLen)); spans-free windows cannot be taken down")
    val dels = ids.select(id.as("__d")).distinct()
    val touched = windows
      .select(col("seq"), explode(col("doc_spans.doc_id")).as("__d"))
      .join(dels, "__d")
      .select(col("seq")).distinct()
    windows.join(touched, Seq("seq"), "left_anti")
  }

  /**
   * WHOLE-DOC (no-split) packing — the fine-tune/contrastive layout
   * [[packSequences]] deliberately is not: every doc lands INTACT in
   * exactly one `seqLen`-capacity window (packSequences cuts docs at
   * window boundaries — correct for pretraining, wrong for setups
   * whose loss treats a window's docs as complete units). Docs longer
   * than `seqLen` cannot be placed whole: they flag `oversize` with a
   * null `seq` (route them to [[packSequences]] or truncate upstream
   * — a silent cut here would corrupt the no-split contract); empty
   * docs occupy no window (null `seq`, like n_seqs = 0).
   *
   * The placement is HARMONIC banding (the classic harmonic bin-
   * packing family): a doc of length `len` joins band
   * `k = seqLen div len` — the largest count of its band's docs that
   * provably fits, since every band-k doc has len ≤ seqLen/k — and
   * each band packs k docs per window in the portable
   * (hash60(id), id) order. Greedy first-fit inside a length band
   * equals this k-per-window walk (all members fit k-wise, none
   * (k+1)-wise at the band's top length), and unlike true global
   * first-fit it needs NO sequential bin state — so it distributes:
   * ranks come from the same 4096-bucket two-level prefix as
   * [[packSequences]] (window functions only ever see a
   * (bucket, band) slice), window ids are globalized by a broadcast
   * ≤4096·#bands prefix frame, and nothing corpus-sized sits in any
   * buffer. Waste is bounded per window: a band-k window's k docs
   * each exceed seqLen/(k+1), so slack < seqLen·(1 − k/(k+1)) =
   * seqLen/(k+1) except in each band's final partial window.
   *
   * Output: input row + `len`, `band_k`, `seq` (global window id,
   * contiguous from 0 in (bucket, band) order), `pos` (0-based slot
   * in the window), `oversize`. Deterministic: a pure function of
   * (id, len) — stable across runs, engines, partitionings.
   * Compose with [[materializeWholeDocWindows]] for token payloads +
   * the `doc_spans` trace [[windowsTakedown]] consumes.
   */
  def packWholeDocs(df: DataFrame, id: Column, nTokens: Column,
      seqLen: Long): DataFrame = {
    require(seqLen > 0, "seqLen must be > 0")
    val base = df
      .withColumn("_h", graft.functions.Hash60Expr.hash60(id.cast("string")))
      .withColumn("len", nTokens.cast("long"))
      .withColumn("oversize", col("len") > seqLen)
      .withColumn("band_k", when(col("len").between(1L, seqLen),
        ldiv(lit(seqLen), col("len"))))
      .withColumn("_bkt", shiftright(col("_h"), 48))
    val placeable = col("band_k").isNotNull
    // windows per (bucket, band) → global window-id prefix, ordered
    // (bucket, band): ≤ 4096·#bands rows, broadcast back
    val winCounts = base.filter(placeable)
      .groupBy(col("_bkt"), col("band_k"))
      .agg(count(lit(1)).as("_cnt"))
      .withColumn("_wins",
        ldiv(col("_cnt") + col("band_k") - 1, col("band_k")))
      .withColumn("_wbefore", coalesce(
        sum(col("_wins")).over(Window.orderBy(col("_bkt"), col("band_k"))
          .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .select(col("_bkt"), col("band_k"), col("_wbefore"))
    val inSlice = Window.partitionBy(col("_bkt"), col("band_k"))
      .orderBy(col("_h"), id)
    base.join(broadcast(winCounts), Seq("_bkt", "band_k"), "left")
      .withColumn("_rank",
        when(placeable, row_number().over(inSlice).cast("long") - 1))
      .withColumn("seq",
        when(placeable, col("_wbefore") + ldiv(col("_rank"), col("band_k"))))
      .withColumn("pos",
        when(placeable, col("_rank") - ldiv(col("_rank"), col("band_k")) *
          col("band_k")))
      .drop("_h", "_bkt", "_wbefore", "_rank")
  }

  /**
   * Materialize [[packWholeDocs]]' layout into training windows with
   * the same schema as [[materializeWindows]]' span-carrying overload
   * (`seq, token_ids, doc_spans, n_tokens`) — so
   * [[windowsTakedown]], [[Export]] sharding, and every other
   * windows-frame consumer composes unchanged. Internally it IS that
   * operator: a whole-doc placement is a packed layout with
   * `start_seq = seq`, `n_seqs = 1`, and `offset` = the summed
   * lengths of the window's earlier slots (a window-local prefix —
   * each window holds ≤ band_k docs, never a corpus-sized
   * partition). Oversize/empty docs are excluded by construction
   * (null `seq`).
   */
  def materializeWholeDocWindows(placed: DataFrame, id: Column,
      tokens: Column, seqLen: Long): DataFrame = {
    val offsets = Window.partitionBy(col("seq")).orderBy(col("pos"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val packed = placed.filter(col("seq").isNotNull)
      .withColumn("start_seq", col("seq"))
      .withColumn("offset", coalesce(sum(col("len")).over(offsets), lit(0L)))
      .withColumn("n_seqs", lit(1L))
    materializeWindows(packed, id, tokens, seqLen)
  }

  /**
   * Length-bucketed batch construction — the padding-minimizing
   * alternative to [[packSequences]]' concatenation for training
   * setups that pad rather than pack (fine-tuning, contrastive,
   * reranker training): rows land in a length BAND
   * (`length div bucketWidth`), each band is laid out in the portable
   * (hash60(id), id) order and cut into `batchSize`-row batches, and
   * every row learns its batch, its position, the batch's padded
   * length (the max length in it) and its own padding waste. Batching
   * near-equal lengths bounds waste by `bucketWidth − 1` per row for
   * every full batch (the final partial batch of a band is the only
   * one that can pad worse).
   *
   * Deterministic like everything in this family: batch membership
   * and order are a pure function of ids — stable across runs,
   * engines, and partitionings, so a dataloader can seek batch
   * (band, b) reproducibly.
   *
   * Scale shape: the within-band rank uses the same 4096-bucket
   * prefix construction as [[packSequences]] (bucket COUNTS shuffle,
   * ≤4096·#bands tiny rows broadcast back; the exact rank windows
   * only ~1/4096 of a band per partition), and the padded-length
   * window partitions by (band, batch) — at most `batchSize` rows
   * per partition by construction.
   */
  def lengthBucketedBatches(df: DataFrame, id: Column, length: Column,
      bucketWidth: Long, batchSize: Int): DataFrame = {
    require(bucketWidth > 0, "bucketWidth must be > 0")
    require(batchSize >= 1, "batchSize must be >= 1")
    val base = df
      .withColumn("_h", graft.functions.Hash60Expr.hash60(id.cast("string")))
      .withColumn("length", length.cast("long"))
      .withColumn("band", ldiv(col("length"), bucketWidth))
      .withColumn("_bkt", shiftright(col("_h"), 48))
    val bucketPrefix = base.groupBy(col("band"), col("_bkt"))
      .agg(count(lit(1)).as("_bc"))
      .withColumn("_bbefore", coalesce(
        sum(col("_bc")).over(Window.partitionBy(col("band"))
          .orderBy(col("_bkt"))
          .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .select(col("band"), col("_bkt"), col("_bbefore"))
    val inBucket = Window.partitionBy(col("band"), col("_bkt"))
      .orderBy(col("_h"), id).rowsBetween(Window.unboundedPreceding, -1)
    val ranked = base
      .join(broadcast(bucketPrefix), Seq("band", "_bkt"))
      .withColumn("_rank", col("_bbefore") + count(lit(1)).over(inBucket))
      .withColumn("batch", ldiv(col("_rank"), batchSize.toLong))
      .withColumn("pos", col("_rank") - col("batch") * batchSize)
    ranked
      .withColumn("padded_to", max(col("length")).over(
        Window.partitionBy(col("band"), col("batch"))))
      .withColumn("waste", col("padded_to") - col("length"))
      .drop("_h", "_bkt", "_bbefore", "_rank")
  }
}
