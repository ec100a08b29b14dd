package graft.streaming

import graft.operators.TextOps
import graft.sources.SeriesStore
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

/**
 * Continuous ingest: the Structured-Streaming analog of the
 * reference's per-database write-behind goroutine, which batches
 * queued PUTs and commits every 1000 ops or 5 s (reference:
 * database.go:175-254, flags main.go:24-29). A micro-batch trigger IS
 * that batching policy; `foreachBatch` lands each micro-batch through
 * the store's batch writer, so acks happen per micro-batch (the
 * reference acks before durability — SURVEY.md §7.5).
 *
 * No watermark: the reference accepts arbitrarily late documents (a
 * PUT with an old ts just lands at its key — handlers.go:56-74), and
 * ingest does no streaming aggregation, so append-by-event-ts needs no
 * state. Queries stay batch reads of the same table.
 */
object SeriesStream {

  /** Starts ingest of a streaming `(ts LONG ns, doc STRING)` frame
   * into `db`. Default trigger mirrors the reference's 5 s flush. */
  def ingest(store: SeriesStore, db: String, docs: DataFrame,
      checkpoint: String,
      trigger: Trigger = Trigger.ProcessingTime("5 seconds")): StreamingQuery = {
    store.create(db)
    docs.writeStream
      .outputMode("append")
      .option("checkpointLocation", checkpoint)
      .trigger(trigger)
      .foreachBatch { (batch: DataFrame, _: Long) =>
        store.storeBatch(db, batch)
      }
      .start()
  }

  /**
   * Streaming ADMISSION filter against a static corpus: every
   * micro-batch runs [[graft.operators.Dedup.incremental]]'s exact
   * fingerprint + banded MinHash near-dup checks (batch × corpus band
   * join — per-batch work scales with the batch, never |corpus|²) and
   * hands the admitted rows (`keep = 1`) to `sink`. The online
   * counterpart of the batch admission filter: a crawl stream lands
   * only documents that are neither exact nor near duplicates of the
   * standing corpus. Batch-INTERNAL duplicates are the downstream
   * sweep's job, same split as [[dedupExact]] documents.
   *
   * `corpus` is a BATCH frame, re-read per micro-batch; for a
   * standing pipeline, point it at the parquet the admitted docs
   * append to (each batch then also screens against earlier
   * admissions) and persist its band/fingerprint frames as
   * [[graft.operators.Dedup.incremental]]'s scaladoc describes.
   */
  def admitStream(docs: DataFrame, corpus: DataFrame, idCol: String,
      textCol: String, checkpoint: String, sink: DataFrame => Unit,
      threshold: Double = 0.8,
      trigger: Trigger = Trigger.ProcessingTime("5 seconds")): StreamingQuery =
    docs.writeStream
      .outputMode("append")
      .option("checkpointLocation", checkpoint)
      .trigger(trigger)
      .foreachBatch { (batch: DataFrame, _: Long) =>
        val verdict = graft.operators.Dedup.incremental(batch, corpus,
          col(idCol), col(textCol), threshold)
        sink(batch.join(
          verdict.filter(col("keep") === 1)
            .select(col("doc_id").as(idCol)), Seq(idCol), "left_semi"))
      }
      .start()

  /**
   * SELF-MAINTAINING streaming admission — [[admitStream]] closed
   * into a loop over its own standing artifacts: each micro-batch is
   * screened against the persisted MinHash band index
   * ([[graft.operators.Dedup.incrementalIndexed]], batch cost — the
   * corpus participates as its compact index; TEXT is read only for
   * the candidate sliver), admitted docs flow to the sink, land in
   * the corpus store, and FOLD INTO the index at batch cost
   * ([[graft.operators.Dedup.corpusIndexUpsert]]) — so the next
   * micro-batch is screened against everything previously admitted,
   * with no index rebuild ever. The stream owns both artifacts:
   * `indexPath` rotates under the [[artifactUpdateBatch]] swap
   * discipline (re-delivered batches skip via the durable batch
   * marker). Sink semantics are AT-LEAST-ONCE: sink and corpus write
   * run before the index swap commits, so a crash in that window
   * replays the batch and re-fires the sink — make the sink
   * idempotent (the corpus write itself is: per-batch subdirs of
   * `corpusPath`, overwrite-by-batch-id).
   * Batch-INTERNAL duplicates are not screened here (same contract
   * as [[admitStream]]) — compose exact/minhashPairs over the batch
   * upstream for a full filter. Spec-pinned: an out-of-order
   * replayed stream ends with the index bit-equal to a from-scratch
   * [[graft.operators.Dedup.corpusIndex]] of the admitted corpus.
   */
  def admitIndexedStream(docs: DataFrame, idCol: String, textCol: String,
      indexPath: String, corpusPath: String, checkpoint: String,
      sink: DataFrame => Unit, threshold: Double = 0.8, n: Int = 64,
      bands: Int = 16, shingleK: Int = 3,
      trigger: Trigger = Trigger.ProcessingTime("5 seconds")): StreamingQuery =
    docs.writeStream
      .outputMode("append")
      .option("checkpointLocation", checkpoint)
      .trigger(trigger)
      .foreachBatch { (batch: DataFrame, id: Long) =>
        val spark = batch.sparkSession
        import graft.operators.Dedup
        artifactUpdateBatch(spark, indexPath, id, { standing =>
          val idx = standing.map(_.drop("batch_id"))
            .getOrElse(Dedup.corpusIndex(batch.limit(0), col(idCol),
              col(textCol), n, bands, shingleK))
          val cp = java.nio.file.Paths.get(corpusPath)
          val corpus =
            if (java.nio.file.Files.isDirectory(cp) && {
              val s = java.nio.file.Files.list(cp)
              try s.findFirst().isPresent finally s.close()
            })
              spark.read.option("recursiveFileLookup", "true")
                .parquet(corpusPath)
            else batch.limit(0).select(col(idCol), col(textCol))
          val verdict = Dedup.incrementalIndexed(batch, idx, corpus,
            col(idCol), col(textCol), threshold, n, bands, shingleK)
          // consumed three ways (sink, corpus append, index upsert) —
          // materialize once, don't re-screen per consumer
          val admitted = batch.join(verdict.filter(col("keep") === 1)
              .select(col("doc_id").as(idCol)), Seq(idCol), "left_semi")
            .localCheckpoint()
          sink(admitted)
          admitted.select(col(idCol), col(textCol)).write
            .mode("overwrite").parquet(s"$corpusPath/b$id")
          Dedup.corpusIndexUpsert(idx, admitted, col(idCol),
            col(textCol), n, bands, shingleK)
        })
      }
      .start()

  /**
   * Streaming TAKEDOWN propagation — the deletion complement of the
   * admission family: a stream of doc/vec ids to remove (copyright or
   * PII takedown requests) retires, per micro-batch, every id from
   * whichever standing artifacts are configured — the MinHash
   * admission index ([[graft.operators.Dedup.corpusIndexDelete]]),
   * the IVF assignment index
   * ([[graft.operators.Similarity.ivfIndexDelete]]), the PQ code
   * frame ([[graft.operators.Similarity.pqDelete]]), and packed
   * training windows ([[graft.operators.Packing.windowsTakedown]] —
   * windows whose doc_spans name a retired id drop whole, survivors
   * stay byte-identical). Each retire is
   * the exact delete (post-retire ≡ from-scratch over corpus ∖ ids,
   * the operators' spec-pinned contract), rides
   * [[artifactUpdateBatch]]'s swap/marker discipline (a replayed
   * batch after restart skips — and deletion is idempotent anyway),
   * and costs one artifact-sized anti-join — the corpus itself is
   * never read.
   *
   * An artifact path whose store does not exist yet is SKIPPED, not
   * an error: nothing was admitted, so there is nothing to retire
   * (the ids cannot be in an index that was never built). The corpus
   * STORE is deliberately not handled here — route document removal
   * through [[graft.sources.SeriesStore.deleteKeys]]' targeted
   * rewrite; non-invertible sketches (KMV/MG/quantile-grid/Bloom)
   * rebuild per their documented contracts.
   *
   * Single-writer rule, as everywhere in the standing-artifact
   * family: while this stream runs it owns the configured artifacts —
   * serialize takedowns against the admission stream that maintains
   * the same paths (run them in one pipeline or alternate them),
   * never write one artifact from two streams at once.
   */
  def takedownStream(ids: DataFrame, idCol: String, checkpoint: String,
      corpusIndexPath: Option[String] = None,
      ivfIndexPath: Option[String] = None,
      pqCodesPath: Option[String] = None,
      windowsPath: Option[String] = None,
      trigger: Trigger = Trigger.ProcessingTime("5 seconds")): StreamingQuery = {
    require(corpusIndexPath.nonEmpty || ivfIndexPath.nonEmpty ||
      pqCodesPath.nonEmpty || windowsPath.nonEmpty,
      "configure at least one artifact to maintain")
    ids.writeStream
      .outputMode("append")
      .option("checkpointLocation", checkpoint)
      .trigger(trigger)
      .foreachBatch { (batch: DataFrame, id: Long) =>
        val spark = batch.sparkSession
        val dels = batch.select(col(idCol)).distinct().localCheckpoint()
        // existence probe is a directory check (the semantics
        // standingSketch encodes), NOT a parquet read: a per-batch
        // spark.read per artifact would pay file listing + schema
        // inference on every (possibly empty) micro-batch
        def exists(p: String): Boolean =
          java.nio.file.Files.isDirectory(java.nio.file.Paths.get(p)) ||
          java.nio.file.Files.isDirectory(java.nio.file.Paths.get(p + ".old"))
        def retire(path: String,
            del: DataFrame => DataFrame): Unit =
          if (exists(path))
            artifactUpdateBatch(spark, path, id, { standing =>
              del(standing.getOrElse(sys.error(
                s"takedownStream: artifact at $path vanished mid-batch"))
                .drop("batch_id"))
            })
        corpusIndexPath.foreach(p => retire(p, s =>
          graft.operators.Dedup.corpusIndexDelete(s, dels, col(idCol))))
        ivfIndexPath.foreach(p => retire(p, s =>
          graft.operators.Similarity.ivfIndexDelete(s, dels, col(idCol))))
        pqCodesPath.foreach(p => retire(p, s =>
          graft.operators.Similarity.pqDelete(s, dels, col(idCol))))
        // packed training windows: drop every window whose doc_spans
        // name a retired id (Packing.windowsTakedown's contract —
        // survivors byte-identical, spans-free frames fail loudly)
        windowsPath.foreach(p => retire(p, s =>
          graft.operators.Packing.windowsTakedown(s, dels, col(idCol))))
      }
      .start()
  }

  /**
   * Streaming EXACT-SUBSTRING cleaning against a standing gram index
   * — the sub-document member of the self-maintaining admission
   * family ([[admitIndexedStream]] cleans whole near-dup docs; this
   * cuts duplicated ≥ l-token SPANS out of each arriving doc): every
   * micro-batch screens against the persisted first-occurrence index
   * ([[graft.operators.Dedup.exactSubstringIncremental]] — the
   * corpus participates as its window index, text never re-read),
   * the cleaned batch flows to the sink, and the batch's windows
   * fold into the index (min-merge homomorphism,
   * [[graft.operators.Dedup.gramIndexUpsert]]) so the next batch is
   * screened against everything seen. Same artifact discipline as
   * [[admitIndexedStream]]: marker-idempotent under replay, sink
   * AT-LEAST-ONCE (a crash between sink and swap re-fires it — the
   * cleaned output is deterministic, so re-fires are bit-identical).
   * Spec-pinned: with batch order following doc order, the
   * concatenated cleaned stream ≡ the batch
   * [[graft.operators.Dedup.exactSubstringDedup]] of everything
   * ingested.
   */
  def admitSubstringStream(docs: DataFrame, idCol: String, textCol: String,
      l: Int, indexPath: String, checkpoint: String,
      sink: DataFrame => Unit,
      trigger: Trigger = Trigger.ProcessingTime("5 seconds")): StreamingQuery =
    docs.writeStream
      .outputMode("append")
      .option("checkpointLocation", checkpoint)
      .trigger(trigger)
      .foreachBatch { (batch: DataFrame, id: Long) =>
        substringAdmitBatch(batch, idCol, textCol, l, indexPath, id, sink)
      }
      .start()

  /** One executor step for [[admitSubstringStream]] (exposed for the
   * spec's replay case). */
  private[graft] def substringAdmitBatch(batch: DataFrame, idCol: String,
      textCol: String, l: Int, indexPath: String, batchId: Long,
      sink: DataFrame => Unit): Unit = {
    import graft.operators.Dedup
    artifactUpdateBatch(batch.sparkSession, indexPath, batchId, { standing =>
      val idx = standing.map(_.drop("batch_id"))
        .getOrElse(Dedup.gramIndex(batch.limit(0), col(idCol),
          col(textCol), l))
      val cleaned = Dedup.exactSubstringIncremental(batch, idx,
        col(idCol), col(textCol), l).localCheckpoint()
      sink(cleaned)
      Dedup.gramIndexUpsert(idx, batch, col(idCol), col(textCol), l)
    })
  }

  /**
   * Streaming SEMANTIC admission against a standing PQ index — the
   * third admission tier next to [[admitStream]]'s exact+MinHash text
   * screen: each micro-batch of `(vec_id, embedding)` rows ADC-probes
   * the persisted code/codebook artifacts
   * ([[graft.operators.Similarity.admitSemantic]]) and only vectors
   * whose nearest standing neighbor is FURTHER than `maxD2Micro`
   * reach the sink. Per micro-batch the work is batch-scaled (the
   * standing corpus participates as m-byte codes under one broadcast
   * LUT), so the screen sustains a continuous feed over an arbitrary
   * standing corpus. Spec-pinned bit-equal to the batch operator on
   * a replayed stream.
   */
  def admitSemanticStream(vecs: DataFrame, codes: DataFrame,
      codebook: DataFrame, m: Int, maxD2Micro: Long, checkpoint: String,
      sink: DataFrame => Unit,
      trigger: Trigger = Trigger.ProcessingTime("5 seconds")): StreamingQuery =
    vecs.writeStream
      .outputMode("append")
      .option("checkpointLocation", checkpoint)
      .trigger(trigger)
      .foreachBatch { (batch: DataFrame, _: Long) =>
        val verdict = graft.operators.Similarity.admitSemantic(
          batch, codes, codebook, m, maxD2Micro)
        sink(batch.join(verdict.filter(col("admit"))
          .select(col("vec_id")), Seq("vec_id"), "left_semi"))
      }
      .start()

  /**
   * SELF-MAINTAINING streaming ANN index — [[admitIndexedStream]]'s
   * discipline applied to the IVF/PQ artifact pair: every micro-batch
   * of `(vec_id, embedding)` rows folds into BOTH standing artifacts
   * at batch cost ([[graft.operators.Similarity.ivfIndexUpsert]] —
   * batch·C assignment work; [[graft.operators.Similarity.pqUpsert]]
   * — batch·K·m encode work; the standing corpus is never re-read),
   * so the persisted indexes always answer for everything ingested
   * with no rebuild ever. Centroids and codebook are FIXED artifacts
   * (trained offline — the standing-index contract everywhere in
   * this family: a retrain is a new index). Seed standing artifacts
   * built by the batch operators via [[seedArtifact]].
   *
   * `screenMaxD2Micro` turns on SEMANTIC ADMISSION: each batch
   * vector ADC-probes the CURRENT code artifact — the codes as of
   * the previous batch, exactly what "is this new content?" means
   * mid-stream — and only vectors whose nearest standing neighbor
   * is further than the threshold reach the sink and the indexes
   * ([[graft.operators.Similarity.admitSemantic]]). The admitted set
   * is PERSISTED per batch (`<pqCodesPath>.admitted/b<id>`,
   * overwrite-by-batch-id) BEFORE the code swap commits, and the IVF
   * update replays from that persisted set — so a crash between the
   * two artifact swaps re-runs to the identical state instead of
   * re-screening against already-updated codes (which would reject
   * the batch against itself). Both artifacts ride
   * [[artifactUpdateBatch]]'s marker/swap discipline; the sink is
   * AT-LEAST-ONCE with deterministic content, same as
   * [[admitIndexedStream]].
   *
   * Spec-pinned: a replayed/restarted stream ends with ivf index ≡
   * from-scratch [[graft.operators.Similarity.ivfIndex]] and codes ≡
   * from-scratch [[graft.operators.Similarity.pqEncode]] over the
   * admitted corpus, and screening decisions use the CURRENT index.
   */
  def annIndexStream(vecs: DataFrame, centroids: DataFrame,
      codebook: DataFrame, m: Int, ivfIndexPath: String,
      pqCodesPath: String, checkpoint: String,
      sink: DataFrame => Unit = _ => (),
      screenMaxD2Micro: Option[Long] = None,
      trigger: Trigger = Trigger.ProcessingTime("5 seconds")): StreamingQuery =
    vecs.writeStream
      .outputMode("append")
      .option("checkpointLocation", checkpoint)
      .trigger(trigger)
      .foreachBatch { (batch: DataFrame, id: Long) =>
        annIndexBatch(batch, centroids, codebook, m, ivfIndexPath,
          pqCodesPath, id, sink, screenMaxD2Micro)
      }
      .start()

  /** One executor step for [[annIndexStream]] (exposed for the spec's
   * replay case). */
  private[graft] def annIndexBatch(batch0: DataFrame, centroids: DataFrame,
      codebook: DataFrame, m: Int, ivfIndexPath: String,
      pqCodesPath: String, batchId: Long, sink: DataFrame => Unit,
      screenMaxD2Micro: Option[Long]): Unit = {
    val spark = batch0.sparkSession
    import graft.operators.Similarity
    val batch = batch0.select(col("vec_id"), col("embedding"))
      .localCheckpoint()
    val admittedDir = s"$pqCodesPath.admitted/b$batchId"
    // codes first: the screen must read the PRE-batch code artifact,
    // and the admitted set must be durable before the swap commits
    artifactUpdateBatch(spark, pqCodesPath, batchId, { standing =>
      val codes0 = standing.map(_.drop("batch_id"))
        .getOrElse(Similarity.pqEncode(batch.limit(0), codebook, m))
      val admitted = screenMaxD2Micro match {
        case Some(maxD2) =>
          batch.join(
            Similarity.admitSemantic(batch, codes0, codebook, m, maxD2)
              .filter(col("admit")).select(col("vec_id")),
            Seq("vec_id"), "left_semi").localCheckpoint()
        case None => batch
      }
      sink(admitted)
      admitted.write.mode("overwrite").parquet(admittedDir)
      Similarity.pqUpsert(codes0, admitted, codebook, m)
    })
    // the IVF fold replays from the PERSISTED admitted set — identical
    // on re-delivery whether or not the code swap already committed
    artifactUpdateBatch(spark, ivfIndexPath, batchId, { standing =>
      val admitted = spark.read.parquet(admittedDir)
      val idx0 = standing.map(_.drop("batch_id"))
        .getOrElse(Similarity.ivfIndex(batch.limit(0), centroids))
      Similarity.ivfIndexUpsert(idx0, admitted, centroids)
    })
  }

  /**
   * Standing quantile-sketch maintenance: every micro-batch builds
   * its own bounded sketch and MERGES it into a persisted artifact —
   * the streaming face of
   * [[graft.operators.CorpusStats.quantileSketchMerge]]'s
   * homomorphism, which guarantees the standing artifact is
   * bit-identical to a from-scratch batch sketch of everything ever
   * ingested, regardless of how rows were chopped into batches
   * (spec-pinned). Per-batch cost is the batch's own sketch build
   * plus a merge of two ≤ k-cells-per-group frames; the corpus is
   * never re-read. Re-delivered batches (restart replay) are skipped
   * by the recorded `batch_id`, making the merge idempotent — the
   * standard exactly-once foreachBatch recipe. Single-writer: the
   * stream owns the artifact directory.
   */
  def quantileSketchStream(rows: DataFrame, groupCol: String,
      valueCol: String, k: Int, storePath: String, checkpoint: String,
      trigger: Trigger = Trigger.ProcessingTime("5 seconds")): StreamingQuery =
    rows.writeStream
      .outputMode("append")
      .option("checkpointLocation", checkpoint)
      .trigger(trigger)
      .foreachBatch { (batch: DataFrame, id: Long) =>
        sketchMergeBatch(batch, groupCol, valueCol, k, storePath, id)
      }
      .start()

  /** One idempotent merge step for [[quantileSketchStream]] (exposed
   * for the spec's re-delivery case). */
  private[graft] def sketchMergeBatch(batch: DataFrame, groupCol: String,
      valueCol: String, k: Int, storePath: String, batchId: Long): Unit = {
    import graft.operators.CorpusStats
    artifactMergeBatch(batch,
      b => CorpusStats.quantileSketch(b, col(groupCol), col(valueCol), k),
      u => CorpusStats.quantileSketchMerge(u, k), storePath, batchId)
  }

  /**
   * Standing KMV distinct-count maintenance — the same
   * merge-a-bounded-artifact-per-batch shape as
   * [[quantileSketchStream]], for [[graft.operators.CorpusStats
   * .kmvSketch]]: the persisted artifact always equals a from-scratch
   * batch sketch of everything ingested (KMV merge is an exact
   * homomorphism), and [[graft.operators.CorpusStats.kmvEstimate]]
   * reads the running per-group distinct estimate off it at any time
   * — the standing form of the approx-DAU readout.
   */
  def kmvSketchStream(rows: DataFrame, groupCol: String,
      valueCol: String, k: Int, storePath: String, checkpoint: String,
      trigger: Trigger = Trigger.ProcessingTime("5 seconds")): StreamingQuery = {
    import graft.operators.CorpusStats
    rows.writeStream
      .outputMode("append")
      .option("checkpointLocation", checkpoint)
      .trigger(trigger)
      .foreachBatch { (batch: DataFrame, id: Long) =>
        artifactMergeBatch(batch,
          b => CorpusStats.kmvSketch(b, col(groupCol), col(valueCol), k),
          u => CorpusStats.kmvMerge(u, k), storePath, id)
      }
      .start()
  }

  /**
   * Standing heavy-hitter maintenance — the Misra–Gries counterpart
   * of [[kmvSketchStream]]: each micro-batch contributes its
   * per-partition [[graft.operators.CorpusStats.mgSketch]] summaries
   * and [[graft.operators.CorpusStats.mgMerge]] folds them into the
   * persisted ≤ k-row artifact. The deficit contract
   * (`c ≤ exact ≤ c + err`, coverage for `exact > err`) holds over
   * EVERYTHING ingested, for any batch split — the summaries are
   * mergeable, errors add, and the artifact stays bounded forever.
   * The fresh batch's partition sids (`"p0".."pP"`) never collide
   * with the standing summary's sid `"m"`, so per-summary errs sum
   * correctly (the [[graft.operators.CorpusStats.mgMerge]]
   * disjoint-sid precondition holds by construction here).
   */
  def heavyHittersStream(rows: DataFrame, valueCol: String, k: Int,
      storePath: String, checkpoint: String,
      trigger: Trigger = Trigger.ProcessingTime("5 seconds")): StreamingQuery = {
    import graft.operators.CorpusStats
    rows.writeStream
      .outputMode("append")
      .option("checkpointLocation", checkpoint)
      .trigger(trigger)
      .foreachBatch { (batch: DataFrame, id: Long) =>
        artifactMergeBatch(batch,
          b => CorpusStats.mgSketch(b, col(valueCol), k),
          u => CorpusStats.mgMerge(u, k), storePath, id)
      }
      .start()
  }

  /** Per-group [[heavyHittersStream]]: one standing Misra–Gries
   * summary per group value (per-domain frequent items over the
   * ingest stream), merged group-by-group each micro-batch. The
   * per-group deficit/coverage contract holds over everything
   * ingested for any batch split. `maxGroups` is
   * [[graft.operators.CorpusStats.mgSketchBy]]'s fail-fast bound on
   * per-task group state — a high-cardinality group column kills the
   * batch loudly instead of OOMing executors. */
  def heavyHittersByStream(rows: DataFrame, groupCol: String,
      valueCol: String, k: Int, storePath: String, checkpoint: String,
      trigger: Trigger = Trigger.ProcessingTime("5 seconds"),
      maxGroups: Int = 4096): StreamingQuery = {
    import graft.operators.CorpusStats
    rows.writeStream
      .outputMode("append")
      .option("checkpointLocation", checkpoint)
      .trigger(trigger)
      .foreachBatch { (batch: DataFrame, id: Long) =>
        artifactMergeBatch(batch,
          b => CorpusStats.mgSketchBy(b, col(groupCol), col(valueCol), k,
            maxGroups),
          u => CorpusStats.mgMergeBy(u, k), storePath, id)
      }
      .start()
  }

  /**
   * Standing word-type-histogram maintenance — the tokenizer
   * family's mergeable artifact: each micro-batch's
   * [[graft.operators.CorpusStats.wordTypeHistogram]] adds into the
   * persisted `(w, n)` frame (count sums — an EXACT homomorphism, so
   * the artifact always equals a from-scratch histogram of
   * everything ingested, for any batch split; spec-pinned). All
   * three tokenizer trainers
   * ([[graft.operators.CorpusStats.bpeTrainFromHist]] /
   * `wordpieceTrainFromHist` / `unigramTrainFromHist`) read it
   * directly, so a standing corpus retrains its tokenizer at any
   * time WITHOUT a corpus scan.
   */
  def wordHistStream(rows: DataFrame, textCol: String, storePath: String,
      checkpoint: String,
      trigger: Trigger = Trigger.ProcessingTime("5 seconds")): StreamingQuery = {
    import graft.operators.CorpusStats
    rows.writeStream
      .outputMode("append")
      .option("checkpointLocation", checkpoint)
      .trigger(trigger)
      .foreachBatch { (batch: DataFrame, id: Long) =>
        artifactMergeBatch(batch,
          b => CorpusStats.wordTypeHistogram(b, col(textCol)),
          u => CorpusStats.wordHistMerge(u), storePath, id)
      }
      .start()
  }

  /**
   * Standing EVAL-GRAM maintenance — the decontamination family's
   * mergeable artifact: each micro-batch of benchmark documents folds
   * its distinct word-n-grams into the persisted
   * [[graft.operators.TextOps.evalGrams]] frame (distinct-union is an
   * exact set homomorphism), so
   * [[graft.operators.TextOps.decontaminateFromGrams]] always screens
   * against the CURRENT benchmark set as eval suites evolve — no
   * eval-side rescan, the [[wordHistStream]] discipline.
   */
  def evalGramStream(bench: DataFrame, textCol: String, n: Int,
      storePath: String, checkpoint: String,
      trigger: Trigger = Trigger.ProcessingTime("5 seconds")): StreamingQuery =
    bench.writeStream
      .outputMode("append")
      .option("checkpointLocation", checkpoint)
      .trigger(trigger)
      .foreachBatch { (batch: DataFrame, id: Long) =>
        artifactMergeBatch(batch,
          b => graft.operators.TextOps.evalGrams(b, col(textCol), n),
          u => u.select(col("gram")).distinct(), storePath, id)
      }
      .start()

  /**
   * Standing per-source token INVENTORY maintenance — the mixture
   * family's mergeable artifact ([[wordHistStream]]'s shape): each
   * micro-batch's per-source token counts sum exactly into the
   * persisted `(source, avail_tokens)` frame, so
   * [[standingMixturePlan]] re-derives the CURRENT mixture plan at
   * any time with zero corpus scans — the standing half of the
   * sample_mixture_plan/apply loop.
   */
  def mixtureInventoryStream(docs: DataFrame, sourceCol: String,
      textCol: String, storePath: String, checkpoint: String,
      trigger: Trigger = Trigger.ProcessingTime("5 seconds")): StreamingQuery =
    docs.writeStream
      .outputMode("append")
      .option("checkpointLocation", checkpoint)
      .trigger(trigger)
      .foreachBatch { (batch: DataFrame, id: Long) =>
        mixtureInventoryBatch(batch, sourceCol, textCol, storePath, id)
      }
      .start()

  /** One idempotent inventory-merge step (exposed for the spec's
   * re-delivery case and for [[admitMixtureStream]]). */
  private[graft] def mixtureInventoryBatch(batch: DataFrame,
      sourceCol: String, textCol: String, storePath: String,
      batchId: Long): Unit =
    artifactMergeBatch(batch,
      b => b.groupBy(col(sourceCol).as("source"))
        .agg(sum(size(graft.operators.TextOps.tokens(col(textCol)))
          .cast("long")).as("avail_tokens")),
      u => u.groupBy(col("source"))
        .agg(sum(col("avail_tokens")).cast("long").as("avail_tokens")),
      storePath, batchId)

  /** The CURRENT mixture plan off the standing inventory artifact —
   * [[graft.operators.Sampling.mixturePlanFromInventory]] over
   * whatever [[mixtureInventoryStream]] has folded so far (empty
   * inventory if nothing yet). Derivation is deterministic and
   * |sources|-bounded, so the plan needs no persistence of its own:
   * the inventory IS the durable state. */
  def standingMixturePlan(spark: org.apache.spark.sql.SparkSession,
      storePath: String, weightsPpm: Map[String, Long],
      budgetTokens: Long, maxEpochsMicro: Long = 4000000L): DataFrame = {
    import spark.implicits._
    val inv = standingSketch(spark, storePath)
      .map(_.drop("batch_id"))
      .getOrElse(Seq.empty[(String, Long)].toDF("source", "avail_tokens"))
    graft.operators.Sampling.mixturePlanFromInventory(inv, weightsPpm,
      budgetTokens, maxEpochsMicro)
  }

  /**
   * The STREAMING MIXTURE EXECUTOR — the standing form of the
   * sample_mixture_plan/apply loop (the [[admitIndexedStream]]
   * pattern for curation mixing): each micro-batch (1) folds its
   * per-source token counts into the persisted inventory
   * (idempotent under replay — the [[artifactUpdateBatch]] marker),
   * (2) re-derives the mixture plan from the UPDATED standing
   * inventory, and (3) admits the batch through that plan
   * ([[graft.operators.Sampling.applyMixture]]: deterministic
   * per-source up/down-sampling, epoch-tagged) into `sink`. Sink
   * semantics are AT-LEAST-ONCE (a crash between sink and the
   * streaming checkpoint replays the batch; admission under a
   * replayed batch re-derives the same plan because the inventory
   * fold is skipped by the marker — the admitted row set is
   * id-hash deterministic, so re-fires are bit-identical).
   */
  def admitMixtureStream(docs: DataFrame, idCol: String, sourceCol: String,
      textCol: String, weightsPpm: Map[String, Long], budgetTokens: Long,
      storePath: String, checkpoint: String, sink: DataFrame => Unit,
      maxEpochsMicro: Long = 4000000L,
      trigger: Trigger = Trigger.ProcessingTime("5 seconds")): StreamingQuery =
    docs.writeStream
      .outputMode("append")
      .option("checkpointLocation", checkpoint)
      .trigger(trigger)
      .foreachBatch { (batch: DataFrame, id: Long) =>
        sink(mixtureAdmitBatch(batch, idCol, sourceCol, textCol,
          weightsPpm, budgetTokens, storePath, id, maxEpochsMicro))
      }
      .start()

  /** One executor step: fold the batch's inventory (idempotent), then
   * admit the batch under the refreshed standing plan. Exposed for
   * the spec's replay case. */
  private[graft] def mixtureAdmitBatch(batch: DataFrame, idCol: String,
      sourceCol: String, textCol: String, weightsPpm: Map[String, Long],
      budgetTokens: Long, storePath: String, batchId: Long,
      maxEpochsMicro: Long = 4000000L): DataFrame = {
    mixtureInventoryBatch(batch, sourceCol, textCol, storePath, batchId)
    val plan = standingMixturePlan(batch.sparkSession, storePath,
      weightsPpm, budgetTokens, maxEpochsMicro)
      .localCheckpoint() // consumed per admitted row via broadcast
    graft.operators.Sampling.applyMixture(batch, col(idCol),
      col(sourceCol), plan)
  }

  /**
   * Standing n-gram-count maintenance — [[wordHistStream]]'s shape
   * for the perplexity family's count artifacts
   * ([[graft.operators.CorpusStats.ngramHistogram]], n = 1/2/3):
   * per-batch counts add exactly, so
   * [[graft.operators.CorpusStats.trigramNllFromHists]] builds its
   * scoring tables off always-current artifacts — an always-fresh
   * quality-scoring LM with zero count scans.
   */
  def ngramHistStream(rows: DataFrame, textCol: String, n: Int,
      storePath: String, checkpoint: String,
      trigger: Trigger = Trigger.ProcessingTime("5 seconds")): StreamingQuery = {
    import graft.operators.CorpusStats
    rows.writeStream
      .outputMode("append")
      .option("checkpointLocation", checkpoint)
      .trigger(trigger)
      .foreachBatch { (batch: DataFrame, id: Long) =>
        artifactMergeBatch(batch,
          b => CorpusStats.ngramHistogram(b, col(textCol), n),
          u => CorpusStats.ngramHistMerge(u), storePath, id)
      }
      .start()
  }

  /**
   * Standing covariance/PCA maintenance — the mergeable-artifact
   * stream for [[graft.operators.Embeddings.covarianceSketch]]: each
   * micro-batch's exact second-moment sums add into the persisted
   * sketch (an EXACT homomorphism, like [[kmvSketchStream]]), so
   * `covarianceFinalize` + `pcaComponentsMicro` read an
   * always-current covariance/PCA off the artifact at any time —
   * incremental PCA over the ingest stream, bit-identical to a
   * from-scratch batch build of everything ingested.
   */
  def covarianceSketchStream(vecs: DataFrame, vecCol: String, dim: Int,
      storePath: String, checkpoint: String, scaleBits: Int = 20,
      trigger: Trigger = Trigger.ProcessingTime("5 seconds")): StreamingQuery = {
    import graft.operators.Embeddings
    vecs.writeStream
      .outputMode("append")
      .option("checkpointLocation", checkpoint)
      .trigger(trigger)
      .foreachBatch { (batch: DataFrame, id: Long) =>
        artifactMergeBatch(batch,
          b => Embeddings.covarianceSketch(b, col(vecCol), dim, scaleBits),
          u => Embeddings.covarianceMerge(u), storePath, id)
      }
      .start()
  }

  /**
   * Online quality-classifier maintenance — the SEQUENTIAL standing
   * artifact: each micro-batch runs `stepsPerBatch` exact GD steps of
   * [[graft.operators.CorpusStats.logregSteps]] starting from the
   * persisted weights (mini-batch gradient descent with the engine's
   * bit-reproducible integer arithmetic), then swaps the 4-row weight
   * artifact in. The standing model is a PURE FOLD of the batch
   * kernel over the batch sequence: replaying the same batches
   * through `logregSteps` by hand yields bit-identical weights
   * (spec'd). Batches with no trainable rows keep the weights and
   * still record their batch_id. Score a live stream against the
   * artifact with [[graft.operators.CorpusStats.logregScoreFeats]].
   *
   * `positiveSql` is a SQL boolean expression over the batch's
   * columns (e.g. `"source = 'src0'"`) — the label bootstrap.
   */
  def logregStream(docs: DataFrame, idCol: String, textCol: String,
      positiveSql: String, storePath: String, checkpoint: String,
      stepsPerBatch: Int = 1, lrNum: Long = 1L, lrDen: Long = 1L,
      trigger: Trigger = Trigger.ProcessingTime("5 seconds")): StreamingQuery = {
    import graft.operators.{CorpusStats, CheckpointMode}
    docs.writeStream
      .outputMode("append")
      .option("checkpointLocation", checkpoint)
      .trigger(trigger)
      .foreachBatch { (batch: DataFrame, id: Long) =>
        val spark = batch.sparkSession
        artifactUpdateBatch(spark, storePath, id, { standing =>
          val w0 = standing match {
            case Some(s) =>
              val m = s.select(col("j"), col("w")).collect()
                .map(r => r.getInt(0) -> BigInt(r.getLong(1))).toMap
              Vector.tabulate(4)(j => m.getOrElse(j, BigInt(0)))
            case None => Vector.fill(4)(BigInt(0))
          }
          val feats = CheckpointMode.Local(CorpusStats.logregFeatFrame(
            batch, col(idCol), col(textCol), expr(positiveSql)))
          val w = CorpusStats.logregSteps(feats, w0, stepsPerBatch,
            lrNum, lrDen)
          import spark.implicits._
          w.indices.map(j => (j, w(j).toLong)).toDF("j", "w")
        })
      }
      .start()
  }

  /** The shared idempotent standing-artifact step: build the batch's
   * bounded artifact, merge with the persisted one, swap. Swap
   * discipline: merged artifact lands in `.tmp` (fully materialized —
   * it READS the standing dir), the standing dir rotates to `.old`,
   * `.tmp` moves in, `.old` deletes; a crash between steps leaves
   * either the old or the new artifact readable ([[standingSketch]]
   * falls back to `.old`). Re-delivered batches skip via the recorded
   * `batch_id`. Standing columns are cast to the fresh build's types
   * before the union, so an artifact persisted under an older column
   * type (e.g. the pre-r13 int `sid` of the MG family, now string —
   * int sids cast to `"0".."P"`/`"-1"`, disjoint from `"p*"`/`"m"` by
   * construction) keeps reading instead of failing the union. */
  private[graft] def artifactMergeBatch(batch: DataFrame,
      build: DataFrame => DataFrame, merge: DataFrame => DataFrame,
      storePath: String, batchId: Long): Unit =
    artifactUpdateBatch(batch.sparkSession, storePath, batchId,
      { standing =>
        val fresh = build(batch)
        merge(standing
          .map(s => alignTypes(s.drop("batch_id"), fresh.schema)
            .unionByName(fresh))
          .getOrElse(fresh))
      })

  /** Cast `df`'s columns to `target`'s types where the names match
   * and the types differ — the standing-artifact schema-migration
   * rule: the CURRENT code version's build schema wins. A cast that
   * NULLs a non-null standing value (an incompatible migration, e.g.
   * string → long over non-numeric sids) fails the batch loudly via
   * `raise_error` instead of silently persisting a degraded artifact
   * as the new truth — the known-safe directions (int → string sid)
   * never null. */
  private def alignTypes(df: DataFrame,
      target: org.apache.spark.sql.types.StructType): DataFrame = {
    val want = target.map(f => f.name -> f.dataType).toMap
    df.columns.foldLeft(df) { (d, c) =>
      want.get(c).filter(_ != d.schema(c).dataType)
        .map(t => d.withColumn(c,
          when(col(c).isNotNull && col(c).try_cast(t).isNull,
            raise_error(concat(lit(s"alignTypes: standing-artifact " +
              s"column '$c' does not migrate to $t; value: "),
              col(c).cast("string"))))
            .otherwise(col(c).try_cast(t))))
        .getOrElse(d)
    }
  }

  /** The generalized standing-artifact step ([[artifactMergeBatch]]'s
   * skip + swap discipline with a caller-supplied update): `update`
   * maps the current standing frame (if any, batch_id still attached)
   * to the next artifact — for SEQUENTIAL artifacts (model weights)
   * where the new state is a fold over the old, not a merge of
   * summaries. */
  private[graft] def artifactUpdateBatch(
      spark: org.apache.spark.sql.SparkSession, storePath: String,
      batchId: Long, update: Option[DataFrame] => DataFrame): Unit = {
    val standing = standingSketch(spark, storePath)
    // Durable marker first; row-based fallback only for artifacts
    // written before the marker existed. The marker survives a
    // zero-row artifact (e.g. a batch whose every doc was rejected),
    // which the row-based check would replay forever.
    val seen = readBatchMarker(storePath).map(_ >= batchId).getOrElse(
      standing.exists(s => !s.filter(col("batch_id") >= batchId).isEmpty))
    if (seen) return // re-delivered batch after a restart: already in
    val merged = update(standing).withColumn("batch_id", lit(batchId))
    val p = java.nio.file.Paths.get(storePath)
    val tmp = java.nio.file.Paths.get(storePath + ".tmp")
    val old = java.nio.file.Paths.get(storePath + ".old")
    merged.write.mode("overwrite").parquet(tmp.toString)
    // Marker rides the swap: it lands in `.tmp` BEFORE the rotation,
    // so the batch_id commits atomically with the artifact (parquet
    // readers skip `_`-prefixed files).
    java.nio.file.Files.write(tmp.resolve(BatchMarkerName),
      batchId.toString.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    deleteTree(old)
    if (java.nio.file.Files.isDirectory(p))
      java.nio.file.Files.move(p, old)
    java.nio.file.Files.move(tmp, p)
    deleteTree(old)
  }

  /** Persist a BATCH-BUILT artifact for a standing stream to adopt:
   * the durable batch marker is written as -1 ("no stream batch
   * folded yet"), so the adopting stream's FIRST micro-batch (id 0)
   * applies instead of being mistaken for a replay — the footgun of
   * seeding with a bare `batch_id = 0` column, which the legacy
   * row-based replay fallback reads as "batch 0 already in" and
   * silently skips. Use this whenever an artifact built by a batch
   * operator (corpusIndex, ivfIndex, pqEncode, a sketch) is handed
   * to [[takedownStream]]/[[admitIndexedStream]]-family maintenance. */
  def seedArtifact(artifact: DataFrame, storePath: String): Unit = {
    val cols = artifact.columns
    val seeded =
      (if (cols.contains("batch_id")) artifact.drop("batch_id")
       else artifact).withColumn("batch_id", lit(-1L))
    seeded.write.mode("overwrite").parquet(storePath)
    java.nio.file.Files.write(
      java.nio.file.Paths.get(storePath).resolve(BatchMarkerName),
      "-1".getBytes(java.nio.charset.StandardCharsets.UTF_8))
  }

  private val BatchMarkerName = "_GRAFT_BATCH_ID"

  /** Highest committed batch id, from whichever artifact dir
   * [[standingSketch]] would read (live, else pre-swap `.old`). */
  private[graft] def readBatchMarker(storePath: String): Option[Long] = {
    val f = Seq(storePath, storePath + ".old")
      .map(d => java.nio.file.Paths.get(d).resolve(BatchMarkerName))
      .find(java.nio.file.Files.isRegularFile(_))
    f.map(p => new String(java.nio.file.Files.readAllBytes(p),
      java.nio.charset.StandardCharsets.UTF_8).trim.toLong)
  }

  /** The current standing sketch, if any (prefers the live dir, falls
   * back to the pre-swap rotation after a crash). */
  private[graft] def standingSketch(spark: org.apache.spark.sql.SparkSession,
      storePath: String): Option[DataFrame] = {
    val p = java.nio.file.Paths.get(storePath)
    val old = java.nio.file.Paths.get(storePath + ".old")
    if (java.nio.file.Files.isDirectory(p))
      Some(spark.read.parquet(storePath))
    else if (java.nio.file.Files.isDirectory(old))
      Some(spark.read.parquet(old.toString))
    else None
  }

  private def deleteTree(p: java.nio.file.Path): Unit =
    if (java.nio.file.Files.exists(p)) {
      val s = java.nio.file.Files.walk(p)
      try s.sorted(java.util.Comparator.reverseOrder())
        .forEach(f => java.nio.file.Files.deleteIfExists(f))
      finally s.close()
    }

  /**
   * Streaming exact dedup for a continuously-ingested corpus: keep
   * the FIRST arrival per content fingerprint, dropping later copies
   * that arrive within the watermark horizon. State is the set of
   * fingerprints younger than the watermark — BOUNDED, which is what
   * makes this runnable forever; copies separated by more than the
   * horizon are a batch `Dedup.exact` pass's job downstream (the
   * standard streaming-dedup-then-batch-sweep split).
   *
   * `tsCol` must be a TimestampType event-time column.
   */
  def dedupExact(docs: DataFrame, textCol: String, tsCol: String,
      watermark: String = "10 minutes"): DataFrame =
    docs.withColumn("__fp", TextOps.fingerprint(col(textCol)))
      .withWatermark(tsCol, watermark)
      .dropDuplicatesWithinWatermark("__fp")
      .drop("__fp")

  /**
   * Streaming dedup on an ARBITRARY derived key — the crawl frontier's
   * "seen this URL" admission check when keyed on
   * [[TextOps.urlParts]]' `url_canon` (the streaming counterpart of
   * `Dedup.byKey`, same watermark-bounded state contract as
   * [[dedupExact]]). Rows whose key is NULL (unparsable URLs) are
   * never deduplicated against each other — each passes through, the
   * batch operator's null-key contract.
   */
  def dedupByKey(docs: DataFrame, key: Column, tsCol: String,
      watermark: String = "10 minutes"): DataFrame = {
    val keyed = docs.withColumn("__k", key)
      .withWatermark(tsCol, watermark)
    // dropDuplicates treats null keys as EQUAL (they'd all collapse to
    // one row) — split the null-key rows around the dedup instead
    keyed.filter(col("__k").isNotNull)
      .dropDuplicatesWithinWatermark("__k")
      .unionByName(keyed.filter(col("__k").isNull))
      .drop("__k")
  }

  /** Open-session state for [[sessionize]]: epoch-ms bounds plus the
   * running count/sum. */
  case class OpenSession(start: Long, end: Long, n: Long, sum: Double)

  /**
   * Streaming gap-based sessionization — the online counterpart of
   * `graft.operators.Sessionize` built on
   * `flatMapGroupsWithState` + event-time timeout (the custom-state
   * Structured Streaming path; SURVEY §2.7): per key, events within
   * `gapMs` of the open session extend it; a larger gap (or the
   * watermark passing `end + gapMs` with no successor) emits the
   * completed session downstream.
   *
   * State is ONE OpenSession per active key — bounded by the live-key
   * count regardless of per-key volume (this is the hot-key escape
   * hatch the batch operator's doc points to: a bot key costs O(1)
   * state here, vs its whole history through one task there).
   *
   * Semantics note, stated honestly: each micro-batch runs the BATCH
   * interval-merge over {open-session state} ∪ {in-batch events}, so a
   * late event inside the open session's span extends it and one more
   * than `gapMs` OLDER than the open session's start forms (and emits)
   * its own separate session — exactly what the batch operator would
   * produce. The remaining divergence: an event older than an
   * already-EMITTED session cannot reopen it (the batch operator
   * replays history exactly — the standard online/batch split).
   *
   * Output: (key, session_start, session_end, n_events, value_sum),
   * epoch-ms bounds, append mode.
   */
  def sessionize(events: DataFrame, keyCol: String, tsCol: String,
      valueCol: String, gapMs: Long,
      watermark: String = "10 minutes"): DataFrame = {
    import events.sparkSession.implicits._
    import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
    val typed = events
      .select(col(keyCol).cast("string").as("key"),
        col(tsCol).cast("timestamp").as("ts"),
        col(valueCol).cast("double").as("v"))
      // the watermark must tag the FINAL ts attribute: a projection
      // after withWatermark would mint a new column without the
      // event-time marker and event-time timeout then fails analysis
      .withWatermark("ts", watermark)
      .as[(String, java.sql.Timestamp, Double)]
    typed.groupByKey(_._1)
      .flatMapGroupsWithState[OpenSession, (String, Long, Long, Long, Double)](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (key: String, rows: Iterator[(String, java.sql.Timestamp, Double)],
            state: GroupState[OpenSession]) =>
          def emit(s: OpenSession) = (key, s.start, s.end, s.n, s.sum)
          if (state.hasTimedOut) {
            val s = state.get
            state.remove()
            Iterator.single(emit(s))
          } else {
            // the batch interval-merge over {state session} ∪ {events}:
            // sort every item by START (the open session is an interval,
            // events are points) and sweep, merging items within gapMs
            // of the running session's end. A late event > gapMs older
            // than the open session emits as its own session instead of
            // extending the open one backwards.
            val items = (rows.map(r => OpenSession(r._2.getTime,
                r._2.getTime, 1, r._3)) ++ state.getOption.iterator)
              .toArray.sortBy(s => (s.start, s.end))
            val done = Vector.newBuilder[(String, Long, Long, Long, Double)]
            var cur: Option[OpenSession] = None
            items.foreach { it =>
              cur = cur match {
                case Some(s) if it.start > s.end + gapMs =>
                  done += emit(s)
                  Some(it)
                case Some(s) =>
                  Some(OpenSession(s.start, math.max(s.end, it.end),
                    s.n + it.n, s.sum + it.sum))
                case None => Some(it)
              }
            }
            cur.foreach { s =>
              state.update(s)
              // the timeout must sit above the current watermark or the
              // update throws; a session already past the horizon fires
              // at the next possible instant instead
              state.setTimeoutTimestamp(
                math.max(s.end + gapMs, state.getCurrentWatermarkMs() + 1))
            }
            done.result().iterator
          }
      }
      .toDF("key", "session_start", "session_end", "n_events", "value_sum")
  }

  /** Open-funnel state for [[funnel]]: earliest qualifying epoch-ms
   * time per step prefix (length = current depth). */
  case class FunnelProgress(reach: List[Long])

  /**
   * Streaming ordered-step funnel — the online counterpart of
   * `graft.operators.Funnel.stepReach`: as events flow, track each
   * key's furthest in-order step prefix and EMIT A ROW EVERY TIME A
   * KEY'S DEPTH ADVANCES (the "user converted to step N" event
   * downstream alerting/feature pipelines subscribe to). A completed
   * funnel retires its key's state immediately, and a STALLED one —
   * no activity on the key for `idleMs` of event time — is expired by
   * an event-time timeout (same mechanism as [[sessionize]]), so
   * long-running streams hold state only for live in-progress
   * funnels — O(steps) per active key, bounded by the live-key count.
   * A key that re-appears after expiry restarts from step 0.
   *
   * Semantics vs batch, stated honestly: within a micro-batch events
   * are time-sorted, so in-batch ties and reordering resolve exactly
   * like the batch operator's RANGE frames; ACROSS batches an event
   * older than an already-recorded step time cannot retroactively
   * lower it (the batch operator replays history exactly — the same
   * online/batch split as [[sessionize]]).
   *
   * Output (append): (key, depth, step_ms, first_ms, convert_ms) —
   * `step_ms` the time of the step that advanced the funnel,
   * `convert_ms` non-null only on the completing row.
   */
  def funnel(events: DataFrame, keyCol: String, tsCol: String,
      stepCol: String, steps: Seq[String],
      watermark: String = "10 minutes",
      idleMs: Long = 24L * 3600 * 1000): DataFrame = {
    require(steps.nonEmpty, "need at least one funnel step")
    require(steps.distinct == steps, "funnel steps must be distinct")
    require(idleMs > 0, "idleMs must be > 0")
    import events.sparkSession.implicits._
    import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
    val stepIdx = steps.zipWithIndex.toMap
    val typed = events
      .select(col(keyCol).cast("string").as("key"),
        col(tsCol).cast("timestamp").as("ts"),
        col(stepCol).cast("string").as("step"))
      .withWatermark("ts", watermark)
      .as[(String, java.sql.Timestamp, String)]
    typed.groupByKey(_._1)
      .flatMapGroupsWithState[FunnelProgress,
          (String, Int, Long, Long, Option[Long])](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (key: String, rows: Iterator[(String, java.sql.Timestamp, String)],
            state: GroupState[FunnelProgress]) =>
          if (state.hasTimedOut) {
            // a stalled funnel: no activity on the key for idleMs of
            // event time — abandon it (nothing to emit; partial depths
            // already emitted as they happened)
            state.remove()
            Iterator.empty
          } else {
            val evs = rows.map(r => (r._2.getTime, r._3)).toArray.sorted
            val out = Vector.newBuilder[(String, Int, Long, Long, Option[Long])]
            var reach = state.getOption.map(_.reach).getOrElse(Nil)
            evs.foreach { case (t, s) =>
              stepIdx.get(s).foreach { i =>
                // advance only on the NEXT needed step, at-or-after the
                // current prefix's last time (equal-ts events, sorted,
                // chain — matching the batch RANGE-frame semantics)
                if (i == reach.length && (i == 0 || reach.last <= t)) {
                  reach = reach :+ t
                  out += ((key, reach.length, t, reach.head,
                    if (reach.length == steps.length)
                      Some(t - reach.head) else None))
                }
              }
            }
            if (reach.length == steps.length) state.remove()
            else if (reach.nonEmpty) {
              state.update(FunnelProgress(reach))
              // ANY event on the key counts as activity (a browsing
              // user's funnel shouldn't expire mid-journey); the stamp
              // must sit above the watermark or update throws
              val lastSeen = math.max(evs.last._1, reach.last)
              state.setTimeoutTimestamp(
                math.max(lastSeen + idleMs, state.getCurrentWatermarkMs() + 1))
            }
            out.result().iterator
          }
      }
      .toDF("key", "depth", "step_ms", "first_ms", "convert_ms")
  }

  /**
   * Streaming attribution join — the online counterpart of
   * `graft.operators.RangeJoin`: match each purchase to the same
   * key's clicks in the `windowMs` before it, as both streams flow.
   * Built on Structured Streaming's native stream-stream inner join:
   * the equi-key plus an event-time range condition is exactly the
   * shape whose state the engine can bound — each side buffers only
   * rows younger than (watermark + window), evicting as the watermark
   * advances. Without the time-range condition the join state would
   * grow forever; with it, this runs indefinitely.
   *
   * Output: one row per (click, purchase) pair in the window —
   * downstream aggregation (count per purchase) composes as a normal
   * streaming agg.
   */
  def attributionJoin(clicks: DataFrame, purchases: DataFrame,
      keyCol: String, tsCol: String, windowMs: Long,
      watermark: String = "10 minutes"): DataFrame = {
    val c = clicks
      .select(col(keyCol).cast("string").as("click_key"),
        col(tsCol).cast("timestamp").as("click_ts"))
      .withWatermark("click_ts", watermark)
    val p = purchases
      .select(col(keyCol).cast("string").as("purchase_key"),
        col(tsCol).cast("timestamp").as("purchase_ts"))
      .withWatermark("purchase_ts", watermark)
    c.join(p, expr(
      s"""click_key = purchase_key AND
          click_ts BETWEEN purchase_ts - INTERVAL $windowMs MILLISECONDS
                       AND purchase_ts"""))
  }

  /** Quota state for [[quotaStream]]: the window currently being
   * filled and how many rows it has admitted. */
  case class QuotaWindow(windowMs: Long, admitted: Long)

  /**
   * Streaming per-key admission quota — "at most `quota` rows per key
   * per `windowMs` tumbling window", the crawler-politeness /
   * per-domain ingestion cap an unbounded pipeline applies before the
   * expensive stages (a hot domain must not monopolize the batch).
   * Exact integer semantics: rows within a batch process in (ts,
   * then input order per the iterator) and each row is admitted iff
   * its key's CURRENT window has admitted fewer than `quota` rows —
   * so replaying the stream reproduces the identical admitted set.
   * Emits every row with an `admitted` flag (callers filter) plus the
   * running `n_in_window` AFTER the row.
   *
   * State is ONE (window, count) pair per live key — the previous
   * window's count resets the moment a row from a newer window
   * arrives, and the event-time timeout removes keys idle past the
   * watermark entirely, so state is bounded by live keys, not
   * history. Late rows from an already-rolled window are admitted
   * against the CURRENT window (counted conservatively) rather than
   * resurrecting a closed one.
   */
  def quotaStream(events: DataFrame, keyCol: String, tsCol: String,
      windowMs: Long, quota: Long,
      watermark: String = "10 minutes"): DataFrame = {
    require(windowMs > 0, "windowMs must be positive")
    require(quota >= 0, "quota must be >= 0")
    import events.sparkSession.implicits._
    import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
    val typed = events
      .select(col(keyCol).cast("string").as("key"),
        col(tsCol).cast("timestamp").as("ts"))
      .withWatermark("ts", watermark)
      .as[(String, java.sql.Timestamp)]
    typed.groupByKey(_._1)
      .flatMapGroupsWithState[QuotaWindow, (String, Long, Boolean, Long)](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (key: String, rows: Iterator[(String, java.sql.Timestamp)],
            state: GroupState[QuotaWindow]) =>
          if (state.hasTimedOut) { state.remove(); Iterator.empty }
          else {
            var cur = state.getOption.getOrElse(QuotaWindow(Long.MinValue, 0L))
            var lastMs = Long.MinValue
            val out = rows.toArray.sortBy(_._2.getTime).map { r =>
              val ms = r._2.getTime
              lastMs = math.max(lastMs, ms)
              val w = Math.floorDiv(ms, windowMs) * windowMs
              if (w > cur.windowMs) cur = QuotaWindow(w, 0L)
              val ok = cur.admitted < quota
              if (ok) cur = cur.copy(admitted = cur.admitted + 1)
              (key, ms, ok, cur.admitted)
            }
            state.update(cur)
            // expire the key once its window is a full windowMs past
            // the last activity (event-time based — a watermark-based
            // target can sit in the past and evict live state)
            state.setTimeoutTimestamp(math.max(lastMs + windowMs,
              state.getCurrentWatermarkMs() + 1))
            out.iterator
          }
      }
      .toDF("key", "ts_ms", "admitted", "n_in_window")
  }

  /**
   * Streaming hopping-window aggregation — the online counterpart of
   * `graft.operators.SeriesStats.hopping`, on Structured Streaming's
   * native overlapping `window()` state (each event updates its
   * window/slide covering windows; the watermark finalizes a window
   * and emits it once in append mode). Same emit contract as the
   * batch operator: (keys, window_ms, n, sum_v, min_v, max_v) with
   * `sum_v` the single IEEE cast of an exact DECIMAL(38,12) sum —
   * replaying the stream or running the batch operator over the same
   * events produces identical finalized rows.
   *
   * State is one aggregation buffer per (keys, open window) —
   * windowMs/slideMs buffers per live key, bounded by the watermark
   * horizon, independent of event volume.
   */
  def hoppingAgg(events: DataFrame, tsCol: String, valueCol: String,
      windowMs: Long, slideMs: Long, keyCols: Seq[String] = Nil,
      watermark: String = "10 minutes"): DataFrame = {
    require(slideMs > 0, "slideMs must be positive")
    require(windowMs > 0 && windowMs % slideMs == 0,
      "windowMs must be a positive multiple of slideMs")
    val v = col(valueCol).cast("double")
    events.withWatermark(tsCol, watermark)
      .groupBy(window(col(tsCol), s"$windowMs milliseconds",
        s"$slideMs milliseconds") +: keyCols.map(col): _*)
      .agg(count(v).as("n"),
        // 6-dp DECIMAL round before the double cast — the batch
        // operator's emit contract (SeriesStats.hopping)
        graft.functions.decToDouble(
          sum(v.cast("decimal(38,12)")).cast("decimal(38,6)")).as("sum_v"),
        min(v).as("min_v"), max(v).as("max_v"))
      .select(keyCols.map(col) :+
        unix_millis(col("window.start")).as("window_ms") :+
        col("n") :+ col("sum_v") :+ col("min_v") :+ col("max_v"): _*)
  }

  /** Buffered bucket state for [[anomalyStream]]/[[changepointStream]]:
   * the series' buckets so far (micro-quantized values; None = the
   * batch operators' null-valued-bucket contract) plus the max bucket
   * time for the quiet-timeout arithmetic. */
  case class SeriesBuffer(rows: List[(Long, Option[Long])], maxMs: Long)

  /**
   * Streaming z-score anomaly detection — the ingest-side counterpart
   * of `graft.operators.SeriesStats.anomaly(quantizeMicro = true)`.
   * Per series key, bucket rows accumulate in state; when the series
   * goes QUIET — the watermark passes its last bucket + `quietMs` —
   * the whole window is finalized and every bucket emits with the z
   * and flag THE BATCH OPERATOR WOULD PRODUCE, bit for bit: values
   * micro-quantize through the identical Catalyst `round(v·10⁶)`
   * projection before they reach state, the finalize replays the
   * batch micro-path arithmetic exactly (BigInt Σvi/Σvi², the tiered
   * `decToDouble` emit, the same IEEE op sequence to z, scale-0
   * half-up micro-z, integer threshold compare), and null-valued
   * buckets ride along scoring null/false. "Score the completed
   * window when it closes" is the deployment-window / daily-batch
   * monitoring semantic; a RUNNING online score against history-so-far
   * is deliberately not this operator (it could not match batch).
   *
   * State per live series is its buffered buckets — bounded by
   * time-range/granularity like every bucket-frame operator here, and
   * freed at finalize. Output (append):
   * (key, bucket_ms, v, z, is_anomaly).
   */
  def anomalyStream(buckets: DataFrame, keyCol: String, tsCol: String,
      valueCol: String, threshold: Double = 2.0,
      quietMs: Long = 3600000L,
      watermark: String = "10 minutes"): DataFrame = {
    require(threshold > 0, "threshold must be positive")
    finalizeByQuiet(buckets, keyCol, tsCol, valueCol, quietMs, watermark) {
      rows =>
        val vis = rows.flatMap(_._2)
        val n = vis.length.toLong
        if (n == 0) rows.map { case (ms, _) => (ms, None, None, false) }
        else {
          val s = jvmDecToDouble(BigDecimal(vis.map(BigInt(_)).sum))
          val ss = jvmDecToDouble(BigDecimal(
            vis.map(v => BigInt(v) * BigInt(v)).sum))
          // the batch plan's exact IEEE op sequence (SeriesStats.anomaly)
          val m = s / n
          val variance = ss / n - (s / n) * (s / n)
          val thrMicro = math.round(threshold * 1000000.0)
          rows.map { case (ms, vi) =>
            val zi = vi.flatMap { v =>
              if (variance > 0) Some(jvmRoundHalfUp(
                (v.toDouble - m) / math.sqrt(variance) * 1000000.0))
              else None
            }
            (ms, vi, zi.map(_.toDouble / 1000000.0),
              zi.exists(z => math.abs(z) > thrMicro))
          }
        }
    }.toDF("key", "bucket_ms", "v", "z", "is_anomaly")
      .withColumn("v", col("v").cast("double") / lit(1000000.0))
  }

  /**
   * Streaming CUSUM changepoint detection — the ingest-side
   * counterpart of `graft.operators.SeriesStats.changepoint`, same
   * finalize-on-quiet contract as [[anomalyStream]]: when a series
   * goes quiet, its buckets emit in order with the exact batch cusum
   * (integer `cum·n − sv·i` products, `ratio6` half-away emit) and
   * the peak-|cusum| bucket flagged (earliest on ties). Null-valued
   * buckets contribute nothing and emit null cusum, unflagged.
   * Output (append): (key, bucket_ms, v, cusum, is_changepoint).
   */
  def changepointStream(buckets: DataFrame, keyCol: String, tsCol: String,
      valueCol: String, quietMs: Long = 3600000L,
      watermark: String = "10 minutes"): DataFrame =
    finalizeByQuiet(buckets, keyCol, tsCol, valueCol, quietMs, watermark) {
      rows =>
        val ordered = rows.sortBy(_._1)
        val sv = ordered.flatMap(_._2).map(BigInt(_)).sum
        val n = BigInt(ordered.count(_._2.isDefined))
        var cum = BigInt(0)
        var i = BigInt(0)
        val scored = ordered.map { case (ms, vi) =>
          val sBig = vi.map { v =>
            cum += v; i += 1
            cum * n - sv * i
          }
          (ms, vi, sBig)
        }
        // peak: max |cusum|, earliest bucket on ties (the batch
        // max(struct(abs, -bucket)) tie rule)
        val peak = scored.collect { case (ms, _, Some(sBig)) =>
          (sBig.abs, -ms)
        }.sorted.lastOption.map(p => -p._2)
        scored.map { case (ms, vi, sBig) =>
          (ms, vi, sBig.map(jvmRatio6(_, n * BigInt(1000000))),
            peak.contains(ms))
        }
    }.toDF("key", "bucket_ms", "v", "cusum", "is_changepoint")
      .withColumn("v", col("v").cast("double") / lit(1000000.0))

  /** Shared quiet-finalize scaffold: micro-quantize `valueCol` with
   * the BATCH operators' identical Catalyst projection, buffer
   * (bucket_ms, vi) per key, and when the watermark passes the
   * series' last bucket + `quietMs`, emit `score(rows)` — one output
   * row per buffered bucket: (ms, vi, scoreA, flag). */
  private def finalizeByQuiet(buckets: DataFrame, keyCol: String,
      tsCol: String, valueCol: String, quietMs: Long, watermark: String)(
      score: List[(Long, Option[Long])] => List[(Long, Option[Long],
        Option[Double], Boolean)])
      : org.apache.spark.sql.Dataset[(String, Long, Option[Long],
        Option[Double], Boolean)] = {
    require(quietMs > 0, "quietMs must be > 0")
    import buckets.sparkSession.implicits._
    import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
    val typed = buckets
      .select(col(keyCol).cast("string").as("key"),
        col(tsCol).cast("timestamp").as("ts"),
        // the EXACT batch micro-quantization (SeriesStats.anomaly /
        // changepoint): computed by Catalyst here so batch and stream
        // share one rounding implementation
        round(col(valueCol).cast("double") * lit(1000000.0)).cast("long")
          .as("vi"))
      .withWatermark("ts", watermark)
      .as[(String, java.sql.Timestamp, Option[Long])]
    typed.groupByKey(_._1)
      .flatMapGroupsWithState[SeriesBuffer,
          (String, Long, Option[Long], Option[Double], Boolean)](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (key: String, rows: Iterator[(String, java.sql.Timestamp, Option[Long])],
            state: GroupState[SeriesBuffer]) =>
          if (state.hasTimedOut) {
            val buf = state.get
            state.remove()
            score(buf.rows.reverse).iterator
              .map { case (ms, vi, a, f) => (key, ms, vi, a, f) }
          } else {
            val prev = state.getOption.getOrElse(SeriesBuffer(Nil, Long.MinValue))
            val buf = rows.foldLeft(prev) { (b, r) =>
              SeriesBuffer((r._2.getTime, r._3) :: b.rows,
                math.max(b.maxMs, r._2.getTime))
            }
            state.update(buf)
            state.setTimeoutTimestamp(math.max(buf.maxMs + quietMs,
              state.getCurrentWatermarkMs() + 1))
            Iterator.empty
          }
      }
  }

  /** JVM mirror of `functions.decToDouble` over a scale-0 decimal —
   * the tiered-scale emit (full below 9e6, 6 dp below 9e12, 0 dp
   * beyond; each branch's unscaled < 2⁶³ so the cast is one correct
   * rounding). Mirrors Spark's HALF_UP decimal rescale exactly. */
  private def jvmDecToDouble(s: BigDecimal): Double = {
    val a = s.abs
    val t =
      if (a <= BigDecimal(9000000L)) s
      else if (a <= BigDecimal(9000000000000L))
        s.setScale(6, BigDecimal.RoundingMode.HALF_UP)
      else s.setScale(0, BigDecimal.RoundingMode.HALF_UP)
    t.doubleValue
  }

  /** JVM mirror of Spark's `round(double)`: BigDecimal half-up at
   * scale 0 (Catalyst's Round on DoubleType), as a long. */
  private def jvmRoundHalfUp(d: Double): Long =
    BigDecimal.valueOf(d).setScale(0, BigDecimal.RoundingMode.HALF_UP).longValue

  /** JVM mirror of `functions.ratio6` for BigInt num/den (den > 0):
   * half-away 6-dp integer ratio, one IEEE division. */
  private def jvmRatio6(num: BigInt, den: BigInt): Double = {
    val mag = (num.abs * BigInt(2000000) + den) / (den * BigInt(2))
    val signed = if (num < 0) -mag else mag
    signed.toDouble / 1000000.0
  }

  /**
   * Stateless streaming corpus scoring: language ID, quality
   * columns, token counts, and PII redaction are pure projections,
   * so the SAME codegen'd expressions the batch pipeline uses apply
   * to an unbounded stream unchanged — no state, no watermark, one
   * more reason the operators avoid UDFs and driver-side steps.
   * `gopher` overrides the Gopher-rule thresholds (defaults are the
   * paper's §A1.1 bounds — [[TextOps.gopherRules]]) so an ingest tuned
   * for short-form or non-prose content is not stuck with them.
   */
  def scoreStream(docs: DataFrame, textCol: String,
      gopher: GopherThresholds = GopherThresholds()): DataFrame = {
    val t = col(textCol)
    val cols = Seq("lang_pred" -> TextOps.langId(t)) ++
      TextOps.qualityColumns(t) ++ TextOps.tokenCounts(t) ++
      TextOps.redactPii(t) ++
      TextOps.gopherRules(t, gopher.minWords, gopher.maxWords,
        gopher.minMeanWordLenMicro, gopher.maxMeanWordLenMicro,
        gopher.minAlphaWordFracMicro, gopher.minStopHits) ++
      TextOps.scriptProfile(t).filterNot(_._1 == "n_chars")
    cols.foldLeft(docs) { case (df, (n, c)) => df.withColumn(n, c) }
  }

  /** [[TextOps.gopherRules]]' thresholds as one value, for pass-through
   * from streaming callers. Defaults mirror the paper's §A1.1. */
  case class GopherThresholds(
      minWords: Long = 50, maxWords: Long = 100000,
      minMeanWordLenMicro: Long = 3000000L,
      maxMeanWordLenMicro: Long = 10000000L,
      minAlphaWordFracMicro: Long = 800000L,
      minStopHits: Long = 2)
}
