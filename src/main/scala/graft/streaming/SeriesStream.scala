package graft.streaming

import graft.operators.TextOps
import graft.sources.SeriesStore
import org.apache.spark.sql.DataFrame
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
   * Stateless streaming corpus scoring: language ID, quality
   * columns, token counts, and PII redaction are pure projections,
   * so the SAME codegen'd expressions the batch pipeline uses apply
   * to an unbounded stream unchanged — no state, no watermark, one
   * more reason the operators avoid UDFs and driver-side steps.
   */
  def scoreStream(docs: DataFrame, textCol: String): DataFrame = {
    val t = col(textCol)
    val cols = Seq("lang_pred" -> TextOps.langId(t)) ++
      TextOps.qualityColumns(t) ++ TextOps.tokenCounts(t) ++
      TextOps.redactPii(t)
    cols.foldLeft(docs) { case (df, (n, c)) => df.withColumn(n, c) }
  }
}
