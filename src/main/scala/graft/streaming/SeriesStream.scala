package graft.streaming

import graft.sources.SeriesStore
import org.apache.spark.sql.DataFrame
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
}
