package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * Corpus snapshot diff: the changelog between two versions of a
 * document set — which ids were `added`, `removed`, content-`modified`
 * (same id, different normalized fingerprint), or `unchanged`. The
 * decision record of an incremental corpus build ("what did crawl v2
 * actually change?") and the input to delta-only reprocessing: only
 * `added`/`modified` docs need re-scoring, re-embedding, re-dedup
 * against the corpus ([[Dedup.incremental]] is the admission filter
 * this feeds).
 *
 * Content identity is [[TextOps.fingerprint]] — the same
 * whitespace-normalized md5 the exact-dedup family keys on, so "a doc
 * whose only change is whitespace" counts as unchanged, consistently
 * with what the dedup pipeline would do to it.
 *
 * Scale shape: both sides collapse to (id, fp) projections before the
 * single full-outer equi-join on id — text never crosses the shuffle,
 * and the join is AQE-planned (broadcast when one side is a small
 * delta, the common case).
 */
object Snapshot {

  def diff(oldDf: DataFrame, newDf: DataFrame, id: Column,
      text: Column): DataFrame = {
    val o = oldDf.select(id.as("doc_id"), TextOps.fingerprint(text).as("old_fp"))
    val n = newDf.select(id.as("doc_id"), TextOps.fingerprint(text).as("new_fp"))
    o.join(n, Seq("doc_id"), "full_outer")
      .select(col("doc_id"),
        when(col("old_fp").isNull, "added")
          .when(col("new_fp").isNull, "removed")
          .when(col("old_fp") === col("new_fp"), "unchanged")
          .otherwise("modified").as("status"))
  }
}
