package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}

/**
 * Bucketed-table storage — the PRE-SHUFFLED layout for tables that
 * join on the same key again and again (documents⋈embeddings on id,
 * events⋈users on user_id). `bucketBy(n, key)` hash-partitions rows
 * into a fixed bucket count AT WRITE TIME and records it in the
 * catalog; every later equi-join or aggregation on that key reads the
 * buckets as an already-satisfied hash distribution, so the exchange
 * that would otherwise re-shuffle 100 TB per query simply disappears
 * from the plan (asserted in `BucketedStoreSpec`). The write itself
 * pays one shuffle — amortized over every downstream join.
 *
 * This is the third co-location tool next to `broadcast()` (small
 * side) and `Skew.saltedJoin` (hot key): use bucketing when BOTH
 * sides are large, rewritten rarely, and joined repeatedly on a
 * stable key. Both tables must use the SAME bucket count (or an
 * integer multiple under `spark.sql.bucketing.coalesceBucketsInJoin`)
 * for the exchange-free join. `sortCols` additionally sorts within
 * buckets, which lets a sort-merge join skip its per-task sort.
 */
object BucketedStore {

  /** Write `df` as a catalog table bucketed on `key` — one shuffle
   * now, zero on every future `key` equi-join between co-bucketed
   * tables. */
  def writeBucketed(df: DataFrame, table: String, key: String,
      buckets: Int, sortCols: Seq[String] = Nil): Unit = {
    require(buckets > 0, "buckets must be positive")
    val w = df.write.mode("overwrite").format("parquet")
      .bucketBy(buckets, key)
    (if (sortCols.nonEmpty) w.sortBy(sortCols.head, sortCols.tail: _*)
     else w).saveAsTable(table)
  }

  /** The bucketed table back as a DataFrame (bucket metadata rides
   * along from the catalog — joins on the bucket key skip their
   * exchange). */
  def table(spark: SparkSession, name: String): DataFrame =
    spark.table(name)
}
