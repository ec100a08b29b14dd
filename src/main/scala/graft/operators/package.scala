package graft

import org.apache.spark.sql.DataFrame

package object operators {

  /**
   * Spread a small scan across the cluster before per-row heavy
   * compute (per-shingle/per-token hashing, per-vector dot products):
   * a tiny input that parquet read as fewer partitions than there are
   * cores would otherwise pin the whole compute stage to those few
   * cores. Inputs already at-or-above default parallelism pass
   * through untouched, so at real scale this adds no shuffle.
   */
  def spread(df: DataFrame): DataFrame = {
    val spark = df.sparkSession
    val target = spark.sparkContext.defaultParallelism
    // Plan-side decision: a file scan splits at maxPartitionBytes, so
    // "fewer partitions than cores" ⟺ "estimated size below cores ×
    // split bytes" up to rounding — readable off the optimized plan's
    // statistics without materializing an RDD lineage just to count
    // partitions (df.rdd forces full physical planning + the
    // row-deserializer chain). Oversized estimates (join blowups) err
    // toward passing through, which is the no-shuffle default anyway.
    val splitBytes = spark.sessionState.conf.filesMaxPartitionBytes
    val size = df.queryExecution.optimizedPlan.stats.sizeInBytes
    if (size < BigInt(target) * splitBytes) df.repartition(target) else df
  }
}
