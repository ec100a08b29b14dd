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
    val target = df.sparkSession.sparkContext.defaultParallelism
    if (df.rdd.getNumPartitions < target) df.repartition(target) else df
  }
}
