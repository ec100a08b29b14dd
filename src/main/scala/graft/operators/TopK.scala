package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/**
 * Exact per-group top-k selection ("keep the k best documents per
 * domain/language"). Written as the idiomatic
 * `row_number over (partition by group) <= k` — deliberately: since
 * Spark 3.5 the optimizer's `InferWindowGroupLimit` rule rewrites
 * this exact shape into a map-side PARTIAL group limit before the
 * exchange plus a FINAL one after it, so each input partition ships
 * at most k rows per group and the per-group task ranks at most
 * k·(#partitions) rows — the salted two-phase top-k pattern, built
 * into the engine (TopKSpec asserts the `WindowGroupLimit Partial`
 * node is present; a hand-rolled salt stage would only duplicate
 * it). No group's full row set ever crosses the shuffle or lands on
 * one task, at any group size.
 *
 * Output adds a `rank` column (1-based, `ord` then `tie` order).
 * `ord` should embed its direction (e.g. `col("score").desc`); `tie`
 * must be unique per row for a deterministic, engine-portable result.
 */
object TopK {

  def perGroup(df: DataFrame, group: Column, ord: Column, tie: Column,
      k: Int): DataFrame = {
    require(k >= 1, "k must be >= 1")
    df.withColumn("rank",
        row_number().over(Window.partitionBy(group).orderBy(ord, tie.asc)))
      .filter(col("rank") <= k)
  }
}
