package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/**
 * Point-in-time (as-of) join: for every left row, attach the single
 * LATEST right row whose timestamp is <= the left row's, per key —
 * the feature-lookup / last-known-state join every event pipeline
 * needs and Spark has no operator for.
 *
 * Spark-first shape: NOT a range join (`l.ts >= r.ts` as a join
 * condition explodes to all preceding rows per key before a
 * dedup — quadratic per key) and NOT a per-key collect. Instead the
 * classic union trick, one shuffle total:
 *
 *  1. tag left rows side=1, right rows side=0, union them;
 *  2. one window per key ordered by (ts, side, tiebreak): running
 *     `last(right-payload, ignoreNulls)` over the preceding frame —
 *     each left row sees exactly the latest right row at-or-before
 *     its timestamp (right sorts BEFORE left on ties, so an
 *     equal-timestamp right row matches, like standard ASOF);
 *  3. keep side=1, flatten the matched payload (nulls when no right
 *     row precedes, left-outer semantics).
 *
 * Wall-clock is one hash exchange of |L|+|R| rows + a sequential
 * scan per key — keys (users, series, entities) are many at scale,
 * so parallelism holds; the window state is O(1) per key (a single
 * struct), never the key's history.
 *
 * Determinism: right rows tied on (key, ts) are ordered by
 * `rightOrd`, and `last` takes the greatest — so the match is a pure
 * function of the data, reproducible by the oracle's identical
 * window.
 *
 * `toleranceMs`-style bounds ride on the SAME unit as `ts`: a match
 * older than `tolerance` units is nulled out (the lookup expired),
 * keeping the left row.
 */
object AsOf {

  /**
   * @param on        equi-key column names (present on both sides)
   * @param leftTs    left timestamp column name
   * @param rightTs   right timestamp column name
   * @param rightOrd  right column name breaking (key, ts) ties —
   *                  greatest wins (a unique id makes it total)
   * @param rightPrefix prefix for the attached right columns
   * @param tolerance max lookback in ts units (None = unbounded)
   */
  def join(left: DataFrame, right: DataFrame, on: Seq[String],
      leftTs: String = "ts", rightTs: String = "ts",
      rightOrd: String, rightPrefix: String = "asof_",
      tolerance: Option[Long] = None): DataFrame = {
    require(on.nonEmpty, "as-of join needs at least one key column")
    val rPayload = right.columns.filterNot(on.contains).toSeq
    // leftTs re-emerges as its own output column; keeping it in the
    // payload too would duplicate the name
    val lCols = left.columns.filterNot(c => on.contains(c) || c == leftTs).toSeq

    val l = left.select(
      on.map(col) ++ Seq(
        col(leftTs).cast("long").as("_ats"),
        lit(1).as("_side"),
        // left-vs-left order within a tie is irrelevant (each left row
        // reads the same preceding right payload), any constant works
        lit(0L).as("_ord"),
        struct(lCols.map(col): _*).as("_l"),
        lit(null).cast(structType(right, rPayload)).as("_r")): _*)
    val r = right.select(
      on.map(col) ++ Seq(
        col(rightTs).cast("long").as("_ats"),
        lit(0).as("_side"),
        col(rightOrd).cast("long").as("_ord"),
        lit(null).cast(structType(left, lCols)).as("_l"),
        struct(rPayload.map(col): _*).as("_r")): _*)

    val w = Window.partitionBy(on.map(col): _*)
      .orderBy(col("_ats"), col("_side"), col("_ord"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val matchedRaw = last(col("_r"), ignoreNulls = true).over(w)
    val matched = tolerance.fold(matchedRaw)(tol =>
      when(matchedRaw.getField(rightTs) >= col("_ats") - lit(tol), matchedRaw))

    l.unionByName(r)
      .withColumn("_m", matched)
      .filter(col("_side") === 1)
      .select(on.map(col) ++
        Seq(col("_ats").as(leftTs)) ++
        lCols.map(c => col("_l").getField(c).as(c)) ++
        rPayload.map(c => col("_m").getField(c).as(rightPrefix + c)): _*)
  }

  private def structType(df: DataFrame, cols: Seq[String]) =
    org.apache.spark.sql.types.StructType(
      cols.map(c => df.schema(c)))
}
