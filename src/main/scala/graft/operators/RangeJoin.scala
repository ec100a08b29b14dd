package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.ldiv

/**
 * Bucketed interval (range) join: match point rows to the interval
 * rows that contain them — event-to-window attribution, reading
 * assignment, log-to-deploy correlation. The reference can only
 * answer this one series and one range per HTTP request
 * (`handlers.go:177-216`); here it is a single distributed join over
 * every key at once.
 *
 * Spark lowers a raw `pt BETWEEN lo AND hi` join predicate to a
 * broadcast-nested-loop or sort-merge over the FULL cross of each
 * key group — quadratic in the hot keys. This operator restores an
 * equi-join: time is cut into fixed-width buckets, intervals are
 * exploded to every bucket they overlap (span/width + 1 copies —
 * callers pick `width` near the typical interval length so the
 * duplication is a small constant), points carry their single
 * bucket, and the join key becomes (keys…, bucket) — hash exchange
 * both sides, AQE-sized, no nested loop anywhere. The residual
 * `BETWEEN` filter inside the joined bucket discards the overhang.
 *
 * Exactness: a point belongs to exactly ONE bucket, so a (point,
 * interval) pair meets at most once — no post-join distinct is
 * needed (the property the gate's oracle checks).
 *
 * Both frames must share only the `on` key names; `ptCol`, `loCol`,
 * `hiCol` are resolved AFTER the join and must not collide.
 * Intervals are closed: `lo <= pt <= hi`.
 */
object RangeJoin {

  def pointInInterval(points: DataFrame, ptCol: String,
      intervals: DataFrame, loCol: String, hiCol: String,
      on: Seq[String], width: Long): DataFrame = {
    require(width > 0, "bucket width must be > 0")
    val p = points.withColumn("_bkt", ldiv(col(ptCol), width))
    val iv = intervals
      .filter(col(loCol) <= col(hiCol))
      .withColumn("_bkt",
        explode(sequence(ldiv(col(loCol), width), ldiv(col(hiCol), width))))
    p.join(iv, on :+ "_bkt")
      .filter(col(ptCol) >= col(loCol) && col(ptCol) <= col(hiCol))
      .drop("_bkt")
  }

  /**
   * Interval×interval OVERLAP join — "which sessions/deploys/windows
   * were concurrent": both sides explode to their covering buckets,
   * the join is an equi-join on (keys…, bucket), and the residual
   * closed-interval predicate `aLo ≤ bHi AND bLo ≤ aHi` keeps true
   * overlaps. Same motivation as [[pointInInterval]]: a raw overlap
   * predicate is a nested-loop/sort-merge cross per key group in
   * Spark; bucketing restores a hash join.
   *
   * An overlapping pair shares every bucket of its intersection — so
   * instead of a post-join `distinct` (a second full shuffle of the
   * pair volume), each pair is emitted in exactly ONE bucket: the
   * bucket of `max(aLo, bLo)`, the intersection's first bucket, which
   * both sides always cover when they overlap. The `_bkt =
   * greatest(aLo div w, bLo div w)` filter runs inside the joined
   * bucket, before anything else moves.
   *
   * The two frames must share only the `on` key names; lo/hi column
   * names must not collide across sides. Per-bucket work is
   * |left∩bucket|·|right∩bucket| — pick `width` near the typical
   * interval length (explode factor stays ~2) and note that output
   * volume itself is quadratic in true concurrency, which no plan can
   * undercut.
   */
  def intervalOverlap(left: DataFrame, leftLo: String, leftHi: String,
      right: DataFrame, rightLo: String, rightHi: String,
      on: Seq[String], width: Long): DataFrame = {
    require(width > 0, "bucket width must be > 0")
    val l = left.filter(col(leftLo) <= col(leftHi))
      .withColumn("_bkt",
        explode(sequence(ldiv(col(leftLo), width), ldiv(col(leftHi), width))))
    val r = right.filter(col(rightLo) <= col(rightHi))
      .withColumn("_bkt",
        explode(sequence(ldiv(col(rightLo), width), ldiv(col(rightHi), width))))
    l.join(r, on :+ "_bkt")
      .filter(col(leftLo) <= col(rightHi) && col(rightLo) <= col(leftHi))
      .filter(col("_bkt") ===
        greatest(ldiv(col(leftLo), width), ldiv(col(rightLo), width)))
      .drop("_bkt")
  }
}
