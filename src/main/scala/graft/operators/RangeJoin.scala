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
}
