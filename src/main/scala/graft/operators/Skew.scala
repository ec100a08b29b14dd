package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * Skew-safe equi-join by key salting: when one probe-side key holds a
 * disproportionate share of the rows (the celebrity user, the empty
 * string, the boilerplate fingerprint), a plain hash join sends that
 * whole key to ONE task — the straggler that stalls a 1000-executor
 * stage. Salting splits the heavy key across `salts` buckets: the
 * probe side gets a deterministic salt in `[0, salts)`, the build
 * side replicates `salts`× (one copy per bucket), and the join runs
 * on `(key, salt)` — every bucket lands on a different task, cutting
 * the worst task's share of a key to `1/salts` at the price of a
 * `salts`× build-side fan-out (chosen small: the build side is the
 * SMALL side; for a genuinely large build side use AQE's skew-join
 * splitting instead, which this operator complements for the
 * perfectly-skewed single-key cases AQE's partition-splitting cannot
 * help — a single key is one partition no matter how AQE splits).
 *
 * The result is row-identical to the unsalted join (spec-asserted):
 * inner/left-semi matches pair each probe row with every build row of
 * its key exactly once (the build copy in its bucket), and a
 * `left_outer` probe row with no match surfaces once, from its own
 * bucket.
 *
 * The salt is derived from a caller-chosen column (`saltFrom`, e.g. a
 * row id) — NOT from randomness or partition ids, so the result is
 * reproducible across runs, engines, and partition layouts.
 */
object Skew {

  private val allowed = Set("inner", "left", "left_outer", "leftouter",
    "left_semi", "leftsemi", "left_anti", "leftanti")

  def saltedJoin(probe: DataFrame, build: DataFrame, probeKey: Column,
      buildKey: Column, saltFrom: Column, salts: Int,
      joinType: String = "inner"): DataFrame = {
    require(salts >= 1, "salts must be >= 1")
    require(allowed.contains(joinType.toLowerCase),
      s"joinType $joinType would duplicate the replicated build side; " +
        "use inner/left/left_semi/left_anti")
    val p = probe.withColumn("__psalt",
      pmod(xxhash64(saltFrom), lit(salts.toLong)))
    val b = build.withColumn("__bsalt",
      explode(sequence(lit(0L), lit(salts.toLong - 1))))
    p.join(b, probeKey === buildKey && col("__psalt") === col("__bsalt"),
        joinType)
      .drop("__psalt", "__bsalt")
  }
}
