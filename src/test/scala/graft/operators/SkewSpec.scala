package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class SkewSpec extends SparkSpec {
  import spark.implicits._

  // 90% of probe rows share one key — the shape that stalls a plain join
  private lazy val probe = ((1 to 900).map(i => (i.toLong, "hot")) ++
    (901 to 1000).map(i => (i.toLong, s"k${i % 7}")))
    .toDF("row_id", "k")
  private lazy val build = (Seq("hot", "k0", "k1", "k2") ++ Seq("unmatched"))
    .zipWithIndex.map { case (k, i) => (k, i * 10) }.toDF("bk", "payload")

  test("salted inner join is row-identical to the plain join") {
    val plain = probe.join(build, $"k" === $"bk").select($"row_id", $"payload")
    val salted = Skew.saltedJoin(probe, build, $"k", $"bk",
        saltFrom = $"row_id", salts = 8)
      .select($"row_id", $"payload")
    assert(salted.exceptAll(plain).count() == 0)
    assert(plain.exceptAll(salted).count() == 0)
  }

  test("left join: unmatched probe rows survive exactly once") {
    val out = Skew.saltedJoin(probe, build, $"k", $"bk",
      saltFrom = $"row_id", salts = 4, joinType = "left")
    assert(out.count() == 1000) // every probe row exactly once
    // keys without a build row carry nulls
    assert(out.filter($"payload".isNull).count() ==
      probe.filter(!$"k".isInCollection(Seq("hot", "k0", "k1", "k2"))).count())
  }

  test("the hot key scatters across salt buckets") {
    val salted = probe.withColumn("s", pmod(xxhash64($"row_id"), lit(8L)))
      .filter($"k" === "hot")
    val buckets = salted.groupBy($"s").count().collect()
    assert(buckets.length == 8) // all buckets hit
    assert(buckets.map(_.getLong(1)).max < 900) // no bucket holds the key whole
  }

  test("semi/anti variants honor salting; disallowed types are rejected") {
    val semi = Skew.saltedJoin(probe, build, $"k", $"bk",
      saltFrom = $"row_id", salts = 4, joinType = "left_semi")
    assert(semi.count() == probe.filter(
      $"k".isInCollection(Seq("hot", "k0", "k1", "k2"))).count())
    val anti = Skew.saltedJoin(probe, build, $"k", $"bk",
      saltFrom = $"row_id", salts = 4, joinType = "left_anti")
    assert(anti.count() == 1000 - semi.count())
    intercept[IllegalArgumentException] {
      Skew.saltedJoin(probe, build, $"k", $"bk", $"row_id", 4, "right")
    }
  }
}
