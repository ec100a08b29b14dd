package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class SamplingSpec extends SparkSpec {
  import spark.implicits._

  private lazy val ids = (0L until 2000L).toDF("id")

  test("uniform keeps ~rate of rows, deterministically") {
    val kept = Sampling.uniform(ids, $"id", 0.3).select("id").as[Long].collect().sorted
    // deterministic: second run is byte-identical
    val again = Sampling.uniform(ids, $"id", 0.3).select("id").as[Long].collect().sorted
    assert(kept.sameElements(again))
    // close to the target rate (md5 is uniform; 2000 draws, ±5%)
    assert(math.abs(kept.length / 2000.0 - 0.3) < 0.05)
    // edge rates
    assert(Sampling.uniform(ids, $"id", 0.0).count() == 0)
    assert(Sampling.uniform(ids, $"id", 1.0).count() == 2000)
    assertThrows[IllegalArgumentException](Sampling.uniform(ids, $"id", 1.5))
  }

  test("uniform samples are nested across rates") {
    val s10 = Sampling.uniform(ids, $"id", 0.1).select("id").as[Long].collect().toSet
    val s30 = Sampling.uniform(ids, $"id", 0.3).select("id").as[Long].collect().toSet
    assert(s10.subsetOf(s30))
  }

  test("stratified applies per-stratum rates with default") {
    val df = ids.withColumn("g", when($"id" % 2 === 0, "en").otherwise("xx"))
    val kept = Sampling.stratified(df, $"id", $"g", Map("en" -> 0.5), default = 0.0)
    val langs = kept.select("g").distinct().as[String].collect().toSeq
    assert(langs == Seq("en")) // default 0 drops every other stratum
    // the en subset equals the uniform 0.5 sample restricted to en ids
    val uni = Sampling.uniform(df.filter($"g" === "en"), $"id", 0.5).count()
    assert(kept.count() == uni)
  }

  test("group-keyed split never straddles a group across splits") {
    // leakage-safe splitting: key the coordinate on a GROUP id (e.g.
    // a near-dup cluster) and every member lands in the same split
    val df = (0L until 300L).map(i => (i, i / 3)).toDF("id", "grp")
    val parts = Sampling.split(df, $"grp", Seq("train" -> 0.8, "test" -> 0.2))
    val straddling = parts.groupBy("grp")
      .agg(countDistinct("split").as("k")).filter($"k" > 1).count()
    assert(straddling == 0)
    assert(parts.select("split").distinct().count() == 2)
  }

  test("split is disjoint, exhaustive, and weight-proportional") {
    val parts = Sampling.split(ids, $"id", Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1))
    val counts = parts.groupBy("split").count().as[(String, Long)].collect().toMap
    assert(counts.values.sum == 2000) // exhaustive
    assert(math.abs(counts("train") / 2000.0 - 0.8) < 0.05)
    // disjoint by construction (one label column); appending a split
    // never moves rows between the existing ones
    val parts2 = Sampling.split(ids, $"id",
      Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1, "extra" -> 0.0))
    val joined = parts.as("a").join(parts2.as("b"), "id")
      .filter($"a.split" =!= $"b.split").count()
    assert(joined == 0)
  }
}
