package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

class TopKSpec extends SparkSpec {
  import spark.implicits._

  private lazy val rows = {
    val rnd = new scala.util.Random(11)
    (1 to 800).map(i => (i.toLong, s"g${i % 5}", rnd.nextInt(50)))
      .toDF("id", "grp", "score")
  }

  test("top-k per group: exact ranks, ties broken by id") {
    val got = TopK.perGroup(rows, $"grp", $"score".desc, $"id", k = 7)
      .select("id", "grp", "score", "rank")
      .as[(Long, String, Int, Int)].collect().toSet
    val want = rows.withColumn("rank", row_number().over(
        Window.partitionBy($"grp").orderBy($"score".desc, $"id")))
      .filter($"rank" <= 7)
      .select("id", "grp", "score", "rank")
      .as[(Long, String, Int, Int)].collect().toSet
    assert(got == want && got.size == 35)
  }

  test("groups smaller than k return whole group, ranked") {
    val df = Seq((1L, "a", 9), (2L, "a", 3), (3L, "b", 1)).toDF("id", "grp", "score")
    val got = TopK.perGroup(df, $"grp", $"score".desc, $"id", k = 10)
      .select("id", "rank").as[(Long, Int)].collect().toSet
    assert(got == Set((1L, 1), (2L, 2), (3L, 1)))
  }

  test("optimizer inserts a map-side partial group limit (scale shape)") {
    // InferWindowGroupLimit must split the top-k into Partial (before
    // the exchange: each input partition ships <= k rows per group)
    // and Final — the property that keeps giant groups off one task
    val plan = TopK.perGroup(rows, $"grp", $"score".desc, $"id", k = 3)
      .queryExecution.executedPlan.toString
    assert(plan.contains("WindowGroupLimit"), plan)
    assert(plan.contains("Partial"), plan)
    val partialIdx = plan.indexOf("Partial")
    val exchangeIdx = plan.indexOf("Exchange")
    assert(exchangeIdx >= 0 && exchangeIdx < partialIdx, // plan prints top-down
      s"partial limit should sit below the exchange:\n$plan")
  }
}
