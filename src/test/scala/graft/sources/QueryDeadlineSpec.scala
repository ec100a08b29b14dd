package graft.sources

import graft.SparkSpec

import scala.concurrent.duration.{Duration, DurationInt}

/** Deadline enforcement: a slow query's job group is cancelled by the
 * driver-side timer (reference: -maxQueryTime, query.go:219-227). */
class QueryDeadlineSpec extends SparkSpec {

  test("a slow job is cancelled at the deadline, not run to completion") {
    import spark.implicits._
    val t0 = System.nanoTime()
    val ex = intercept[QueryTimeoutException] {
      QueryDeadline.run(spark, 500.millis, "slow test query") {
        // 4 tasks × 30 s sleep: would take 30 s without cancellation
        spark.range(4).repartition(4)
          .mapPartitions { it => Thread.sleep(30000); it }
          .count()
      }
    }
    val elapsed = (System.nanoTime() - t0) / 1e9
    assert(ex.getMessage.contains("timed out"))
    assert(elapsed < 15.0, s"cancellation took ${elapsed}s — group not cancelled?")
  }

  test("fast queries pass through and clean up their job group") {
    val n = QueryDeadline.run(spark, 1.minute, "fast query") {
      spark.range(100).count()
    }
    assert(n == 100)
    // the timer must not fire later and cancel unrelated work
    assert(spark.sparkContext.getLocalProperty("spark.jobGroup.id") == null)
    Thread.sleep(50)
    assert(spark.range(10).count() == 10)
  }

  test("an already-late deadline is refused up front") {
    intercept[QueryTimeoutException] {
      QueryDeadline.run(spark, Duration.Zero, "late") { fail("must not run") }
    }
  }

  test("infinite timeout runs unguarded") {
    assert(QueryDeadline.run(spark, Duration.Inf, "unbounded") { 42 } == 42)
  }
}
