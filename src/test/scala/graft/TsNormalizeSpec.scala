package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import java.time.{Instant, LocalDateTime, ZoneOffset}

/**
 * The events-table epoch-ns contract under testdata schema drift: the
 * driver has shipped `ts` as BIGINT epoch ns, TIMESTAMP_NTZ, and (in
 * principle) TIMESTAMP — all three must normalize to the SAME ns
 * longs, and the SparkEntry smoke assertion must catch a frame that
 * doesn't.
 */
class TsNormalizeSpec extends SparkSpec {
  import spark.implicits._

  // 2024-01-10T00:00:00Z and a µs-offset sibling
  private val ns1 = 1704844800000000000L
  private val ns2 = 1704844800123456000L

  test("LongType ts passes through untouched") {
    val df = Seq(ns1, ns2).toDF("ts")
    val got = df.select(Queries.normalizeTsNs(col("ts"), LongType).as("ns"))
      .as[Long].collect().sorted
    assert(got.toSeq == Seq(ns1, ns2))
  }

  test("TIMESTAMP_NTZ ts normalizes tz-independently to epoch ns") {
    val rows = Seq(ns1, ns2).map(n => LocalDateTime.ofEpochSecond(
      n / 1000000000L, (n % 1000000000L).toInt, ZoneOffset.UTC))
    val df = spark.createDataFrame(
      spark.sparkContext.parallelize(rows.map(org.apache.spark.sql.Row(_))),
      StructType(Seq(StructField("ts", TimestampNTZType))))
    val got = df.select(Queries.normalizeTsNs(col("ts"), TimestampNTZType)
      .as("ns")).as[Long].collect().sorted
    assert(got.toSeq == Seq(ns1, ns2))
  }

  test("TIMESTAMP (ltz) ts normalizes to epoch ns") {
    val rows = Seq(ns1, ns2).map(n => Instant.ofEpochSecond(
      n / 1000000000L, n % 1000000000L))
    val df = spark.createDataFrame(
      spark.sparkContext.parallelize(rows.map(org.apache.spark.sql.Row(_))),
      StructType(Seq(StructField("ts", TimestampType))))
    val got = df.select(Queries.normalizeTsNs(col("ts"), TimestampType)
      .as("ns")).as[Long].collect().sorted
    assert(got.toSeq == Seq(ns1, ns2))
  }

  test("an un-normalizable ts type fails with a clear message") {
    val e = intercept[IllegalStateException] {
      Queries.normalizeTsNs(col("ts"), StringType)
    }
    assert(e.getMessage.contains("events.ts"))
  }

  test("eventsNs on the shipped testdata meets the ns contract") {
    val dir = "/root/testdata/sf0.001"
    assume(new java.io.File(dir).isDirectory)
    SparkEntry.assertEventsContract(spark, dir)
    // bounds land on the raw column as type-matched literals and
    // bracket the normalized output exactly
    val lo = 1704844800000000000L
    val hi = 1704931200000000000L
    val mm = Queries.eventsNs(spark, dir, Some(lo), Some(hi))
      .agg(min("ts"), max("ts")).head()
    assert(mm.getLong(0) >= lo && mm.getLong(1) < hi)
  }
}
