package graft.functions

import graft.SparkSpec
import graft.timelib.TimeLib
import org.apache.spark.sql.functions._

class TimeParseSpec extends SparkSpec {
  import spark.implicits._

  // the TimeLibSpec corpus shape: every format family + garbage
  private val inputs = Seq(
    "1346189040000000000",            // ns
    "1346189040000",                  // ms
    "1346189040",                     // s
    "2012",                           // year (≤ 10000 integer falls through)
    "2012-08-28T21:24:00Z",           // canonical
    "2012-08-28T21:24:00.123456789Z", // canonical + nanos
    "2012-08-28T21:24:00+02:00",      // RFC3339 offset
    "Tue, 28 Aug 2012 21:24:00 EST",  // RFC1123 (abbrev → UTC wall)
    "Tue, 28 Aug 2012 21:24:00 +0000",// RFC1123Z
    "Tue Aug 28 21:24:00 2012",       // ANSI C
    "2012-08-28T21:24",               // prefix THH:mm
    "2012-08-28T21",                  // prefix THH
    "2012-08-28",                     // date
    "2012-08",                        // month
    "not a time",                     // garbage → null
    "2012-13-40")                     // normalized-out-of-range → null

  test("TimeParseExpr equals TimeLib.parseTime on every format family") {
    val got = inputs.toDF("s")
      .select(col("s"), TimeParseExpr.timeParse(col("s")).as("ns"))
      .collect().map(r => r.getString(0) ->
        (if (r.isNullAt(1)) None else Some(r.getLong(1)))).toMap
    inputs.foreach { in =>
      assert(got(in) == TimeLib.parseTime(in), s"input: $in")
    }
    assert(got("not a time").isEmpty)
    assert(got("2012-08-28T21:24:00Z").contains(1346189040000000000L))
  }

  test("TimeParseExpr: null input yields null, not an NPE") {
    val got = Seq(Option("2012-08-28"), None).toDF("s")
      .select(TimeParseExpr.timeParse(col("s")).as("ns"))
      .collect().map(r => r.isNullAt(0))
    assert(got.toSeq == Seq(false, true))
  }

  test("TimeParseExpr stays inside whole-stage codegen") {
    val df = spark.range(8).selectExpr("cast(id as string) as s")
      .select(TimeParseExpr.timeParse(col("s")).as("ns"))
    val plan = df.queryExecution.executedPlan.toString
    // the `*(n)` prefix is the whole-stage-codegen marker: the
    // time_parse projection must sit INSIDE a codegen stage (a UDF
    // splits the stage around the call site)
    assert(plan.contains("*(1) Project [time_parse"), plan)
    df.collect() // and the generated code actually compiles + runs
  }
}
