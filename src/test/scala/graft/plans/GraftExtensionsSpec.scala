package graft.plans

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

class GraftExtensionsSpec extends AnyFunSuite {

  // extensions bind at session BUILD: when another suite already owns
  // the JVM's default session, getOrCreate() would return it and skip
  // the extensions — clear the defaults so the builder constructs a
  // fresh session (sharing any existing SparkContext), then restore.
  private lazy val spark = {
    val prevDefault = SparkSession.getDefaultSession
    val prevActive = SparkSession.getActiveSession
    SparkSession.clearDefaultSession()
    SparkSession.clearActiveSession()
    val s = SparkSession.builder()
      .master("local[2]")
      .appName("graft-ext-spec")
      .config("spark.sql.shuffle.partitions", 2)
      .config("spark.ui.enabled", "false")
      .withExtensions(new GraftExtensions)
      .getOrCreate()
    prevDefault.foreach(SparkSession.setDefaultSession)
    prevActive.foreach(SparkSession.setActiveSession)
    s
  }

  test("SQL functions evaluate through the same native expressions") {
    val r = spark.sql(
      """SELECT graft_hash60('abc') AS h,
                graft_simhash60(array('a', 'b')) AS sh,
                graft_dot(array(1.0D, 2.0D), array(3.0D, 4.0D)) AS d,
                graft_json_ptr('{"a": {"b": 7}}', '/a/b').p0.num AS n""").head()
    // md5('abc') = 900150983cd24fb0... → first 15 hex chars as long
    assert(r.getLong(0) == java.lang.Long.parseLong("900150983cd24fb", 16))
    assert(r.getLong(1) == graft.functions.SimHash60.fingerprint(
      org.apache.spark.sql.catalyst.util.ArrayData.toArrayData(
        Array(org.apache.spark.unsafe.types.UTF8String.fromString("a"),
          org.apache.spark.unsafe.types.UTF8String.fromString("b")))))
    assert(r.getDouble(2) == 11.0)
    assert(r.getDouble(3) == 7.0)
  }

  test("graft_parse_ts parses the lenient timestamp formats to epoch ns") {
    val r = spark.sql(
      """SELECT graft_parse_ts('2012-08-28T21:24:35.37465188Z') AS a,
                graft_parse_ts('1346189075374651880') AS b,
                graft_parse_ts('not a time') AS c""").head()
    assert(r.getLong(0) == 1346189075374651880L)
    assert(r.getLong(1) == 1346189075374651880L)
    assert(r.isNullAt(2))
  }

  test("non-literal pointer arguments are rejected at plan time") {
    val e = intercept[Exception] {
      spark.sql("SELECT graft_json_ptr('{}', lower('X'))").head()
    }
    assert(e.getMessage.contains("literal") || e.getMessage.contains("GRAFT"),
      e.getMessage)
  }
}
