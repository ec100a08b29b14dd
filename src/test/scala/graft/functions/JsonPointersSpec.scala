package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.Row
import graft.functions.JsonPointersExpr.jsonPointers

class JsonPointersSpec extends SparkSpec {
  import spark.implicits._

  def extract(doc: String, ptr: String): Row = {
    val df = Seq(doc).toDF("doc")
      .select(jsonPointers($"doc", Seq(ptr)).as("p"))
    df.select("p.p0.*").head()
  }

  test("scalar extraction with Go stringification funnel") {
    val doc = """{"a": {"b": 83}, "s": "hi", "t": true, "f": 1.5, "n": null}"""
    assert(extract(doc, "/a/b") == Row(2.toByte, "83", 83.0, null, "83"))
    assert(extract(doc, "/s") == Row(2.toByte, "hi", null, null, "hi"))
    assert(extract(doc, "/t").getString(1) == "true")
    assert(extract(doc, "/f") == Row(2.toByte, "1.5", 1.5, null, "1.5"))
    assert(extract(doc, "/n").getByte(0) == JsonPointersExpr.KindNull)
    assert(extract(doc, "/missing").getByte(0) == JsonPointersExpr.KindMissing)
  }

  test("RFC 6901: array index, escapes, keys with dots") {
    val doc = """{"arr": [10, 20, 30], "a/b": 1, "a~b": 2, "x.y": 3, "": 4}"""
    assert(extract(doc, "/arr/1").getString(1) == "20")
    assert(extract(doc, "/a~1b").getString(1) == "1") // ~1 = /
    assert(extract(doc, "/a~0b").getString(1) == "2") // ~0 = ~
    assert(extract(doc, "/x.y").getString(1) == "3")  // JSONPath can't
    assert(extract(doc, "/").getString(1) == "4")     // empty key
    assert(extract(doc, "/arr/9").getByte(0) == JsonPointersExpr.KindMissing)
  }

  test("object and array kinds carry keys/raw") {
    val doc = """{"o": {"k1": 1, "k2": 2}, "arr": [1, 2]}"""
    val o = extract(doc, "/o")
    assert(o.getByte(0) == JsonPointersExpr.KindObject)
    assert(o.getSeq[String](3) == Seq("k1", "k2"))
    assert(o.getString(4) == """{"k1":1,"k2":2}""")
    val a = extract(doc, "/arr")
    assert(a.getByte(0) == JsonPointersExpr.KindArray)
    assert(a.getString(4) == "[1,2]")
  }

  test("whole-doc pointer and multi-pointer single parse") {
    val doc = """{"kind": "Listing", "data": {"after": "t3_xyz"}}"""
    val df = Seq(doc).toDF("doc")
      .select(jsonPointers($"doc", Seq("", "/kind", "/data/after")).as("p"))
    val r = df.select("p.p0.kind", "p.p1.str", "p.p2.str").head()
    assert(r == Row(JsonPointersExpr.KindObject, "Listing", "t3_xyz"))
  }

  test("invalid JSON document yields null fields") {
    val df = Seq("not json").toDF("doc")
      .select(jsonPointers($"doc", Seq("/a")).as("p"))
    assert(df.select("p.p0").head().isNullAt(0))
  }

  test("number formatting matches Go float64 funnel in Spark") {
    val doc = """{"big": 1234567, "small": 0.00001, "neg": -42}"""
    assert(extract(doc, "/big").getString(1) == "1.234567e+06")
    assert(extract(doc, "/small").getString(1) == "1e-05")
    assert(extract(doc, "/neg").getString(1) == "-42")
  }
}
