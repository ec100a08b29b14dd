package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class SnapshotSpec extends SparkSpec {
  import spark.implicits._

  test("diff classifies adds, removals, edits; whitespace-only is unchanged") {
    val v1 = Seq((1L, "same doc"), (2L, "will change"), (3L, "will vanish"),
      (4L, "spaced   doc")).toDF("doc_id", "text")
    val v2 = Seq((1L, "same doc"), (2L, "has changed"), (5L, "brand new"),
      (4L, "spaced doc")).toDF("doc_id", "text")
    val out = Snapshot.diff(v1, v2, $"doc_id", $"text")
      .as[(Long, String)].collect().toMap
    assert(out == Map(1L -> "unchanged", 2L -> "modified", 3L -> "removed",
      5L -> "added", 4L -> "unchanged")) // run of spaces normalizes away
  }

  test("text never crosses the join: both sides project to (id, fp)") {
    val v = Seq((1L, "x")).toDF("doc_id", "text")
    val plan = Snapshot.diff(v, v, $"doc_id", $"text")
      .queryExecution.optimizedPlan.toString
    assert(!plan.toLowerCase.contains("join (") ||
      !plan.contains("text"), plan) // the join inputs carry fp, not text
  }
}
