package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class PackingSpec extends SparkSpec {
  import spark.implicits._

  private lazy val docs = Seq(
    (1L, 100L), (2L, 2048L), (3L, 0L), (4L, 5000L), (5L, 1L), (6L, 2047L))
    .toDF("id", "w")

  private def packed = Packing.packSequences(docs, $"id", $"w", seqLen = 2048L)
    .select("id", "start_seq", "offset", "n_seqs")
    .as[(Long, Long, Long, Long)].collect().map(r => r._1 -> r).toMap

  test("stream positions are the prefix sums in (hash, id) order") {
    // recompute the expected layout with the same hash coordinate
    val order = docs.withColumn("h", Sampling.fraction($"id"))
      .orderBy("h", "id").select("id", "w").as[(Long, Long)].collect()
    var cum = 0L
    order.foreach { case (id, w) =>
      val (_, start, off, n) = packed(id)
      assert(start == cum / 2048 && off == cum % 2048, s"doc $id")
      val expN = if (w == 0) 0L else (cum + w - 1) / 2048 - cum / 2048 + 1
      assert(n == expN, s"doc $id spans")
      cum += w
    }
  }

  test("offsets stay in [0, seqLen); empty docs span zero windows") {
    packed.values.foreach { case (id, _, off, n) =>
      assert(off >= 0 && off < 2048, s"doc $id")
      assert(n >= 0)
    }
    assert(packed(3L)._4 == 0)
  }

  test("windows are gap-free: total span covers exactly sum(w) units") {
    val total = docs.agg(sum($"w")).as[Long].head()
    val lastNeeded = (total + 2047) / 2048
    val maxEnd = packed.values.map { case (_, s, _, n) => s + math.max(n, 1) }.max
    assert(maxEnd == lastNeeded)
  }
}
