package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/**
 * The `ckpt` contract of the iterative family: Local (localCheckpoint)
 * and Reliable (fault-tolerant checkpoint dir) modes must produce the
 * IDENTICAL frame — a checkpoint changes where blocks live, never
 * values — so a production run can flip to Reliable without touching
 * results.
 */
class CheckpointModeSpec extends SparkSpec {
  import spark.implicits._

  private lazy val reliable = {
    val dir = java.nio.file.Files
      .createTempDirectory("graft-ckpt").toString
    CheckpointMode.Reliable(dir)
  }

  test("pagerank: Local and Reliable modes produce identical ranks") {
    val edges = Seq(("a", "b"), ("b", "c"), ("c", "a"), ("a", "c"),
      ("d", "a")).toDF("s", "d")
    def run(m: CheckpointMode) =
      Graphs.pagerank(edges, col("s"), col("d"), iterations = 3, ckpt = m)
        .orderBy("node").collect().map(r => (r.getString(0), r.getLong(1)))
    assert(run(CheckpointMode.Local).toSeq == run(reliable).toSeq)
  }

  test("hits: Local and Reliable modes produce identical scores") {
    val edges = Seq(("a", "b"), ("b", "c"), ("a", "c"), ("c", "a"))
      .toDF("s", "d")
    def run(m: CheckpointMode) =
      Graphs.hits(edges, col("s"), col("d"), iterations = 2, ckpt = m)
        .orderBy("node").collect()
        .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    assert(run(CheckpointMode.Local).toSeq == run(reliable).toSeq)
  }

  test("personalizedPagerank: identical ranks across modes") {
    val edges = Seq(("a", "b"), ("b", "c"), ("c", "a"), ("d", "b"))
      .toDF("s", "d")
    val seeds = Seq("a").toDF("node")
    def run(m: CheckpointMode) =
      Graphs.personalizedPagerank(edges, col("s"), col("d"), seeds,
          iterations = 3, ckpt = m)
        .orderBy("node").collect().map(r => (r.getString(0), r.getLong(1)))
    assert(run(CheckpointMode.Local).toSeq == run(reliable).toSeq)
  }

  test("clusters: identical labels across modes, both algorithms") {
    // a 4-chain plus an isolated pair: exercises >1 label-prop round
    val pairs = Seq((1L, 2L), (2L, 3L), (3L, 4L), (10L, 11L))
      .toDF("id1", "id2")
    def run(m: CheckpointMode, stars: Boolean) =
      Dedup.clusters(pairs, alternatingStars = stars, ckpt = m)
        .orderBy("doc_id").collect()
        .map(r => (r.getLong(0), r.getLong(1)))
    assert(run(CheckpointMode.Local, stars = false).toSeq ==
      run(reliable, stars = false).toSeq)
    assert(run(CheckpointMode.Local, stars = true).toSeq ==
      run(reliable, stars = true).toSeq)
  }

  test("kmeansRun: identical assignment across modes") {
    val vecs = (0 until 12).map(i =>
      (i.toLong, Array(i.toFloat, (i % 3).toFloat))).toDF("vec_id", "emb")
    def run(m: CheckpointMode) =
      Embeddings.kmeansRun(vecs, col("vec_id"), col("emb"), k = 3,
          maxIters = 5, ckpt = m)
        .orderBy("vec_id").collect()
        .map(r => (r.getLong(0), r.getLong(1)))
    assert(run(CheckpointMode.Local).toSeq == run(reliable).toSeq)
  }
}
