package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class EmbeddingsSpec extends SparkSpec {
  import spark.implicits._

  private lazy val vecs = Seq(
    (1L, Array(1.0f, -2.0f, 0.5f), 0),
    (2L, Array(0.0f, 0.0f, 0.0f), 0),   // zero vector
    (3L, Array(127.0f, 0.0f, 0.0f), 1),
    (4L, Array(10.0f, 10.0f, 10.0f), 1))
    .toDF("vec_id", "embedding", "label")

  test("quantize: grid, scale, zero vector, max error bound") {
    val out = Embeddings.quantize(vecs, $"vec_id", $"embedding")
      .select("vec_id", "scale", "q", "max_err")
      .as[(Long, Double, Array[Int], Double)].collect()
      .map(r => r._1 -> r).toMap
    // vec 1: scale = 2/127, q = round(x*127/2)
    assert(out(1L)._2 == 2.0 / 127)
    assert(out(1L)._3.sameElements(Array(64, -127, 32))) // 63.5 rounds half-up
    // zero vector: scale 0, q all zero, no NaN
    assert(out(2L)._2 == 0.0 && out(2L)._3.sameElements(Array(0, 0, 0)))
    assert(out(2L)._4 == 0.0)
    // exact representables: q*scale reconstructs exactly
    assert(out(3L)._3.sameElements(Array(127, 0, 0)) && out(3L)._4 == 0.0)
    // error bounded by scale/2 everywhere
    out.values.foreach(r => assert(r._4 <= r._2 / 2 + 1e-12))
  }

  test("covarianceFinalize is exact past the pre-r14 decimal emit ceiling") {
    // synthetic sketch for n = 2e10 rows (4x the old ~4.7e9 bound,
    // where the DECIMAL(38,0) emit chain overflowed): a virtual
    // corpus with dim-0 split evenly between ±0.5 (q = ±2^19 at
    // scaleBits = 20) and dim-1 constant 0.5 — cov must come out
    // EXACTLY (0.25, 0, 0) in micro units
    val q = BigInt(524288)
    val n = BigInt("20000000000")
    val sketch = Seq(
      ("n", -1L, -1L, n.toString),
      ("m", 0L, -1L, "0"),
      ("m", 1L, -1L, (n * q).toString),
      ("s", 0L, 0L, (n * q * q).toString),
      ("s", 0L, 1L, "0"),
      ("s", 1L, 1L, (n * q * q).toString))
      .toDF("stat", "i", "j", "v")
      .withColumn("v", col("v").cast("decimal(38,0)"))
    val got = Embeddings.covarianceFinalize(sketch, scaleBits = 20)
      .as[(Long, Long, Long)].collect()
      .map(r => (r._1, r._2) -> r._3).toMap
    assert(got((0L, 0L)) == 250000L)
    assert(got((1L, 1L)) == 0L)
    assert(got((0L, 1L)) == 0L && got((1L, 0L)) == 0L)
  }

  test("quantize plan is a pure projection: no shuffle") {
    val p = Embeddings.quantize(vecs, $"vec_id", $"embedding")
      .queryExecution.executedPlan.toString
    assert(!p.contains("Exchange"), s"quantize plan shuffles:\n$p")
  }

  test("centroids: per-label elementwise means") {
    val cents = Embeddings.centroids(vecs, $"embedding", $"label")
      .as[(Int, Array[Double])].collect().toMap
    assert(cents(0).sameElements(Array(0.5, -1.0, 0.25)))
    assert(cents(1).sameElements(Array(68.5, 5.0, 5.0)))
  }

  test("kmeansIter: vectors move to their nearest centroid") {
    val out = Embeddings.kmeansIter(vecs, $"vec_id", $"embedding", $"label")
      .select("vec_id", "old_label", "new_label")
      .as[(Long, Int, Int)].collect().map(r => r._1 -> r).toMap
    // centroid 0 = (0.5, -1, 0.25); centroid 1 = (68.5, 5, 5)
    assert(out(1L)._3 == 0) // (1,-2,0.5) stays near centroid 0
    assert(out(2L)._3 == 0) // origin is nearer centroid 0
    assert(out(3L)._3 == 1)
    assert(out(4L)._3 == 0) // (10,10,10): d2 to c0 ≈306 beats c1 ≈3472 — moves
  }

  test("kmeansIter: assignment argmin is an aggregate, not a window") {
    val p = Embeddings.kmeansIter(vecs, $"vec_id", $"embedding", $"label")
      .queryExecution.executedPlan.toString
    assert(!p.contains("Window"), s"assignment shuffles N·C rows:\n$p")
    assert(p.contains("BroadcastNestedLoopJoin") || p.contains("BroadcastExchange"),
      s"centroids not broadcast:\n$p")
  }

  test("trained centroids drive the IVF index end-to-end") {
    // train k=2 on two blobs, feed the learned centroids into ivfTopK:
    // with nprobe=1 a query probes only its own blob's list and must
    // return exactly the brute-force neighbors from that blob
    val blobs = ((0L to 9L).map(i => (i, Seq(0f, 0.01f * i))) ++
      (10L to 19L).map(i => (i, Seq(50f, 0.01f * i)))).toDF("vec_id", "embedding")
    val assign = Embeddings.kmeansRun(blobs, $"vec_id", $"embedding", k = 2)
    val cents = Embeddings.centroids(blobs.join(assign, "vec_id"),
        $"embedding", $"label")
      .select($"lbl".as("vec_id"),
        $"cv".cast("array<float>").as("embedding"))
    val q = blobs.filter($"vec_id" === 0)
    val ivf = Similarity.ivfTopK(blobs, q, cents, k = 5, nprobe = 1)
      .collect().map(_.getLong(1)).toSet
    val brute = Similarity.cosineTopK(blobs.filter($"vec_id" < 10), q, k = 5)
      .collect().map(_.getLong(1)).toSet
    assert(ivf == brute)
  }

  test("kmeansRun converges to a stable blob separation") {
    // two tight, well-separated blobs: Lloyd from any seeding must end
    // with each blob under one label, and the result must be a fixpoint
    val blobs = ((0L to 9L).map(i => (i, Seq(0f, 0.01f * i))) ++
      (10L to 19L).map(i => (i, Seq(50f, 0.01f * i)))).toDF("vec_id", "embedding")
    val out = Embeddings.kmeansRun(blobs, $"vec_id", $"embedding", k = 2)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val a = (0L to 9L).map(out).toSet
    val b = (10L to 19L).map(out).toSet
    assert(a.size == 1 && b.size == 1 && a != b)
    // fixpoint: one more iteration moves nothing
    val labeled = blobs.withColumn("label",
      when($"vec_id" < 10, a.head).otherwise(b.head))
    val again = Embeddings.kmeansIter(labeled, $"vec_id", $"embedding", $"label")
    assert(again.filter($"new_label" =!= $"old_label").count() == 0)
  }

  test("labelOutliers flags the example far from its own centroid") {
    // label A: four vectors near the origin plus one far outlier;
    // label B tight — nothing flags there
    val df = (Seq(
      (0L, Seq(0f, 0f), "A"), (1L, Seq(0.1f, 0f), "A"),
      (2L, Seq(0f, 0.1f), "A"), (3L, Seq(0.1f, 0.1f), "A"),
      (4L, Seq(10f, 10f), "A"),
      (5L, Seq(5f, 5f), "B"), (6L, Seq(5.1f, 5f), "B")))
      .toDF("vec_id", "embedding", "label")
    val out = Embeddings.labelOutliers(df, $"vec_id", $"embedding",
        $"label", threshold = 1.5)
      .collect().map(r => r.getLong(0) ->
        (r.getString(1), r.getBoolean(4))).toMap
    assert(out(4L) == (("A", true)))
    assert((0L to 3L).forall(i => !out(i)._2))
    assert(!out(5L)._2 && !out(6L)._2) // degenerate-spread label: no flags
  }

  test("randomProjection: deterministic ±1 matrix, exact linearity") {
    val m = Embeddings.signMatrix(4, 8, "jl")
    assert(m.length == 4 && m.forall(_.length == 8))
    assert(m.flatten.forall(v => v == 1.0 || v == -1.0))
    // seed-stable across calls, sensitive to the seed
    assert(Embeddings.signMatrix(4, 8, "jl").flatten.toSeq == m.flatten.toSeq)
    assert(Embeddings.signMatrix(4, 8, "other").flatten.toSeq != m.flatten.toSeq)

    val v = Array.tabulate(8)(j => (j + 1).toFloat)
    val df = Seq((1L, v), (2L, v.map(_ * 2f))).toDF("vec_id", "embedding")
    val out = Embeddings.randomProjection(df, $"vec_id", $"embedding",
        outDim = 4, inDim = 8)
      .as[(Long, Array[Double])].collect().toMap
    // component 0 equals the hand-computed sequential dot
    val expect0 = m(0).zip(v).foldLeft(0.0)((acc, p) => acc + p._1 * p._2)
    assert(out(1L)(0) == expect0)
    // ×2 input: float doubling and double sums are exact → exactly ×2
    assert(out(2L).toSeq == out(1L).map(_ * 2).toSeq)
    // empty/null vectors are filtered, not scored
    val e = Embeddings.randomProjection(
      Seq((3L, null: Array[Float]), (4L, Array.empty[Float]))
        .toDF("vec_id", "embedding"), $"vec_id", $"embedding", 4, 8)
    assert(e.count() == 0)
  }

  test("silhouette: hand-computed a/b/sil; negative for a mislabel") {
    // Vector 5 is labeled 0 but sits exactly ON label 1's centroid
    // (10, 1) → b = 0, a > 0, sil = −1.
    val df = Seq(
      (1L, Array(0.0f, 0.0f), 0), (2L, Array(0.0f, 2.0f), 0),
      (3L, Array(10.0f, 0.0f), 1), (4L, Array(10.0f, 2.0f), 1),
      (5L, Array(10.0f, 1.0f), 0))
      .toDF("vec_id", "embedding", "label")
    val got = Embeddings.silhouette(df, $"vec_id", $"embedding", $"label")
      .collect().map(r => r.getLong(0) ->
        (r.getDouble(2), r.getDouble(3), r.getDouble(4))).toMap
    def q6(x: Double) = math.round(x * 1e6) / 1e6
    // centroid 0 dragged by vec 5: ((0+0+10)/3, (0+2+1)/3) = (10/3, 1)
    val c0 = (10.0 / 3, 1.0); val c1 = (10.0, 1.0)
    def d(x: (Double, Double), c: (Double, Double)) =
      math.sqrt((x._1 - c._1) * (x._1 - c._1) + (x._2 - c._2) * (x._2 - c._2))
    def sil(v: (Double, Double), own: (Double, Double),
        other: (Double, Double)) = {
      val (a, b) = (d(v, own), d(v, other))
      (a, b, if (math.max(a, b) > 0) (b - a) / math.max(a, b) else 0.0)
    }
    for ((id, v, own, other) <- Seq(
        (1L, (0.0, 0.0), c0, c1), (2L, (0.0, 2.0), c0, c1),
        (3L, (10.0, 0.0), c1, c0), (4L, (10.0, 2.0), c1, c0),
        (5L, (10.0, 1.0), c0, c1))) {
      val (a, b, s) = sil(v, own, other)
      assert(got(id)._1 == q6(a) && got(id)._2 == q6(b),
        s"vec $id a/b mismatch: ${got(id)} vs ($a, $b)")
      assert(math.abs(got(id)._3 - s) < 2e-6, s"vec $id sil ${got(id)._3} vs $s")
    }
    // the mislabel is maximally negative, its in-place peers positive
    assert(got(5L)._3 == -1.0)
    assert(got(3L)._3 > 0.5 && got(4L)._3 > 0.5)
  }

  test("groupDrift: per-group centroid distance to the global " +
      "centroid, hand-computed") {
    // group a centroid (0,0), group b centroid (4,0) → global (2,0)
    // (equal sizes); both drift exactly 2.0
    val df = Seq(
      (1L, Array(0.0f, 1.0f), "a"), (2L, Array(0.0f, -1.0f), "a"),
      (3L, Array(4.0f, 1.0f), "b"), (4L, Array(4.0f, -1.0f), "b"))
      .toDF("vec_id", "embedding", "src")
    val got = Embeddings.groupDrift(df, $"embedding", $"src")
      .orderBy("grp").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(2)))
    assert(got.toSeq == Seq(("a", 2L, 2.0), ("b", 2L, 2.0)))
    // a lone centered group drifts 0
    val one = Seq((1L, Array(3.0f, 3.0f), "x")).toDF("vec_id", "embedding", "src")
    assert(Embeddings.groupDrift(one, $"embedding", $"src")
      .collect().head.getDouble(2) == 0.0)
  }

  test("representatives: k nearest-to-centroid per label, micro-d2 " +
      "order, vec_id tie-break") {
    // label 0 centroid = (1, 0): vec 2 sits on it (d2=0), vec 1 and
    // vec 3 are symmetric at d2=1 → tie broken by vec_id
    val df = Seq(
      (1L, Array(1.0f, 1.0f), 0), (2L, Array(1.0f, 0.0f), 0),
      (3L, Array(1.0f, -1.0f), 0),
      (4L, Array(9.0f, 9.0f), 1))
      .toDF("vec_id", "embedding", "label")
    val got = Embeddings.representatives(df, $"vec_id", $"embedding",
        $"label", k = 2)
      .orderBy("label", "rank").collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getLong(2), r.getInt(3)))
    // centroid 0 is ((1+1+1)/3, (1+0−1)/3) = (1, 0)
    assert(got.toSeq == Seq(
      (0, 2L, 0L, 1), (0, 1L, 1000000L, 2), (1, 4L, 0L, 1)))
    // the rank<=k shape must lower to a partial WindowGroupLimit
    val p = Embeddings.representatives(df, $"vec_id", $"embedding",
      $"label", k = 2).queryExecution.executedPlan.toString
    assert(p.contains("WindowGroupLimit"), s"no group limit:\n$p")
  }

  test("silhouette: single-label corpus → null b/sil; coincident " +
      "centroids → sil 0") {
    val single = Seq((1L, Array(1.0f, 2.0f), 7), (2L, Array(3.0f, 4.0f), 7))
      .toDF("vec_id", "embedding", "label")
    val g1 = Embeddings.silhouette(single, $"vec_id", $"embedding", $"label")
      .collect()
    assert(g1.forall(r => r.isNullAt(3) && r.isNullAt(4)))
    assert(g1.forall(r => !r.isNullAt(2)))
    // two labels, both centroids AT the same point, vectors on it:
    // a = b = 0 → sil pinned to 0, not NaN
    val coin = Seq((1L, Array(1.0f, 1.0f), 0), (2L, Array(1.0f, 1.0f), 1))
      .toDF("vec_id", "embedding", "label")
    val g2 = Embeddings.silhouette(coin, $"vec_id", $"embedding", $"label")
      .collect().map(r => (r.getDouble(2), r.getDouble(3), r.getDouble(4)))
    assert(g2.forall(t => t == ((0.0, 0.0, 0.0))))
  }
}
