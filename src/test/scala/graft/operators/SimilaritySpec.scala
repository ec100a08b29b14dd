package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class SimilaritySpec extends SparkSpec {
  import spark.implicits._

  def vecs(rows: (Long, Seq[Float])*) =
    rows.toSeq.toDF("vec_id", "embedding")

  test("cosine math: orthogonal, parallel, antiparallel") {
    val df = vecs(
      0L -> Seq(1f, 0f, 0f), 1L -> Seq(0f, 1f, 0f),
      2L -> Seq(2f, 0f, 0f), 3L -> Seq(-1f, 0f, 0f))
    val r = Similarity.cosineTopK(df, df.filter($"vec_id" === 0), k = 3)
      .collect().map(x => x.getLong(1) -> x.getDouble(2)).toMap
    assert(r(2L) == 1.0)
    assert(r(1L) == 0.0)
    assert(r(3L) == -1.0)
  }

  test("rangeSearch returns the full ball; no ranking window in the plan") {
    val df = vecs(
      0L -> Seq(1f, 0f, 0f), 1L -> Seq(1f, 0.1f, 0f),
      2L -> Seq(0.7f, 0.7f, 0f), 3L -> Seq(0f, 1f, 0f),
      4L -> Seq(-1f, 0f, 0f))
    val ball = Similarity.rangeSearch(df, df.filter($"vec_id" === 0),
      minSim = 0.5)
    val got = ball.collect().map(_.getLong(1)).toSet
    // sims vs v0: v1 ~0.995, v2 ~0.707, v3 = 0, v4 = -1
    assert(got == Set(1L, 2L))
    // the radius filter replaces the ranking window: no shuffle, no
    // window — only the query-side broadcast moves
    val plan = ball.queryExecution.executedPlan.toString
    assert(!plan.contains("Window") && !plan.contains("hashpartitioning") &&
      !plan.contains("rangepartitioning"),
      s"rangeSearch plan has a window/shuffle:\n$plan")
  }

  test("ivfRangeSearch: ball members from probed lists only") {
    // corpus split around two centroids; with nprobe=1 the query only
    // sees its own centroid's list — the IVF recall contract
    val df = vecs(
      0L -> Seq(1f, 0f), 1L -> Seq(0.9f, 0.1f), 2L -> Seq(0.8f, 0.2f),
      10L -> Seq(0f, 1f), 11L -> Seq(0.1f, 0.9f))
    val cents = vecs(100L -> Seq(1f, 0f), 200L -> Seq(0f, 1f))
    val near = Similarity.ivfRangeSearch(df, df.filter($"vec_id" === 0),
        cents, minSim = 0.0, nprobe = 1)
      .collect().map(_.getLong(1)).toSet
    assert(near == Set(1L, 2L)) // 10/11 live in the unprobed list
    val both = Similarity.ivfRangeSearch(df, df.filter($"vec_id" === 0),
        cents, minSim = 0.0, nprobe = 2)
      .collect().map(_.getLong(1)).toSet
    assert(both == Set(1L, 2L, 10L, 11L)) // all sims >= 0 here
  }

  test("brute-force top-k ranks by similarity with deterministic ties") {
    val df = vecs((0L to 20L).map(i =>
      i -> Seq(1f, i.toFloat / 20f, 0.5f)): _*)
    val top = Similarity.cosineTopK(df, df.filter($"vec_id" === 20), k = 5)
      .collect()
    assert(top.length == 5)
    assert(top.map(_.getLong(3)).toSeq == (1L to 5L))
    // nearest to vec 20 is vec 19 (closest direction)
    assert(top.head.getLong(1) == 19L)
  }

  test("IVF top-k probes the right lists and ranks exactly") {
    // two tight clusters around e1 and e2; centroids = one member of
    // each; a query near cluster 1 must rank its own cluster first
    val cluster1 = (0L to 4L).map(i => i -> Seq(10f, i.toFloat * 0.1f, 0f))
    val cluster2 = (5L to 9L).map(i => i -> Seq(0f, 10f, i.toFloat * 0.1f))
    val df = vecs(cluster1 ++ cluster2: _*)
    val r = Similarity.ivfTopK(df, df.filter($"vec_id" === 0),
      centroids = df.filter($"vec_id" === 2 || $"vec_id" === 7),
      k = 3, nprobe = 1).collect()
    assert(r.length == 3)
    assert(r.map(_.getLong(1)).toSet.subsetOf(Set(1L, 2L, 3L, 4L)))
    assert(r.map(_.getLong(3)).toSeq == Seq(1L, 2L, 3L))
    // nprobe=2 reaches the second list too and k widens
    val r2 = Similarity.ivfTopK(df, df.filter($"vec_id" === 0),
      centroids = df.filter($"vec_id" === 2 || $"vec_id" === 7),
      k = 9, nprobe = 2).collect()
    assert(r2.length == 9)
  }

  test("ivfRecallAudit: full recall when every list is probed, partial when not") {
    val cluster1 = (0L to 4L).map(i => i -> Seq(10f, i.toFloat * 0.1f, 0f))
    val cluster2 = (5L to 9L).map(i => i -> Seq(0f, 10f, i.toFloat * 0.1f))
    val df = vecs(cluster1 ++ cluster2: _*)
    val cents = df.filter($"vec_id" === 2 || $"vec_id" === 7)
    val idx = Similarity.ivfIndex(df, cents)
    val q = df.filter($"vec_id" === 0)
    // nprobe = #lists: the probe sees the whole corpus -> recall 1.0
    val full = Similarity.ivfRecallAudit(idx, df, q, cents, k = 8,
      nprobe = 2).collect()(0)
    assert(full.getAs[Long]("true_pairs") == 8L)
    assert(full.getAs[Long]("recall_micro") == 1000000L)
    // nprobe = 1 from a cluster-1 query: the 4 same-cluster truths are
    // found, the cross-cluster tail is not -> recall 4/8
    val part = Similarity.ivfRecallAudit(idx, df, q, cents, k = 8,
      nprobe = 1).collect()(0)
    assert(part.getAs[Long]("found_pairs") == 4L)
    assert(part.getAs[Long]("missed_pairs") == 4L)
    assert(part.getAs[Long]("recall_micro") == 500000L)
  }

  test("ivfIndex round-trips through parquet; indexed probe equals ivfTopK") {
    val cluster1 = (0L to 4L).map(i => i -> Seq(10f, i.toFloat * 0.1f, 0f))
    val cluster2 = (5L to 9L).map(i => i -> Seq(0f, 10f, i.toFloat * 0.1f))
    val df = vecs(cluster1 ++ cluster2: _*)
    val cents = df.filter($"vec_id" === 2 || $"vec_id" === 7)
    val dir = java.nio.file.Files.createTempDirectory("graft-ivf").toString
    Similarity.ivfIndex(df, cents).write.mode("overwrite").parquet(dir)
    val idx = spark.read.parquet(dir)
    // the assignment is the clustering: each vector in its own list
    assert(idx.count() == 10)
    assert(idx.filter($"vec_id" < 5 && $"cent_id" =!= 2).count() == 0)
    assert(idx.filter($"vec_id" >= 5 && $"cent_id" =!= 7).count() == 0)
    val q = df.filter($"vec_id" === 0)
    val direct = Similarity.ivfTopK(df, q, cents, k = 9, nprobe = 2)
      .collect().toSeq
    val indexed = Similarity.ivfTopKIndexed(idx, df, q, cents,
      k = 9, nprobe = 2).collect().toSeq
    assert(indexed == direct)
    // foreign centroid table (missing a referenced centroid) fails
    // loudly at scan time, not silently with wrong lists
    val e = intercept[Exception] {
      Similarity.ivfTopKIndexed(idx, df, q,
        cents.filter($"vec_id" === 2), k = 3, nprobe = 1).collect()
    }
    assert(e.getMessage.contains("absent from the supplied centroid"))
    // a params-tag mismatch fails loudly too
    val e2 = intercept[Exception] {
      Similarity.ivfTopKIndexed(
        idx.withColumn("idx_params", lit("ivf:v0")), df, q, cents,
        k = 3, nprobe = 1).collect()
    }
    assert(e2.getMessage.contains("probed as"))
  }

  test("ivfIndexUpsert equals a from-scratch rebuild; batch rows replace") {
    val cluster1 = (0L to 4L).map(i => i -> Seq(10f, i.toFloat * 0.1f, 0f))
    val cluster2 = (5L to 9L).map(i => i -> Seq(0f, 10f, i.toFloat * 0.1f))
    val df = vecs(cluster1 ++ cluster2: _*)
    val cents = df.filter($"vec_id" === 2 || $"vec_id" === 7)
    val base = Similarity.ivfIndex(df.filter($"vec_id" < 7), cents)
    val upserted = Similarity.ivfIndexUpsert(base,
      df.filter($"vec_id" >= 7), cents)
    val rebuilt = Similarity.ivfIndex(df, cents)
    assert(upserted.orderBy("vec_id").collect().toSeq ==
      rebuilt.orderBy("vec_id").collect().toSeq)
    // re-ingested vectors REPLACE their rows (no duplicates)
    val again = Similarity.ivfIndexUpsert(upserted,
      df.filter($"vec_id" === 3), cents)
    assert(again.count() == 10)
    assert(again.filter($"vec_id" === 3).count() == 1)
  }

  test("ivfIndexDelete / pqDelete equal from-scratch builds on corpus minus ids") {
    val cluster1 = (0L to 4L).map(i => i -> Seq(10f, i.toFloat * 0.1f, 0f))
    val cluster2 = (5L to 9L).map(i => i -> Seq(0f, 10f, i.toFloat * 0.1f))
    val df = vecs(cluster1 ++ cluster2: _*)
    val cents = df.filter($"vec_id" === 2 || $"vec_id" === 7)
    val dels = Seq(1L, 8L, 99L).toDF("id") // 99 absent: no-op
    val remaining = df.filter(!$"vec_id".isin(1L, 8L))

    val idxDel = Similarity.ivfIndexDelete(
      Similarity.ivfIndex(df, cents), dels, col("id"))
    assert(idxDel.orderBy("vec_id").collect().toSeq ==
      Similarity.ivfIndex(remaining, cents).orderBy("vec_id")
        .collect().toSeq)

    val cb = vecs(100L -> Seq(10f, 0f, 0f), 101L -> Seq(0f, 10f, 0f))
    val codesDel = Similarity.pqDelete(
      Similarity.pqEncode(df, cb, m = 3), dels, col("id"))
    assert(codesDel.orderBy("vec_id").collect().toSeq ==
      Similarity.pqEncode(remaining, cb, m = 3).orderBy("vec_id")
        .collect().toSeq)
  }

  test("PQ: encode picks per-subspace nearest codewords; ADC ranks right") {
    // 4-dim vectors, m=2 subspaces of width 2. Codebook rows 100/101
    // give subspace codewords (1,0)/(0,1) in EACH subspace.
    val corpus = vecs(
      0L -> Seq(1f, 0f, 0f, 1f),   // codes (0, 1)
      1L -> Seq(0f, 1f, 1f, 0f),   // codes (1, 0)
      2L -> Seq(0.9f, 0.1f, 0.1f, 0.9f), // near vec 0 → codes (0, 1)
      3L -> Seq(0f, 1f, 0f, 1f))   // codes (1, 1)
    val cb = vecs(100L -> Seq(1f, 0f, 1f, 0f), 101L -> Seq(0f, 1f, 0f, 1f))
    val codes = Similarity.pqEncode(corpus, cb, m = 2)
    val byId = codes.collect()
      .map(r => r.getLong(0) -> r.getSeq[Int](1)).toMap
    assert(byId(0L) == Seq(0, 1) && byId(1L) == Seq(1, 0) &&
      byId(2L) == Seq(0, 1) && byId(3L) == Seq(1, 1))
    // ADC from a query equal to vec 0: same-code vecs (2) rank before
    // half-matching (3) before opposite (1)
    val top = Similarity.pqTopK(codes, corpus.filter($"vec_id" === 0),
      cb, m = 2, k = 3).collect()
    assert(top.map(_.getLong(1)).toSeq == Seq(2L, 3L, 1L))
    assert(top.map(_.getLong(3)).toSeq == Seq(1L, 2L, 3L))
    // ADC distance is the exact integer micro sum of subspace LUTs
    assert(top.head.getDouble(2) == top.head.getDouble(2)) // non-null
  }

  test("PQ property: ADC equals an in-memory reference on random vectors") {
    // random corpus/codebook; the engine's codes and ADC micro
    // distances must equal a straightforward in-memory PQ
    val rng = new scala.util.Random(13L)
    val m = 2
    val dim = 6
    def randVec() = Seq.fill(dim)((rng.nextInt(2000) - 1000) / 100f)
    val corpus = (0L until 30L).map(i => i -> randVec())
    val cbRows = (100L until 104L).map(i => i -> randVec())
    val df = vecs(corpus: _*)
    val cb = vecs(cbRows: _*)
    val w = dim / m
    def subD2(v: Seq[Float], c: Seq[Float], s: Int): Long = {
      def dot(a: Seq[Float], b: Seq[Float]) =
        a.zip(b).foldLeft(0.0)((acc, p) => acc + p._1.toDouble * p._2.toDouble)
      val a = v.slice(s * w, s * w + w)
      val b = c.slice(s * w, s * w + w)
      BigDecimal.valueOf((dot(a, a) - 2.0 * dot(a, b) + dot(b, b)) * 1e6)
        .setScale(0, BigDecimal.RoundingMode.HALF_UP).longValue
    }
    val cbSorted = cbRows.sortBy(_._1).map(_._2)
    def encode(v: Seq[Float]): Seq[Int] = (0 until m).map { s =>
      cbSorted.zipWithIndex.minBy { case (c, ix) => (subD2(v, c, s), ix) }._2
    }
    val expectCodes = corpus.map { case (id, v) => id -> encode(v) }.toMap
    val gotCodes = Similarity.pqEncode(df, cb, m).collect()
      .map(r => r.getLong(0) -> r.getSeq[Int](1).toSeq).toMap
    assert(gotCodes == expectCodes)
    // ADC against query 0 equals the reference LUT sums
    val q = corpus.head._2
    val expectD = corpus.tail.map { case (id, _) =>
      id -> expectCodes(id).zipWithIndex.map { case (c, s) =>
        subD2(q, cbSorted(c), s)
      }.sum
    }.toMap
    val got = Similarity.pqTopK(Similarity.pqEncode(df, cb, m),
        df.filter($"vec_id" === 0), cb, m, k = 29).collect()
      .map(r => r.getLong(1) -> math.round(r.getDouble(2) * 1e6)).toMap
    assert(got == expectD)
  }

  test("IVF-PQ: probes restrict candidates to lists; ADC ranks in-list") {
    val cluster1 = (0L to 4L).map(i => i -> Seq(10f, i.toFloat * 0.1f, 0f, 1f))
    val cluster2 = (5L to 9L).map(i => i -> Seq(0f, 10f, i.toFloat * 0.1f, 1f))
    val df = vecs(cluster1 ++ cluster2: _*)
    val cents = df.filter($"vec_id" === 2 || $"vec_id" === 7)
    val cb = df.filter($"vec_id" === 0 || $"vec_id" === 5)
    val idx = Similarity.ivfIndex(df, cents)
    val codes = Similarity.pqEncode(df, cb, m = 2)
    val r = Similarity.ivfPqTopK(idx, codes, df.filter($"vec_id" === 0),
      cents, cb, m = 2, k = 9, nprobe = 1).collect()
    // nprobe=1 from a cluster-1 query: candidates are cluster 1 only
    assert(r.nonEmpty && r.forall(_.getLong(1) < 5L))
    // nprobe=2 reaches both lists
    val r2 = Similarity.ivfPqTopK(idx, codes, df.filter($"vec_id" === 0),
      cents, cb, m = 2, k = 9, nprobe = 2).collect()
    assert(r2.length == 9)
  }

  test("pqTrain learns per-subspace codebooks pqEncode separates with") {
    // two tight 4-dim clusters; m=2, k=2 per subspace: after training,
    // encoding must give every cluster-1 member one code pair and
    // every cluster-2 member a different one
    val c1 = (0L to 4L).map(i => i -> Seq(10f, 0f, 10f, i.toFloat * 0.1f))
    val c2 = (5L to 9L).map(i => i -> Seq(0f, 10f, 0f, 10f + i.toFloat * 0.1f))
    val df = vecs(c1 ++ c2: _*)
    val cb = Similarity.pqTrain(df, m = 2, k = 2, maxIters = 5)
    assert(cb.count() >= 1 && cb.select(size($"embedding")).head().getInt(0) == 4)
    val codes = Similarity.pqEncode(df, cb, m = 2)
    val byId = codes.collect().map(r => r.getLong(0) -> r.getSeq[Int](1)).toMap
    val g1 = (0L to 4L).map(byId).distinct
    val g2 = (5L to 9L).map(byId).distinct
    assert(g1.size == 1 && g2.size == 1 && g1 != g2,
      s"clusters not separated: $g1 vs $g2")
  }

  test("hyperplane LSH finds the exact nearest neighbor for clustered data") {
    // two tight clusters; LSH must at least retrieve same-cluster items
    val a = (0L to 9L).map(i => i -> Seq(1f, 0.01f * i, 0f))
    val b = (10L to 19L).map(i => i -> Seq(-1f, 0f, 0.01f * (i - 10)))
    val df = vecs((a ++ b): _*)
    val res = Similarity.hyperplaneTopK(df, df.filter($"vec_id" === 0), k = 3,
      tables = 8, planes = 4).collect()
    assert(res.nonEmpty)
    assert(res.forall(r => r.getLong(1) < 10L), "neighbors must come from cluster A")
    assert(res.head.getDouble(2) > 0.99)
  }

  test("hard negatives: nearest different-label vectors, same-label never scores") {
    import spark.implicits._
    // anchor 0 (label A): vec 1 is nearly identical but SAME label
    // (excluded); vec 2 (label B) is the closest admissible negative
    val df = Seq(
      (0L, Seq(1f, 0f, 0f), "A"),
      (1L, Seq(1f, 0.001f, 0f), "A"),
      (2L, Seq(0.9f, 0.1f, 0f), "B"),
      (3L, Seq(0f, 1f, 0f), "B"),
      (4L, Seq(0f, 0f, 1f), "C")).toDF("vec_id", "embedding", "label")
    val out = Similarity.hardNegatives(df, df.filter($"vec_id" === 0), k = 2)
      .collect()
    assert(out.map(_.getLong(2)).toSeq == Seq(2L, 3L)) // by falling sim
    assert(out.forall(_.getString(3) != "A"))
    // the corpus side must not shuffle: anchors broadcast
    val plan = Similarity.hardNegatives(df, df.filter($"vec_id" === 0), k = 2)
      .queryExecution.executedPlan.toString
    assert(plan.contains("Broadcast"), plan)
  }

  test("zero vectors neither crash nor rank: cosine has no direction") {
    // ANSI mode turns 0/0 into an error — zero-norm rows must be
    // excluded before any division, on every similarity path
    val df = vecs(
      0L -> Seq(0f, 0f, 0f), 1L -> Seq(1f, 0f, 0f), 2L -> Seq(0.9f, 0.1f, 0f))
    val bf = Similarity.cosineTopK(df, df.filter($"vec_id" === 1), k = 5)
      .collect()
    assert(bf.map(_.getLong(1)).toSeq == Seq(2L)) // the zero row is absent
    val ivf = Similarity.ivfTopK(df, df.filter($"vec_id" === 1),
      centroids = df.filter($"vec_id" === 2), k = 5, nprobe = 1).collect()
    assert(ivf.map(_.getLong(1)).toSeq == Seq(2L))
    val nd = Similarity.cosineNearDupPairs(df, threshold = 0.9,
      tables = 4, planes = 2).collect()
    assert(nd.map(r => (r.getLong(0), r.getLong(1))).toSet == Set((1L, 2L)))
  }

  test("cosine near-dup pairs over one corpus") {
    val df = vecs(
      0L -> Seq(1f, 0f, 0f), 1L -> Seq(1f, 0.001f, 0f),
      2L -> Seq(0f, 1f, 0f))
    val pairs = Similarity.cosineNearDupPairs(df, threshold = 0.999,
      tables = 8, planes = 2).collect()
    assert(pairs.map(r => (r.getLong(0), r.getLong(1))).toSet == Set((0L, 1L)))
  }

  test("cross-corpus pairs: left x right only, never within a side") {
    // 0 and 1 are near-identical but BOTH on the left — no pair; the
    // (left 0, right 2) alignment clears the threshold
    val l = vecs(0L -> Seq(1f, 0f, 0f), 1L -> Seq(1f, 0.001f, 0f))
    val r = vecs(2L -> Seq(0.9f, 0.1f, 0f), 3L -> Seq(0f, 1f, 0f))
    val pairs = Similarity.crossCosinePairs(l, r, threshold = 0.9,
        tables = 8, planes = 2)
      .collect().map(p => (p.getLong(0), p.getLong(1))).toSet
    assert(pairs == Set((0L, 2L), (1L, 2L)))
  }

  test("semantic near-dup: only same-cluster pairs score") {
    // 0 and 1 are near-identical but assigned to DIFFERENT clusters —
    // SemDeDup must not see that pair; 1 and 2 share a cluster and
    // clear the threshold
    val df = vecs(
      0L -> Seq(1f, 0f, 0f), 1L -> Seq(1f, 0.001f, 0f),
      2L -> Seq(0.9f, 0.1f, 0f), 3L -> Seq(0f, 1f, 0f))
    val assign = Seq((0L, 10), (1L, 20), (2L, 20), (3L, 20))
      .toDF("vec_id", "cluster")
    val pairs = Similarity.semanticNearDupPairs(df, assign, threshold = 0.9)
      .collect()
    assert(pairs.map(r => (r.getLong(1), r.getLong(2))).toSet ==
      Set((1L, 2L))) // (0,1) split across clusters; (1,3)/(2,3) below t
    assert(pairs.head.getInt(0) == 20)
  }

  test("LSH pair ops: bounded buckets are a no-op below maxBucket and " +
      "keep cliques together above") {
    // 30 near-parallel vectors (a replica clique) + 2 distant ones:
    // below maxBucket the bounded overloads must equal the unbounded
    // candidate set exactly; above, the clique's sketch bits agree so
    // its true pairs survive the key deepening
    val rows = (0L until 30L).map(i => i -> Seq(1f, 1e-4f * i, 0.01f)) ++
      Seq(90L -> Seq(0f, 1f, 0f), 91L -> Seq(0f, 0.9f, 0.1f))
    val df = vecs(rows: _*)
    def pairsOf(d: org.apache.spark.sql.DataFrame) =
      d.collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val exact = pairsOf(Similarity.cosineNearDupPairs(df, threshold = 0.99,
      tables = 4, planes = 2))
    assert(exact.nonEmpty)
    assert(pairsOf(Similarity.cosineNearDupPairs(df, threshold = 0.99,
      tables = 4, planes = 2, maxBucket = 64)) == exact) // 32 rows: no-op
    assert(pairsOf(Similarity.cosineNearDupPairs(df, threshold = 0.99,
      tables = 4, planes = 2, maxBucket = 4)) == exact) // clique coheres
    val l = vecs(rows.filter(_._1 % 2 == 0): _*)
    val r = vecs(rows.filter(_._1 % 2 == 1): _*)
    val exactX = pairsOf(Similarity.crossCosinePairs(l, r, threshold = 0.99,
      tables = 4, planes = 2))
    assert(exactX.nonEmpty)
    assert(pairsOf(Similarity.crossCosinePairs(l, r, threshold = 0.99,
      tables = 4, planes = 2, maxBucket = 64)) == exactX)
    assert(pairsOf(Similarity.crossCosinePairs(l, r, threshold = 0.99,
      tables = 4, planes = 2, maxBucket = 4)) == exactX)
  }

  test("semantic near-dup refinement: no-op below maxBucket, bounded above") {
    // 40 near-identical vectors in one cluster plus one distant pair:
    // with maxBucket >= 40 the refined overload must equal the exact
    // within-cluster pair set; with a small maxBucket the clique stays
    // together (near-identical vectors share every sketch bit) while
    // the work is bucket-bounded
    val rows = (0L until 40L).map(i =>
      i -> Seq(1f, 1e-4f * i, 0f)) :+ (90L -> Seq(0f, 1f, 0f))
    val df = vecs(rows: _*)
    val assign = rows.map { case (id, _) => (id, 7) }.toDF("vec_id", "cluster")
    val exact = Similarity.semanticNearDupPairs(df, assign, threshold = 0.9)
      .collect().map(r => (r.getLong(1), r.getLong(2))).toSet
    val refinedNoop = Similarity.semanticNearDupPairs(df, assign,
        threshold = 0.9, maxBucket = 64)
      .collect().map(r => (r.getLong(1), r.getLong(2))).toSet
    assert(refinedNoop == exact) // 41 <= 64: zero refinement bits
    val refined = Similarity.semanticNearDupPairs(df, assign,
        threshold = 0.9, maxBucket = 8)
      .collect().map(r => (r.getLong(1), r.getLong(2))).toSet
    // the 40-clique's sketch bits agree (vectors are near-parallel), so
    // every true pair survives the split; nothing new can appear
    assert(refined == exact)
  }

  test("semantic near-dup: null-cluster rows never pair, refined or not") {
    // the cluster equi-join's null-never-matches semantics must
    // survive refinement: a null sub-key (concat null-propagates)
    // keeps null-assigned rows out, exactly as the SQL mirror's ||
    val df = vecs(0L -> Seq(1f, 0f, 0f), 1L -> Seq(1f, 1e-4f, 0f),
      2L -> Seq(1f, 2e-4f, 0f))
    val assign = Seq((0L, Some(5)), (1L, None), (2L, None))
      .toDF("vec_id", "cluster")
    assert(Similarity.semanticNearDupPairs(df, assign, threshold = 0.9)
      .collect().isEmpty)
    assert(Similarity.semanticNearDupPairs(df, assign, threshold = 0.9,
      maxBucket = 1).collect().isEmpty)
  }

  test("semantic near-dup: zero vectors are excluded, each pair once") {
    val df = vecs(0L -> Seq(0f, 0f, 0f), 1L -> Seq(1f, 0f, 0f),
      2L -> Seq(1f, 0f, 0f))
    val assign = Seq((0L, 1), (1L, 1), (2L, 1)).toDF("vec_id", "cluster")
    val pairs = Similarity.semanticNearDupPairs(df, assign, threshold = 0.5)
      .collect()
    assert(pairs.map(r => (r.getLong(1), r.getLong(2))).toSeq ==
      Seq((1L, 2L)))
  }

  test("decontaminateSemantic: max-sim profile, ties, zero vectors, coverage") {
    val evalSet = vecs(0L -> Seq(1f, 0f, 0f), 1L -> Seq(1f, 0f, 0f),
      2L -> Seq(0f, 1f, 0f))
    val corpus = vecs(
      10L -> Seq(2f, 0f, 0f),   // parallel to eval 0 AND 1 → tie, picks 0
      11L -> Seq(0f, 0f, 1f),   // orthogonal to every eval vector
      12L -> Seq(0f, 0f, 0f),   // zero norm: null sim, never flagged
      13L -> Seq(1f, 1f, 0f))   // cos 1/√2 to eval 0/1/2 → tie, picks 0
    val out = Similarity.decontaminateSemantic(corpus, evalSet, threshold = 0.9)
      .orderBy($"vec_id")
      .collect().map(r => r.getLong(0) ->
        (Option(r.get(1)).map(_.asInstanceOf[Long]),
         Option(r.get(2)).map(_.asInstanceOf[Double]), r.getBoolean(3))).toMap
    assert(out.keySet == Set(10L, 11L, 12L, 13L)) // every corpus row once
    assert(out(10L) == (Some(0L), Some(1.0), true))
    assert(out(11L) == (Some(0L), Some(0.0), false)) // max over all-zero sims
    assert(out(12L) == (None, None, false))
    assert(out(13L)._1 == Some(0L) && !out(13L)._3)
    assert(math.abs(out(13L)._2.get - 1.0 / math.sqrt(2)) < 1e-12)
  }

  test("decontaminateSemantic: null-embedding corpus rows still emit once") {
    val evalSet = vecs(0L -> Seq(1f, 0f))
    val corpus = Seq((10L, Seq(1f, 0f)), (11L, null))
      .toDF("vec_id", "embedding")
    val out = Similarity.decontaminateSemantic(corpus, evalSet, 0.5)
      .collect().map(r => r.getLong(0) ->
        (r.isNullAt(2), r.getBoolean(3))).toMap
    assert(out.keySet == Set(10L, 11L))
    assert(out(11L) == ((true, false)))
  }

  test("decontaminateSemantic broadcasts the eval side") {
    val evalSet = vecs(0L -> Seq(1f, 0f))
    val corpus = vecs((10L to 40L).map(i => i -> Seq(i.toFloat, 1f)): _*)
    val df = Similarity.decontaminateSemantic(corpus, evalSet, 0.5)
    df.collect()
    val p = df.queryExecution.executedPlan.toString
    assert(p.contains("BroadcastExchange"), s"eval side not broadcast:\n$p")
  }

  test("residual IVF-PQ with the full residual codebook is exact in-list L2") {
    import spark.implicits._
    // two clusters around (10,0,0,0) and (0,10,0,0); every residual in
    // the codebook → each vector encodes to ITS OWN residual, so ADC
    // = ||(q−c) − (x−c)||² = ||q−x||² up to the per-subspace micro
    // rounding (≤ m/2 micro each way)
    val rows = Seq(
      (0L, Array(10f, 0f, 0.5f, 0f)), (1L, Array(10.5f, 0f, 0f, 0.25f)),
      (2L, Array(9.5f, 0.5f, 0f, 0f)), (3L, Array(0f, 10f, 0f, 0.5f)),
      (4L, Array(0.5f, 10.5f, 0f, 0f)), (5L, Array(0f, 9.5f, 0.25f, 0f)))
    val emb = rows.toDF("vec_id", "embedding")
    val cents = emb.filter($"vec_id" === 0 || $"vec_id" === 3)
    val idx = Similarity.ivfIndex(emb, cents).localCheckpoint()
    val rescb = Similarity.ivfResiduals(emb, idx, cents)
      .select($"vec_id", $"embedding").localCheckpoint()
    val codes = Similarity.pqEncodeResidual(emb, idx, cents, rescb, m = 2)
    val out = Similarity.ivfPqTopKResidual(idx, codes,
        emb.filter($"vec_id" < 2), cents, rescb, m = 2, k = 3, nprobe = 1)
      .select($"query_id", $"vec_id", $"adc_d2")
      .as[(Long, Long, Double)].collect()
    assert(out.nonEmpty)
    val byId = rows.toMap
    out.foreach { case (q, x, adc) =>
      val (qv, xv) = (byId(q), byId(x))
      val d2 = qv.zip(xv).map { case (a, b) =>
        (a.toDouble - b.toDouble) * (a.toDouble - b.toDouble) }.sum
      assert(math.abs(adc * 1e6 - d2 * 1e6) <= 2.0, // m subspace roundings
        s"q=$q x=$x adc=$adc true=$d2")
    }
    // in-list ranking follows true distance (cluster 0 queries see
    // only cluster-0 candidates under nprobe=1)
    out.groupBy(_._1).foreach { case (_, rs) =>
      assert(rs.map(_._3).toSeq == rs.map(_._3).toSeq.sorted)
      assert(rs.forall(r => Set(0L, 1L, 2L).contains(r._2) ==
        Set(0L, 1L, 2L).contains(r._1)))
    }
  }
}
