package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/**
 * Embeddings.covarianceMicro / pcaPowerMicro / pcaProject — the exact
 * integer-grid covariance + power-iteration family. Checks
 * hand-computed covariance cells, convergence to the dominant axis,
 * projection exactness against a BigInt reimplementation, and the
 * wrong-length/null-vector exclusion.
 */
class PcaSpec extends SparkSpec {
  import spark.implicits._

  private val B = 1L << 20 // the 2^20 grid
  private def vecs2 = Seq(
    (1L, Array(1.0f, 0.0f)),
    (2L, Array(-1.0f, 0.0f)),
    (3L, Array(2.0f, 1.0f)),
    (4L, Array(-2.0f, -1.0f))
  ).toDF("vec_id", "embedding")

  test("covariance matches the exact hand formula on a tiny frame") {
    val got = Embeddings.covarianceMicro(vecs2, col("embedding"), dim = 2)
      .orderBy("i", "j").collect()
      .map(r => ((r.getLong(0), r.getLong(1)), r.getLong(2))).toMap
    // grid-exact components: +-1, +-2 scale exactly; means are zero, so
    // cov = E[x_i x_j] exactly. var(x0) = (1+1+4+4)/4 = 2.5,
    // var(x1) = 0.5, cov(x0,x1) = (0+0+2+2)/4 = 1.0 — all in micro
    assert(got((0L, 0L)) == 2500000L)
    assert(got((1L, 1L)) == 500000L)
    assert(got((0L, 1L)) == 1000000L)
    assert(got((1L, 0L)) == 1000000L)
  }

  test("mean-centering: a constant offset does not change covariance") {
    val shifted = vecs2.select(col("vec_id"),
      transform(col("embedding"), x => x + lit(0.25f)).as("embedding"))
    val a = Embeddings.covarianceMicro(vecs2, col("embedding"), 2)
      .orderBy("i", "j").collect().map(_.getLong(2)).toSeq
    val b = Embeddings.covarianceMicro(shifted, col("embedding"), 2)
      .orderBy("i", "j").collect().map(_.getLong(2)).toSeq
    assert(a == b)
  }

  test("power iteration finds the dominant axis; projections are exact") {
    val cov = Embeddings.covarianceMicro(vecs2, col("embedding"), 2)
    val v = Embeddings.pcaPowerMicro(cov, dim = 2, iters = 8)
    // dominant eigenvector of [[2.5, 1.0], [1.0, 0.5]] is ~(0.92, 0.38):
    // component 0 dominates, same sign, infinity-norm = 1e6
    assert(v.map(math.abs).max == 1000000L)
    assert(math.abs(v(0)) == 1000000L)
    assert(v(0) * v(1) > 0, s"components flipped sign: ${v.toSeq}")
    val ratio = v(1).toDouble / v(0).toDouble
    assert(ratio > 0.3 && ratio < 0.5, s"unexpected direction: ${v.toSeq}")

    val proj = Embeddings.pcaProject(vecs2, col("vec_id"), col("embedding"), v)
      .orderBy("vec_id").collect().map(r => (r.getLong(0), r.getLong(1)))
    val expected = Seq(
      1L -> (BigInt(v(0)) * B).toLong,
      2L -> (-BigInt(v(0)) * B).toLong,
      3L -> (BigInt(v(0)) * 2 * B + BigInt(v(1)) * B).toLong,
      4L -> (-BigInt(v(0)) * 2 * B - BigInt(v(1)) * B).toLong)
    assert(proj.toSeq == expected)
  }

  test("null and wrong-length vectors are excluded") {
    val mixed = Seq(
      (1L, Array(1.0f, 0.0f)),
      (2L, Array(1.0f, 0.0f, 3.0f)),
      (3L, null.asInstanceOf[Array[Float]])
    ).toDF("vec_id", "embedding")
    val cov = Embeddings.covarianceMicro(mixed, col("embedding"), dim = 2)
    assert(cov.count() == 4) // 2x2 cells from the single valid row
    val proj = Embeddings.pcaProject(mixed, col("vec_id"), col("embedding"),
      Array(1000000L, 0L))
    assert(proj.select("vec_id").as[Long].collect().toSeq == Seq(1L))
  }

  test("composed pca is deterministic across runs") {
    def run() = Embeddings.pca(vecs2, col("vec_id"), col("embedding"),
      dim = 2, iters = 4).orderBy("vec_id").collect().toSeq
    assert(run() == run())
  }

  test("deflation: second component is near-orthogonal and finds axis 2") {
    // three clusters of variance: axis 0 dominates, axis 1 second,
    // axis 2 noise-free zero — after deflating PC1 the power
    // iteration must land on axis 1
    val rows = Seq(
      (1L, Array(4.0f, 1.0f, 0.0f)), (2L, Array(-4.0f, 1.0f, 0.0f)),
      (3L, Array(4.0f, -1.0f, 0.0f)), (4L, Array(-4.0f, -1.0f, 0.0f))
    ).toDF("vec_id", "embedding")
    val comps = Embeddings.pcaComponentsMicro(
      Embeddings.covarianceMicro(rows, col("embedding"), 3), dim = 3,
      m = 2, iters = 8)
    val v1 = comps(0); val v2 = comps(1)
    assert(math.abs(v1(0)) == 1000000L && math.abs(v1(1)) < 1000L,
      s"PC1 should be axis 0: ${v1.toSeq}")
    assert(math.abs(v2(1)) == 1000000L && math.abs(v2(0)) < 1000L,
      s"PC2 should be axis 1: ${v2.toSeq}")
    // orthogonality at grid resolution
    val dotVal = v1.zip(v2).map { case (a, b) => BigInt(a) * BigInt(b) }.sum
    val norm = BigInt(1000000L) * BigInt(1000000L)
    assert((dotVal.abs * 1000 / norm) < 5, s"not orthogonal: $dotVal")
    // pcaTopM projections are the exact per-component dots
    val proj = Embeddings.pcaTopM(rows, col("vec_id"), col("embedding"),
      dim = 3, m = 2, iters = 8).orderBy("vec_id").collect()
    val B = 1L << 20
    proj.zip(Seq(
      (4.0, 1.0), (-4.0, 1.0), (4.0, -1.0), (-4.0, -1.0))).foreach {
      case (r, (x0, x1)) =>
        val e0 = BigInt(v1(0)) * BigInt((x0 * B).toLong) +
          BigInt(v1(1)) * BigInt((x1 * B).toLong)
        val e1 = BigInt(v2(0)) * BigInt((x0 * B).toLong) +
          BigInt(v2(1)) * BigInt((x1 * B).toLong)
        assert(r.getLong(1) == e0.toLong && r.getLong(2) == e1.toLong)
    }
  }

  test("pcaOutliers: variance-normalized scores rank the true outlier first") {
    // cluster along axis 0 plus one point far out along axis 1 (the
    // LOW-variance direction): normalizing by lambda must rank it top
    val rows = Seq(
      (1L, Array(4.0f, 0.1f)), (2L, Array(-4.0f, -0.1f)),
      (3L, Array(3.5f, 0.05f)), (4L, Array(-3.5f, -0.05f)),
      (5L, Array(0.0f, 2.0f))
    ).toDF("vec_id", "embedding")
    val out = Embeddings.pcaOutliers(rows, col("vec_id"), col("embedding"),
        dim = 2, m = 2, iters = 8)
      .orderBy(desc("score_micro")).collect()
    assert(out.head.getLong(0) == 5L,
      s"true outlier not ranked first: ${out.map(_.toSeq).toSeq}")
    // per-component contributions are non-negative and sum to score
    out.foreach { r =>
      assert(r.getLong(1) >= 0 && r.getLong(2) >= 0)
      assert(r.getLong(3) == r.getLong(1) + r.getLong(2))
    }
  }

  test("pcaOutliers: Mahalanobis scores are shift-invariant (mean-centered)") {
    // a +1.0 offset lands exactly on the 2^20 grid, so the
    // covariance (shift-invariant) and components are IDENTICAL —
    // properly centered scores must then be bit-for-bit equal, while
    // the uncentered square would add a per-vector cross-term and
    // reorder the ranking on this decidedly non-zero-mean data
    val base = Seq(
      (1L, Array(4.0f, 0.1f)), (2L, Array(-4.0f, -0.1f)),
      (3L, Array(3.5f, 0.05f)), (4L, Array(-3.5f, -0.05f)),
      (5L, Array(0.0f, 2.0f)))
    val rows = base.toDF("vec_id", "embedding")
    val shifted = base.map { case (i, v) => (i, v.map(_ + 1.0f)) }
      .toDF("vec_id", "embedding")
    def scores(df: org.apache.spark.sql.DataFrame) =
      Embeddings.pcaOutliers(df, col("vec_id"), col("embedding"),
          dim = 2, m = 2, iters = 8)
        .orderBy("vec_id").collect()
        .map(r => (r.getLong(0), r.getLong(3))).toSeq
    assert(scores(rows) == scores(shifted))
  }

  test("pcaVariancesMicro: Rayleigh eigenvalues match the closed form") {
    // cov = [[2.5, 1.0], [1.0, 0.5]] micro: eigenvalues (3 ± sqrt(8))/2
    // = 2.914..., 0.0857...; deflation must find both, summing to the
    // trace up to grid rounding
    val lams = Embeddings.pcaVariancesMicro(
      Embeddings.covarianceMicro(vecs2, col("embedding"), 2),
      dim = 2, m = 2, iters = 12).map(_._2)
    assert(lams(0) > 2900000L && lams(0) < 2930000L, s"l1=${lams(0)}")
    assert(lams(1) > 75000L && lams(1) < 95000L, s"l2=${lams(1)}")
    assert(math.abs(lams.sum - 3000000L) < 5000L,
      s"trace mismatch: ${lams.toSeq}")
  }

  test("correlationPpm: exact signed r-squared, unit diagonal, null on flats") {
    val cov = Embeddings.covarianceMicro(vecs2, col("embedding"), 2)
    val r = Embeddings.correlationPpm(cov).orderBy("i", "j").collect()
      .map(x => ((x.getLong(0), x.getLong(1)),
        if (x.isNullAt(2)) None else Some(x.getLong(2)))).toMap
    assert(r((0L, 0L)).contains(1000000L) && r((1L, 1L)).contains(1000000L))
    // r^2 = cov^2/(v0*v1) = 1.0/(2.5*0.5) = 0.8, positive sign
    assert(r((0L, 1L)).contains(800000L) && r((1L, 0L)).contains(800000L))
    // anti-correlated pair: sign carries through
    val anti = Seq((1L, Array(1.0f, -1.0f)), (2L, Array(-1.0f, 1.0f)))
      .toDF("vec_id", "embedding")
    val ra = Embeddings.correlationPpm(
        Embeddings.covarianceMicro(anti, col("embedding"), 2))
      .orderBy("i", "j").collect()
    assert(ra.find(x => x.getLong(0) == 0 && x.getLong(1) == 1)
      .get.getLong(2) == -1000000L)
    // constant dimension -> zero variance -> null correlation
    val flat = Seq((1L, Array(1.0f, 0.5f)), (2L, Array(-1.0f, 0.5f)))
      .toDF("vec_id", "embedding")
    val rf = Embeddings.correlationPpm(
        Embeddings.covarianceMicro(flat, col("embedding"), 2))
      .collect().map(x => ((x.getLong(0), x.getLong(1)), x.isNullAt(2)))
      .toMap
    assert(rf((0L, 1L)) && rf((1L, 1L)))
  }

  test("covariance sketch merge is an exact homomorphism") {
    val all = Seq(
      (1L, Array(1.0f, 0.5f)), (2L, Array(-1.0f, 0.25f)),
      (3L, Array(2.0f, 1.0f)), (4L, Array(-2.0f, -1.0f)),
      (5L, Array(0.5f, -0.75f))
    ).toDF("vec_id", "embedding")
    val whole = Embeddings.covarianceMicro(all, col("embedding"), 2)
      .orderBy("i", "j").collect().map(_.toSeq).toSeq
    val parts = (0 until 2).map(p =>
      Embeddings.covarianceSketch(
        all.filter(pmod(col("vec_id"), lit(2)) === p), col("embedding"), 2))
    val merged = Embeddings.covarianceFinalize(
        Embeddings.covarianceMerge(parts.reduce(_ unionByName _)),
        scaleBits = 20)
      .orderBy("i", "j").collect().map(_.toSeq).toSeq
    assert(merged == whole)
    // associativity: merging a merged sketch with a third part works
    val extra = Seq((6L, Array(3.0f, 0.0f))).toDF("vec_id", "embedding")
    val withExtra = Embeddings.covarianceFinalize(
        Embeddings.covarianceMerge(
          Embeddings.covarianceMerge(parts.reduce(_ unionByName _))
            .unionByName(Embeddings.covarianceSketch(extra,
              col("embedding"), 2))), scaleBits = 20)
      .orderBy("i", "j").collect().map(_.toSeq).toSeq
    val direct = Embeddings.covarianceMicro(all.unionByName(extra),
        col("embedding"), 2)
      .orderBy("i", "j").collect().map(_.toSeq).toSeq
    assert(withExtra == direct)
  }

  test("covarianceSketchBy per-part rows equal separately-built sketches") {
    val all = Seq(
      (1L, Array(1.0f, 0.5f)), (2L, Array(-1.0f, 0.25f)),
      (3L, Array(2.0f, 1.0f)), (4L, Array(-2.0f, -1.0f)),
      (5L, Array(0.5f, -0.75f)), (6L, Array(3.0f, 0.0f)),
      (7L, Array(-0.5f, 2.0f))
    ).toDF("vec_id", "embedding")
    val by = Embeddings.covarianceSketchBy(all, col("embedding"),
      pmod(col("vec_id"), lit(3)), 2)
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(_.toSeq).sortBy(_.toString).toSeq
    (0 until 3).foreach { p =>
      assert(rows(by.filter(col("part") === p)
          .select(col("stat"), col("i"), col("j"), col("v"))) ==
        rows(Embeddings.covarianceSketch(
          all.filter(pmod(col("vec_id"), lit(3)) === p),
          col("embedding"), 2)),
        s"part $p sketch rows differ from the separate build")
    }
    // and the MERGED artifact (the embed_covariance_merged shape) is
    // bit-identical to merging the separate builds / the whole build
    val mergedBy = Embeddings.covarianceFinalize(
        Embeddings.covarianceMerge(
          by.select(col("stat"), col("i"), col("j"), col("v"))),
        scaleBits = 20)
      .orderBy("i", "j").collect().map(_.toSeq).toSeq
    val whole = Embeddings.covarianceMicro(all, col("embedding"), 2)
      .orderBy("i", "j").collect().map(_.toSeq).toSeq
    assert(mergedBy == whole)
  }

  test("covarianceDelete equals a from-scratch sketch on corpus minus deleted") {
    val all = Seq(
      (1L, Array(1.0f, 0.5f)), (2L, Array(-1.0f, 0.25f)),
      (3L, Array(2.0f, 1.0f)), (4L, Array(-2.0f, -1.0f)),
      (5L, Array(0.5f, -0.75f))
    ).toDF("vec_id", "embedding")
    val full = Embeddings.covarianceSketch(all, col("embedding"), 2)
    val deleted = all.filter(col("vec_id").isin(2L, 5L))
    val after = Embeddings.covarianceDelete(full, deleted,
      col("embedding"), 2)
    val scratch = Embeddings.covarianceSketch(
      all.filter(!col("vec_id").isin(2L, 5L)), col("embedding"), 2)
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(_.toSeq).sortBy(_.toString).toSeq
    assert(rows(after) == rows(scratch))
    // the finalized cells agree too (the artifact a standing PCA reads)
    assert(rows(Embeddings.covarianceFinalize(after, 20)) ==
      rows(Embeddings.covarianceFinalize(scratch, 20)))
    // deleting everything leaves the FROM-SCRATCH empty build (the
    // single ('n',-1,-1,0) row), bit-for-bit at the boundary too
    assert(rows(Embeddings.covarianceDelete(full, all, col("embedding"), 2))
      == rows(Embeddings.covarianceSketch(
        all.limit(0), col("embedding"), 2)))
    // deleting rows the sketch never ingested fails loudly
    val foreign = Seq((9L, Array(7.0f, 7.0f)), (10L, Array(7.0f, 7.0f)),
      (11L, Array(7.0f, 7.0f)), (12L, Array(7.0f, 7.0f)),
      (13L, Array(7.0f, 7.0f)), (14L, Array(7.0f, 7.0f)))
      .toDF("vec_id", "embedding")
    intercept[IllegalArgumentException] {
      Embeddings.covarianceDelete(full, all.unionByName(foreign),
        col("embedding"), 2)
    }
  }

  test("zero covariance keeps the start vector (no division by zero)") {
    val const = Seq((1L, Array(0.5f, 0.5f)), (2L, Array(0.5f, 0.5f)))
      .toDF("vec_id", "embedding")
    val cov = Embeddings.covarianceMicro(const, col("embedding"), 2)
    val v = Embeddings.pcaPowerMicro(cov, dim = 2, iters = 3)
    assert(v.toSeq == Seq(1000000L, 1000000L))
  }
}
