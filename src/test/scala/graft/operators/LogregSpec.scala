package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/**
 * CorpusStats.logregQuality — the trained quality classifier.
 * Verifies (1) bit-exact agreement with an independent in-test
 * reimplementation of the arithmetic contract (integer features,
 * micro-quantized sigmoid residual, exact rational weight step),
 * (2) that training actually separates an easy corpus, (3) run-to-run
 * determinism, (4) the empty/null-text exclusion.
 */
class LogregSpec extends SparkSpec {
  import spark.implicits._

  // stopword-rich "good" docs vs punctuation-junk "bad" docs: the two
  // micro features the model reads (x1 punct, x2 stopword) are
  // strongly separated, so 4 GD rounds must order the scores
  private def toyDocs = Seq(
    (1L, "the cat is in the hat and it is you that know", "good"),
    (2L, "it is the best of the things and you like it", "good"),
    (3L, "the dog and the fox ran to you in a field", "good"),
    (4L, "@@@### $$$%% ^^^&&& !!!??? ***((( )))[[[", "bad"),
    (5L, "??!! ##@@ %%^^ &&** (()) {{}} [[]] ;;::", "bad"),
    (6L, "xqz jjj qqq zzz vvv www kkk", "bad"),
    (7L, "", "bad"), // excluded: empty text
    (8L, null.asInstanceOf[String], "bad") // excluded: null text
  ).toDF("doc_id", "text", "src")

  test("training separates an easy corpus and excludes empty/null text") {
    val out = CorpusStats.logregQuality(toyDocs, col("doc_id"), col("text"),
      col("src") === "good", iters = 4).orderBy("doc_id").collect()
    assert(out.map(_.getLong(0)).toSeq == Seq(1L, 2L, 3L, 4L, 5L, 6L))
    val (good, bad) = out.partition(_.getLong(1) == 1L)
    val minGood = good.map(_.getLong(3)).min // p_micro
    val maxBad = bad.map(_.getLong(3)).max
    assert(minGood > maxBad,
      s"classifier failed to separate: min good p=$minGood <= max bad p=$maxBad")
  }

  test("bit-exact vs an independent reimplementation of the contract") {
    val iters = 4
    val feats = toyDocs
      .filter(col("text").isNotNull && length(col("text")) > 0)
      .select(col("doc_id") +:
        when(col("src") === "good", 1L).otherwise(0L).as("y") +:
        CorpusStats.logregFeatures(col("text")).map { case (n, c) => c.as(n) }: _*)
      .orderBy("doc_id")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1),
        Array(r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5))))
    val n = feats.length
    val den = BigInt(n) * BigInt(1000000L)
    var w = Array.fill(4)(BigInt(0))
    for (_ <- 1 to iters) {
      val g = Array.fill(4)(BigInt(0))
      feats.foreach { case (_, y, x) =>
        val zPico = x.indices.map(j => w(j).toLong * x(j)).sum
        val p = 1.0 / (1.0 + math.exp(-(zPico.toDouble / 1.0e12)))
        val r = BigDecimal((p - y) * 1000000.0)
          .setScale(0, BigDecimal.RoundingMode.HALF_UP).toLong
        x.indices.foreach(j => g(j) += BigInt(r) * BigInt(x(j)))
      }
      w = w.indices.map { j =>
        val step = (g(j).abs * 2 + den) / (den * 2)
        w(j) - (if (g(j) < 0) -step else step)
      }.toArray
    }
    val expected = feats.map { case (id, y, x) =>
      val z = x.indices.map(j => w(j).toLong * x(j)).sum
      val p = BigDecimal(
          (1.0 / (1.0 + math.exp(-(z.toDouble / 1.0e12)))) * 1000000.0)
        .setScale(0, BigDecimal.RoundingMode.HALF_UP).toLong
      (id, y, z, p, p >= 500000L)
    }
    val got = CorpusStats.logregQuality(toyDocs, col("doc_id"), col("text"),
        col("src") === "good", iters = iters)
      .orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getBoolean(4)))
    assert(got.toSeq == expected.toSeq)
  }

  test("deterministic across runs") {
    def run() = CorpusStats.logregQuality(toyDocs, col("doc_id"),
        col("text"), col("src") === "good", iters = 3)
      .orderBy("doc_id").collect().toSeq
    assert(run() == run())
  }

  test("classifierReport: exact confusion counts and ppm metrics") {
    val scored = Seq(
      (true, true), (true, true), (true, false),
      (false, true), (false, false), (false, false)
    ).toDF("label", "pred")
    val r = CorpusStats.classifierReport(scored, col("label"), col("pred"))
      .collect()(0)
    assert((r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)) ==
      ((2L, 1L, 1L, 2L)))
    assert(r.getLong(4) == 666666L) // precision 2/3 truncated ppm
    assert(r.getLong(5) == 666666L) // recall 2/3
    assert(r.getLong(6) == 666666L) // f1 of equal prec/rec
    assert(r.getLong(7) == 666666L) // accuracy 4/6
    // nothing predicted positive: precision/f1 null, recall 0
    val none = Seq((true, false), (false, false)).toDF("label", "pred")
    val r2 = CorpusStats.classifierReport(none, col("label"), col("pred"))
      .collect()(0)
    assert(r2.isNullAt(4) && r2.getLong(5) == 0L && r2.isNullAt(6))
  }

  test("learning rate must be a positive rational; iters >= 1") {
    intercept[IllegalArgumentException] {
      CorpusStats.logregQuality(toyDocs, col("doc_id"), col("text"),
        col("src") === "good", iters = 0)
    }
    intercept[IllegalArgumentException] {
      CorpusStats.logregQuality(toyDocs, col("doc_id"), col("text"),
        col("src") === "good", lrNum = 0)
    }
  }
}
