package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class PipelineSpec extends SparkSpec {
  import spark.implicits._

  test("cleanCorpus assigns first-applicable drop reasons") {
    val good = "the cat sat of the mat and it is a good day to you that " * 3
    val docs = Seq(
      (0L, good),                       // keep
      (1L, good),                       // exact dup of 0
      (2L, good + "extra tail words"),  // near dup of 0 (high shingle overlap)
      (3L, "el perro y el gato de la casa que se fue en un dia y no " * 3), // keep (es)
      (4L, "der hund und die katze ist von dem haus mit zu den und " * 3),  // lang (de)
      (5L, "zz!!! ??? !!!"),            // lang (und) before quality
      (6L, ""),                         // empty
      (7L, null.asInstanceOf[String])   // empty (null)
    ).toDF("doc_id", "text")
    val r = Pipeline.cleanCorpus(docs, $"doc_id", $"text",
        langs = Seq("en", "es"), minQuality = 0.2, jaccardThreshold = 0.5)
      .orderBy("doc_id").collect()
    assert(r.map(x => (x.getLong(0), x.getString(2))).toSeq == Seq(
      0L -> "keep", 1L -> "exact_dup", 2L -> "near_dup",
      3L -> "keep", 4L -> "lang", 5L -> "lang",
      6L -> "empty", 7L -> "empty"))
    assert(r.map(_.getBoolean(1)).toSeq ==
      Seq(true, false, false, true, false, false, false, false))
  }

  test("carryCols thread input columns through to the verdict frame") {
    val good = "the cat sat of the mat and it is a good day to you that " * 3
    val docs = Seq((0L, good, "s1"), (1L, good, "s2"), (2L, "", "s2"))
      .toDF("doc_id", "text", "src")
    val r = Pipeline.cleanCorpus(docs, $"doc_id", $"text",
        langs = Seq("en"), minQuality = 0.2, jaccardThreshold = 0.5,
        carryCols = Seq("src"))
      .orderBy("doc_id").collect()
      .map(x => (x.getLong(0), x.getString(2), x.getString(3)))
    assert(r.toSeq == Seq((0L, "keep", "s1"), (1L, "exact_dup", "s2"),
      (2L, "empty", "s2")))
  }

  test("report rolls up a verdict frame; persisted verdicts report identically") {
    val good = "the cat sat of the mat and it is a good day to you that " * 3
    val docs = Seq((0L, good, "s1"), (1L, good, "s2"), (2L, "", "s2"),
      (3L, "zz!!! ??? !!!", "s1")).toDF("doc_id", "text", "src")
    val verdicts = Pipeline.cleanCorpus(docs, $"doc_id", $"text",
      langs = Seq("en"), minQuality = 0.2, jaccardThreshold = 0.5,
      carryCols = Seq("src"))
    val inline = Pipeline.report(verdicts, Seq("src"))
      .orderBy("src", "reason").collect().toSeq
    assert(inline.map(r => (r.getString(0), r.getString(1), r.getLong(2))) ==
      Seq(("s1", "keep", 1L), ("s1", "lang", 1L),
        ("s2", "empty", 1L), ("s2", "exact_dup", 1L)))
    // the production shape: verdicts persisted once, dashboards report
    // from the stored frame — identical rollup, zero pipeline re-runs
    val dir = java.nio.file.Files.createTempDirectory("graft-verdicts")
    verdicts.write.mode("overwrite").parquet(dir.toString)
    val stored = Pipeline.report(spark.read.parquet(dir.toString), Seq("src"))
      .orderBy("src", "reason").collect().toSeq
    assert(stored == inline)
  }

  test("perplexity stage drops the doc that doesn't read like the corpus") {
    // nine docs share a vocabulary; the outlier is all rare words →
    // every token scores at/near the OOV floor, far above the rest
    val docs = ((0L until 9L).map(i => (i, "the quick brown fox jumps")) :+
      (9L, "zyxw qvut srqp onml")).toDF("doc_id", "text")
    val out = Pipeline.cleanCorpus(docs, $"doc_id", $"text",
        langs = Seq("und"), minQuality = -1,
        maxAvgNll = 3.0, nllVocabK = 5)
      .orderBy("doc_id").collect().map(x => (x.getLong(0), x.getString(2)))
    assert(out.count(_._2 == "perplexity") == 1 && out(9)._2 == "perplexity")
    // disabled by default: same corpus, no perplexity drops
    val off = Pipeline.cleanCorpus(docs, $"doc_id", $"text",
        langs = Seq("und"), minQuality = -1)
      .collect().map(_.getString(2))
    assert(!off.contains("perplexity"))
  }

  test("useClusters resolves near-dup CHAINS to one keeper") {
    // chain d0 ~ d2 ~ d1 (growing prefixes; d0~d1 is below threshold):
    // the middle doc has the LARGEST id, so greedy id2-drops keep BOTH
    // d0 and d1, while the transitive closure keeps exactly d0
    def words(n: Int) = (0 until n).map(i => s"w$i").mkString(" ")
    val docs = Seq(
      (0L, words(40)),   // base
      (2L, words(48)),   // ~0.83 jaccard vs d0
      (1L, words(57))    // ~0.84 vs d2, ~0.69 vs d0 (< 0.8)
    ).toDF("doc_id", "text")

    def run(useClusters: Boolean) =
      Pipeline.cleanCorpus(docs, $"doc_id", $"text",
          langs = Seq("und"), minQuality = -1, jaccardThreshold = 0.8,
          useClusters = useClusters)
        .orderBy("doc_id").collect()
        .map(x => (x.getLong(0), x.getString(2))).toSeq

    assert(run(useClusters = false) == Seq(
      0L -> "keep", 1L -> "keep", 2L -> "near_dup"))
    assert(run(useClusters = true) == Seq(
      0L -> "keep", 1L -> "near_dup", 2L -> "near_dup"))
  }

  test("preferencePairs: best vs worst per cluster, deterministic ties") {
    import org.apache.spark.sql.functions.col
    val scored = Seq((1L, 0.9), (2L, 0.3), (3L, 0.6), // cluster 1
      (10L, 0.5), (11L, 0.5),                         // all-tied cluster
      (99L, 0.1))                                     // unclustered
      .toDF("doc_id", "s")
    val clusters = Seq((1L, 1L), (2L, 1L), (3L, 1L), (10L, 10L), (11L, 10L))
      .toDF("doc_id", "cluster_id")
    val out = Pipeline.preferencePairs(scored, col("doc_id"), col("s"),
        clusters)
      .orderBy("cluster_id")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(3),
        r.getDouble(5)))
    // cluster 1: chosen 1 (0.9), rejected 2 (0.3); tied cluster:
    // chosen = min id, rejected = max id, margin 0
    assert(out.toSeq == Seq((1L, 1L, 2L, 0.6), (10L, 10L, 11L, 0.0)))
    // margin floor drops the tied pair
    val strict = Pipeline.preferencePairs(scored, col("doc_id"), col("s"),
      clusters, minMargin = 0.1)
    assert(strict.collect().map(_.getLong(0)).toSeq == Seq(1L))
  }

  test("preferencePairs: a shared precomputed build equals an inline one") {
    import org.apache.spark.sql.functions.{col, length}
    // near-dup family (two word-level variants of one text) + noise:
    // the miner must produce the IDENTICAL frame whether it is handed
    // the dedup pass's materialized pairs/clusters or rebuilds them —
    // sharing the LSH build is a plan decision, never a result change
    val docs = Seq(
      (1L, "the quick brown fox jumps over the lazy dog again today"),
      (2L, "the quick brown fox jumps over the lazy dog again tonight"),
      (3L, "an entirely different document about spark physical plans"),
      (4L, "short text")).toDF("doc_id", "text")
    val scored = docs.select(col("doc_id"),
      length(col("text")).cast("double").as("s"))
    val pairs = Dedup.minhashPairs(docs, col("doc_id"), col("text"),
      threshold = 0.5).localCheckpoint()
    val shared = Pipeline.preferencePairs(scored, col("doc_id"), col("s"),
        Dedup.clusters(pairs).localCheckpoint())
      .orderBy("cluster_id").collect().toSeq
    val fromPairs = Pipeline.preferencePairsFromPairs(scored, col("doc_id"),
        col("s"), pairs)
      .orderBy("cluster_id").collect().toSeq
    val inline = Pipeline.preferencePairs(scored, col("doc_id"), col("s"),
        Dedup.clusters(Dedup.minhashPairs(docs, col("doc_id"), col("text"),
          threshold = 0.5)))
      .orderBy("cluster_id").collect().toSeq
    assert(shared.nonEmpty) // the variant pair must actually cluster
    assert(shared == fromPairs)
    assert(shared == inline)
  }

  test("lshMaxBucket: hot boilerplate cluster collapses to a few keepers; " +
      "healthy corpora unchanged") {
    val good = "the cat sat of the mat and it is a good day to you that " * 3
    // 40 slightly-perturbed copies of one page (near-dups, NOT exact)
    // + one ordinary doc; the bounded path must keep exactly the
    // min-id copy and drop the rest as near_dup via the anchor star
    val page = (1 to 120).map(j => s"w$j")
    val docs = ((0L until 40L).map { i =>
      (100L + i, (page.updated(60, s"h${i}x") :+ "tail").mkString(" "))
    } :+ (500L, good)).toDF("doc_id", "text")
    val r = Pipeline.cleanCorpus(docs, $"doc_id", $"text",
        langs = Seq("en", "und"), minQuality = 0.0,
        jaccardThreshold = 0.8, lshMaxBucket = 8)
      .orderBy("doc_id").collect()
      .map(x => (x.getLong(0), x.getString(2)))
    // the documented trade at a tiny cap: each refined sub-bucket
    // keeps its own min-id, so a HANDFUL of keepers survive (vs
    // exactly one on the exact path) — the cluster still collapses
    // ~5x while cost stays O(k)
    assert(r.count(_._2 == "near_dup") >= 30,
      s"hot cluster members must drop: ${r.toSeq.take(10)}")
    assert(r.find(_._1 == 100L).get._2 == "keep", "anchor keeps")
    assert(r.find(_._1 == 500L).get._2 == "keep")
    // no bucket over the cap on a small healthy corpus → identical
    // verdicts with and without the guard
    val plain = Seq((0L, good), (1L, good), (2L, "el perro y el gato " * 9))
      .toDF("doc_id", "text")
    def verdicts(maxB: Int) = Pipeline.cleanCorpus(plain, $"doc_id",
        $"text", langs = Seq("en", "es"), minQuality = 0.2,
        jaccardThreshold = 0.5, lshMaxBucket = maxB)
      .orderBy("doc_id").collect().map(x => (x.getLong(0), x.getString(2)))
      .toSeq
    assert(verdicts(Int.MaxValue) == verdicts(4096))
  }

  test("maxPiiHits: PII-laden docs drop as 'pii'; default cap is off") {
    val clean = "the cat sat on the mat and it is a good day for all " * 3
    val laden = clean + " contact a@b.co or c@d.org ip 1.2.3.4 " +
      "card 4111 1111 1111 1111 tel +1 555 010 0100"
    val docs = Seq((1L, clean), (2L, laden)).toDF("doc_id", "text")
    val r = Pipeline.cleanCorpus(docs, $"doc_id", $"text",
        langs = Seq("en", "und"), minQuality = 0.0, maxPiiHits = 2L)
      .orderBy("doc_id").collect().map(x => (x.getLong(0), x.getString(2)))
    assert(r.toSeq == Seq(1L -> "keep", 2L -> "pii"), r.toSeq.toString)
    // default Long.MaxValue cap: the stage is off, both keep
    val off = Pipeline.cleanCorpus(docs, $"doc_id", $"text",
        langs = Seq("en", "und"), minQuality = 0.0)
      .orderBy("doc_id").collect().map(x => (x.getLong(0), x.getString(2)))
    assert(off.toSeq == Seq(1L -> "keep", 2L -> "keep"))
  }

  test("takedown: one audited call, per-artifact counts, exact " +
      "rebuild-required naming") {
    val docs = Seq(
      (1L, "alpha beta gamma delta epsilon zeta eta theta"),
      (2L, "one two three four five six seven eight nine"),
      (3L, "takedown target doc with some words in it here"),
      (4L, "another ordinary document that simply survives"))
      .toDF("doc_id", "text")
    val toked = docs.withColumn("toks",
      transform(split($"text", " "),
        (_, i) => $"doc_id" * 100L + i.cast("long")))
    val wins = Packing.materializeWindows(
      Packing.packSequences(toked, $"doc_id",
        size($"toks").cast("long"), seqLen = 5L),
      $"doc_id", $"toks", seqLen = 5L).localCheckpoint()
    val cidx = Dedup.corpusIndex(docs, $"doc_id", $"text")
    val gidx = Dedup.gramIndex(docs, $"doc_id", $"text", l = 3)
    val dels = Seq(3L).toDF("doc_id")
    val res = Pipeline.takedown(dels, $"doc_id",
      Pipeline.TakedownArtifacts(
        corpusIndex = Some(cidx),
        gramIndex = Some(Pipeline.GramIndexRef(
          gidx, docs, $"doc_id", $"text", l = 3)),
        windows = Some(wins)))
    val rep = res.report
      .select($"artifact", $"rows_removed", $"rebuild_required")
      .collect()
      .map(r => (r.getString(0),
        if (r.isNullAt(1)) None else Some(r.getLong(1)),
        r.getBoolean(2))).toSeq
    // non-invertible families: named EXACTLY, rebuild-required, no
    // count (nothing was or could be removed in place)
    val rebuilds = rep.filter(_._3)
    assert(rebuilds.map(_._1).sorted == Pipeline.RebuildRequired.sorted)
    assert(rebuilds.forall(_._2.isEmpty))
    // configured artifacts: present with true removal counts
    val counted = rep.filterNot(_._3).map(x => x._1 -> x._2.get).toMap
    assert(counted.keySet == Set("corpus_index", "gram_index",
      "packed_windows"))
    assert(counted("corpus_index") == 1L) // one row per doc
    assert(counted("gram_index") ==
      gidx.count() - Dedup.gramIndex(docs.filter($"doc_id" =!= 3L),
        $"doc_id", $"text", l = 3).count())
    assert(counted("packed_windows") ==
      wins.count() - Packing.windowsTakedown(wins, dels, $"doc_id").count())
    assert(counted("packed_windows") > 0L, "fixture must drop windows")
    // unconfigured artifacts never appear as counted rows
    assert(!rep.exists(r => r._1 == "ivf_index" || r._1 == "pq_codes"))
    // the returned frames ARE the per-operator deletes
    assert(res.artifacts.keySet == Set("corpus_index", "gram_index",
      "packed_windows"))
    assert(res.artifacts("corpus_index").orderBy("doc_id").collect().toSeq ==
      Dedup.corpusIndexDelete(cidx, dels, $"doc_id")
        .orderBy("doc_id").collect().toSeq)
    assert(res.artifacts("packed_windows").orderBy("seq").collect().toSeq ==
      Packing.windowsTakedown(wins, dels, $"doc_id")
        .orderBy("seq").collect().toSeq)
  }
}
