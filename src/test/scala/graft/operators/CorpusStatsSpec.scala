package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class CorpusStatsSpec extends SparkSpec {
  import spark.implicits._

  test("topNgrams counts document frequency, not occurrences") {
    val docs = Seq(
      (1L, "a b a b a b"),   // "a b" appears 3x here but counts once
      (2L, "a b c"),
      (3L, "c d e")).toDF("doc_id", "text")
    val out = CorpusStats.topNgrams(docs, $"text", n = 2, k = 2)
      .as[(String, Long)].collect().toSeq
    // "a b" is in docs 1 and 2 (df=2, counted once per doc despite 3
    // occurrences in doc 1); the second row is the lexicographically
    // first of the df=1 ties ("a b"'s runner-ups start at "b a")
    assert(out == Seq(("a b", 2L), ("b a", 1L)))
  }

  test("topNgrams tie-break is lexicographic and stable") {
    val docs = Seq((1L, "x y"), (2L, "a b")).toDF("doc_id", "text")
    val out = CorpusStats.topNgrams(docs, $"text", n = 2, k = 1)
      .as[(String, Long)].collect().toSeq
    assert(out == Seq(("a b", 1L)))
  }

  test("quantiles match the built-in exact percentile") {
    val rnd = new scala.util.Random(7)
    val df = (1 to 500).map(i =>
      (if (i % 3 == 0) "g1" else "g2", rnd.nextInt(40).toLong))
      .toDF("grp", "v")
    val qs = Seq("q25" -> 0.25, "q50" -> 0.5, "q90" -> 0.9, "q100" -> 1.0)
    val got = CorpusStats.quantiles(df, $"grp", $"v", qs)
      .orderBy("grp")
      .as[(String, Double, Double, Double, Double)].collect().toSeq
    val want = df.groupBy($"grp")
      .agg(percentile($"v", lit(0.25)), percentile($"v", lit(0.5)),
        percentile($"v", lit(0.9)), percentile($"v", lit(1.0)))
      .orderBy("grp")
      .as[(String, Double, Double, Double, Double)].collect().toSeq
    assert(got.size == 2)
    got.zip(want).foreach { case (g, w) =>
      assert(g._1 == w._1)
      assert(math.abs(g._2 - w._2) < 1e-9, s"q25 $g vs $w")
      assert(math.abs(g._3 - w._3) < 1e-9, s"q50 $g vs $w")
      assert(math.abs(g._4 - w._4) < 1e-9, s"q90 $g vs $w")
      assert(math.abs(g._5 - w._5) < 1e-9, s"q100 $g vs $w")
    }
  }

  test("quantiles: single-value group and q=0/q=1 edges") {
    val df = Seq(("g", 5L), ("h", 1L), ("h", 3L)).toDF("grp", "v")
    val out = CorpusStats.quantiles(df, $"grp", $"v",
        Seq("lo" -> 0.0, "mid" -> 0.5, "hi" -> 1.0))
      .orderBy("grp").as[(String, Double, Double, Double)].collect().toSeq
    assert(out == Seq(("g", 5.0, 5.0, 5.0), ("h", 1.0, 2.0, 3.0)))
  }

  test("bm25 matches a hand-computed score and zeroes absent terms") {
    val docs = Seq(
      (1L, "cat dog cat"), (2L, "dog dog"), (3L, "bird")).toDF("doc_id", "text")
    val out = CorpusStats.bm25(docs, $"doc_id", $"text", Seq("cat"),
        k1 = 1.2, b = 0.75)
      .orderBy("doc_id").as[(Long, Double)].collect().toSeq
    // N=3, df(cat)=1, avglen=(3+2+1)/3=2; idf = ln(1 + 2.5/1.5)
    val idf = math.log(1.0 + (3.0 - 1.0 + 0.5) / (1.0 + 0.5))
    def s(tf: Double, len: Double) =
      idf * tf * 2.2 / (tf + 1.2 * (1.0 - 0.75 + 0.75 * len / 2.0))
    assert(math.abs(out.head._2 - s(2.0, 3.0)) < 1e-12)
    assert(out(1)._2 == 0.0 && out(2)._2 == 0.0)
  }

  test("bm25 ranks the rarer term higher at equal tf") {
    val docs = (1 to 20).map(i => (i.toLong, "common x")).toDF("doc_id", "text")
      .union(Seq((21L, "common rare")).toDF("doc_id", "text"))
    val out = CorpusStats.bm25(docs, $"doc_id", $"text", Seq("common", "rare"))
      .as[(Long, Double)].collect().toMap
    assert(out(21L) > out(1L)) // rare term dominates the shared one
  }

  test("unigramNll: rare and OOV tokens score higher; sums are exact") {
    // vocab of size 2 keeps {"the","cat"}; "zyx" falls out → OOV floor
    val docs = Seq(
      (1L, "the the the cat"),
      (2L, "the cat zyx zyx")).toDF("doc_id", "text")
    val out = CorpusStats.unigramNll(docs, $"doc_id", $"text", vocabK = 2)
      .as[(Long, Long, Long, Double)].collect()
      .map(r => r._1 -> r).toMap
    // total=8 tokens: the=4, cat=2, zyx=2 (cut from the 2-word vocab)
    def m(c: Long) = Math.round(-Math.log(c / 8.0) * 1e6)
    assert(out(1L)._2 == 4 && out(1L)._3 == 3 * m(4) + m(2))
    assert(out(2L)._2 == 4 && out(2L)._3 == m(4) + m(2) + 2 * m(1))
    assert(out(2L)._4 > out(1L)._4) // OOV-heavy doc is more surprising
    assert(out(1L)._4 == (3 * m(4) + m(2)) / (4 * 1e6))
  }

  test("unigramNll scoring is a pure projection over the scan") {
    val docs = Seq((1L, "a b"), (2L, "b c")).toDF("doc_id", "text")
    val scored = CorpusStats.unigramNll(docs, $"doc_id", $"text", vocabK = 8)
    // the scoring query itself (model already built) must not shuffle
    assert(!scored.queryExecution.executedPlan.toString.contains("Exchange"))
  }

  test("keywords: rare terms outrank common ones; OOV floors at max idf") {
    // "filler" is in every doc (idf 0 → never a keyword); "rare" is
    // OOV under vocabK=1 (only "filler" stays) → df floor 1, max idf
    val docs = Seq(
      (1L, "filler rare filler shared"),
      (2L, "filler shared filler"),
      (3L, "filler filler filler")).toDF("doc_id", "text")
    val out = CorpusStats.keywords(docs, $"doc_id", $"text", k = 2, vocabK = 1)
      .collect().map(r => (r.getLong(0), r.getLong(4)) -> r.getString(1)).toMap
    assert(out((1L, 1L)) == "rare" || out((1L, 1L)) == "shared")
    // both "rare" and "shared" score tf=1 * ln(3/1): tie → term asc
    assert(out((1L, 1L)) == "rare" && out((1L, 2L)) == "shared")
    // doc 3 has only the idf-0 word: its top keyword scores 0.0
    val d3 = CorpusStats.keywords(docs, $"doc_id", $"text", k = 1, vocabK = 8)
      .filter($"doc_id" === 3).collect().head
    assert(d3.getString(1) == "filler" && d3.getDouble(3) == 0.0)
  }

  test("dataCard: volumes, exact mean, dominant language with asc tie-break") {
    val docs = Seq(
      (1L, "a b c", "en", "s1"),     // 3 toks, 5 chars
      (2L, "d e", "de", "s1"),       // 2 toks, 3 chars
      (3L, "f", "fr", "s1"),         // tie de/fr/en at 1 → 'de' wins
      (4L, "g h", "en", "s2")).toDF("doc_id", "text", "lang", "source")
    val out = CorpusStats.dataCard(docs, $"source", $"text", $"lang")
      .orderBy("source").collect()
    val s1 = out(0)
    assert(s1.getAs[Long]("n_docs") == 3 && s1.getAs[Long]("n_tokens") == 6 &&
      s1.getAs[Long]("n_chars") == 9)
    assert(s1.getAs[Double]("mean_chars") == 3.0)
    assert(s1.getAs[Long]("n_langs") == 3)
    assert(s1.getAs[String]("top_lang") == "de") // 1-doc tie, lang asc
    val s2 = out(1)
    assert(s2.getAs[String]("top_lang") == "en" &&
      s2.getAs[Double]("top_lang_share") == 1.0)
  }

  test("LM builders fail loudly on an empty corpus/histogram") {
    val empty = Seq.empty[(Long, String)].toDF("doc_id", "text")
    val eh = Seq.empty[(String, Long)].toDF("g", "c")
    val e1 = intercept[IllegalArgumentException] {
      CorpusStats.trigramNllFromHists(empty, $"doc_id", $"text",
        eh, eh, eh)
    }
    assert(e1.getMessage.contains("empty corpus/histogram"))
    val e2 = intercept[IllegalArgumentException] {
      CorpusStats.bigramNll(empty, $"doc_id", $"text")
    }
    assert(e2.getMessage.contains("empty corpus/histogram"))
    val e3 = intercept[IllegalArgumentException] {
      CorpusStats.unigramModel(empty, $"text")
    }
    assert(e3.getMessage.contains("empty corpus/histogram"))
  }

  test("bigramNll: bigram hit, backoff, and OOV floor — hand-computed") {
    // corpus: "a b" ×3, "a c" ×1 → unigrams a=4,b=3,c=1 (total 8);
    // bigrams "a b"=3, "a c"=1. bigramK=1 keeps only "a b".
    val docs = Seq((1L, "a b"), (2L, "a b"), (3L, "a b"), (4L, "a c"))
      .toDF("doc_id", "text")
    val out = CorpusStats.bigramNll(docs, $"doc_id", $"text",
        vocabK = 8, bigramK = 1, alpha = 0.4)
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    def mU(c: Long) = Math.round(-Math.log(c / 8.0) * 1e6)
    def mB(c: Long) = Math.round(-Math.log(0.4 * (c / 8.0)) * 1e6)
    val hit = Math.round(-Math.log(3.0 / 4.0) * 1e6) // c("a b")/c("a")
    assert(out(1L) == mU(4) + hit)        // unigram start + bigram hit
    assert(out(4L) == mU(4) + mB(1))      // "a c" cut → backoff via c
    // a doc with an unseen word pays the OOV floor on both paths
    val oov = CorpusStats.bigramNll(
        docs.union(Seq((5L, "zz zz")).toDF("doc_id", "text")),
        $"doc_id", $"text", vocabK = 8, bigramK = 8, alpha = 0.4)
      .filter($"doc_id" === 5).head()
    // total is now 10; zz is OOV: start floor + backoff floor ("zz zz"
    // the bigram IS in the table though... bigramK=8 keeps it) — use
    // the scored value only as a smoke bound: strictly positive
    assert(oov.getLong(2) > 0L)
  }

  test("trigramNll: trigram hit, both backoff levels, OOV — hand-computed") {
    // corpus: "a b c" ×3, "a b d" ×1 → unigrams a=4,b=4,c=3,d=1
    // (total 12); bigrams "a b"=4, "b c"=3, "b d"=1; trigrams
    // "a b c"=3, "a b d"=1. trigramK=1 keeps only "a b c";
    // bigramK=2 keeps "a b","b c" (count desc, gram asc) — "b d" cut.
    val docs = Seq((1L, "a b c"), (2L, "a b c"), (3L, "a b c"),
      (4L, "a b d")).toDF("doc_id", "text")
    val out = CorpusStats.trigramNll(docs, $"doc_id", $"text",
        vocabK = 8, bigramK = 2, trigramK = 1, alpha = 0.4)
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    def mU(c: Long, a: Double) = Math.round(-Math.log(a * c / 12.0) * 1e6)
    def mR(n: Long, d: Long, a: Double) =
      Math.round(-Math.log(a * n.toDouble / d) * 1e6)
    // doc 1 "a b c": uni(a) + bigram("a b") + trigram("a b c")
    assert(out(1L) == mU(4, 1.0) + mR(4, 4, 1.0) + mR(3, 4, 1.0))
    // doc 4 "a b d": uni(a) + bigram("a b") + ["a b d" cut → "b d"
    // also cut → α²·unigram(d)]
    assert(out(4L) == mU(4, 1.0) + mR(4, 4, 1.0) + mU(1, 0.4 * 0.4))
    // middle backoff level (trigram untabled, bigram tabled): add
    // "x b c". Corpus becomes 15 tokens (a=4,b=5,c=4,d=1,x=1);
    // bigrams "a b"=4,"b c"=4,"b d"=1,"x b"=1 — bigramK=3 keeps
    // "a b","b c" and the 1-count tie resolves lexicographically to
    // "b d", cutting "x b"; trigramK=1 keeps "a b c" only. So
    // "x b c" scores: uni(x) + α·uni(b) ("x b" cut) + α·bigram("b c")
    // (trigram "x b c" untabled, "b c" tabled)
    val probe = CorpusStats.trigramNll(
        docs.union(Seq((9L, "x b c")).toDF("doc_id", "text")),
        $"doc_id", $"text", vocabK = 8, bigramK = 3, trigramK = 1,
        alpha = 0.4)
      .filter($"doc_id" === 9).head().getLong(2)
    val e = Math.round(-Math.log(1 / 15.0) * 1e6) +
      Math.round(-Math.log(0.4 * (5 / 15.0)) * 1e6) +
      Math.round(-Math.log(0.4 * (4.0 / 5.0)) * 1e6)
    assert(probe == e)
  }

  test("vocabDivergence: identical slice has zero KL, skewed slice positive") {
    // s1 and s2 share the corpus distribution exactly (KL 0 up to
    // quantization); s3 is all one rare-overall word → large KL
    val docs = Seq(
      (1L, "a a b", "s1"), (2L, "a a b", "s2"), (3L, "z z z", "s3"))
      .toDF("doc_id", "text", "source")
    val out = CorpusStats.vocabDivergence(docs, $"source", $"text")
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getDouble(2))).toMap
    // s1's dist (2/3 a, 1/3 b) vs corpus (4/9 a, 2/9 b, 3/9 z):
    // positive — its words are over-represented relative to mixture
    assert(out("s1")._1 == out("s2")._1) // same distribution, same KL
    assert(out("s3")._2 > out("s1")._2 && out("s3")._2 > 1.0)
    assert(out.values.forall(_._1 >= 0L))
  }

  test("profile: per-column rows/nulls/distinct/lengths; exact below k") {
    val df = Seq(
      (1L, Some("aa"), "x"), (2L, Some("bbb"), "x"),
      (3L, None, "x"), (4L, Some("aa"), "y"))
      .toDF("id", "txt", "grp")
    val got = CorpusStats.profile(df, Seq("id", "txt", "grp"), k = 64)
      .collect().map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2),
        r.getDouble(3), r.getLong(4),
        if (r.isNullAt(5)) None else Some(r.getDouble(5)), r.getLong(6)))).toMap
    assert(got("id") == ((4L, 0L, 0.0, 4L, Some(1.0), 1L)))
    // txt: one null; distinct {aa, bbb}; lengths 2,3,2 → avg 7/3
    assert(got("txt") == ((4L, 1L, 0.25, 2L, Some(7.0 / 3), 3L)))
    assert(got("grp") == ((4L, 0L, 0.0, 2L, Some(1.0), 1L)))
  }

  test("psi: drifted source scores higher; terms are never negative") {
    // bulk and mix share the corpus's 50/50 length mixture; drift
    // sits entirely in a bin nobody else occupies
    val rows = Seq.fill(50)(("bulk", 100L)) ++ Seq.fill(50)(("bulk", 300L)) ++
      Seq.fill(20)(("mix", 100L)) ++ Seq.fill(20)(("mix", 300L)) ++
      Seq.fill(40)(("drift", 900L))
    val got = CorpusStats.psi(rows.toDF("source", "n"), $"source", $"n",
        binWidth = 100.0)
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getDouble(2))).toMap
    assert(got("drift")._2 > got("mix")._2)
    assert(got("drift")._2 > 1.0) // own-bin drift is a loud signal
    // every (p−q)·ln(p/q) term shares sign — PSI can't go negative
    assert(got.values.forall(_._1 >= 0L))
    got.values.foreach { case (nano, psi) => assert(psi == nano / 1e9) }
  }

  test("normalize: robust and minmax per group; degenerate spread → null") {
    val docs = Seq(
      ("g1", 0L), ("g1", 10L), ("g1", 20L), ("g1", 30L), ("g1", 100L),
      ("g2", 7L), ("g2", 7L)).toDF("grp_in", "v")
    val out = CorpusStats.normalize(docs, $"grp_in", $"v")
      .collect().map(r => (r.getString(0), r.getLong(1)) ->
        (Option(r.get(2)), Option(r.get(3)))).toMap
    // g1: q25=10, q50=20, q75=30 (type-7 on 5 values), min 0 max 100
    assert(out(("g1", 20L)) == ((Some(0.0), Some(0.2))))
    assert(out(("g1", 0L)) == ((Some(-1.0), Some(0.0))))
    assert(out(("g1", 100L)) == ((Some(4.0), Some(1.0))))
    // g2 collapses: IQR 0 and range 0 → nulls, never ±Inf
    assert(out(("g2", 7L)) == ((None, None)))
  }

  test("normalize: caller columns named like internal stats survive") {
    // a frame that already carries q50/mn/grp columns must neither fail
    // analysis as ambiguous nor lose them to the internal drop
    val docs = Seq(("g1", 0L, 1.0, 2.0, "keep"), ("g1", 10L, 3.0, 4.0, "keep"))
      .toDF("grp", "v", "q50", "mn", "extra")
    val out = CorpusStats.normalize(docs, $"grp", $"v")
    assert(out.columns.toSeq ==
      Seq("grp", "v", "q50", "mn", "extra", "robust", "minmax"))
    val r = out.filter($"v" === 0L).head()
    assert(r.getAs[Double]("q50") == 1.0 && r.getAs[Double]("mn") == 2.0)
    assert(r.getAs[Double]("minmax") == 0.0)
  }

  test("percentileRank matches percent_rank semantics incl. ties") {
    val docs = Seq(("g", 10L), ("g", 20L), ("g", 20L), ("g", 30L),
      ("h", 5L)).toDF("grp_in", "v")
    val out = CorpusStats.percentileRank(docs, $"grp_in", $"v")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2)))
      .toSet
    // g: n=4 → 10:0/3, 20 (tied): 1/3, 30: 3/3; single-row h: 0
    assert(out == Set(("g", 10L, 0.0), ("g", 20L, 1.0 / 3), ("g", 30L, 1.0),
      ("h", 5L, 0.0)))
  }

  test("distinctKmv: exact below k, unbiased-ish above, dup-invariant") {
    // 20 distinct values, k=64 → n_kept = exact distinct count
    val small = (1 to 20).map(i => ("a", s"v$i")).toDF("g", "v")
    val ex = CorpusStats.distinctKmv(small, $"g", $"v", k = 64)
      .collect().map(r => (r.getLong(1), r.getLong(3))).head
    assert(ex == ((20L, 20L)))
    // 5000 distinct values, k=128: estimate within 3σ ≈ 3/√k ≈ 27%
    val big = (1 to 5000).map(i => ("a", s"value$i")).toDF("g", "v")
    val est = CorpusStats.distinctKmv(big, $"g", $"v", k = 128)
      .collect().head.getLong(3)
    assert(est > 5000 * 0.73 && est < 5000 * 1.27, s"est=$est")
    // duplicates cannot move the sketch: same output on 3× the rows
    val dup = CorpusStats.distinctKmv(
      big.union(big).union(big), $"g", $"v", k = 128)
      .collect().head.getLong(3)
    assert(dup == est)
  }

  test("kmvSimilarity: exact Jaccard below k; disjoint pairs hit 0; " +
      "duplicates cannot move it; above-k estimate lands near truth") {
    // a ∩ b = {s1..s10}, |a| = |b| = 30, |a ∪ b| = 50 < k=64 → exact:
    // J = 10/50 = 0.2 → 200000 ppm
    val rows = ((1 to 10).map(i => ("a", s"s$i")) ++
      (1 to 20).map(i => ("a", s"x$i")) ++
      (1 to 10).map(i => ("b", s"s$i")) ++
      (1 to 20).map(i => ("b", s"y$i")) ++
      (1 to 10).map(i => ("c", s"s$i")) ++      // c == the shared set
      (1 to 20).map(i => ("d", s"z$i"))).toDF("g", "v")
    val got = CorpusStats.kmvSimilarity(rows.union(rows), $"g", $"v", k = 64)
      .collect()
      .map(r => ((r.getString(0), r.getString(1)),
        (r.getLong(2), r.getLong(3), r.getLong(4)))).toMap
    assert(got(("a", "b")) == ((50L, 10L, 200000L)))
    assert(got(("a", "c")) == ((30L, 10L, 333333L))) // 10/30 truncated
    assert(got(("c", "d")) == ((30L, 0L, 0L)))       // disjoint
    assert(got.size == 6)                            // all C(4,2) pairs
    // above k the estimate still lands near truth: two 600-value sets
    // sharing 300 (J = 1/3), k=128 → ±3/√k ≈ ±27% of 333333
    val big = ((1 to 600).map(i => ("p", s"t$i")) ++
      (301 to 900).map(i => ("q", s"t$i"))).toDF("g", "v")
    val est = CorpusStats.kmvSimilarity(big, $"g", $"v", k = 128)
      .collect().head.getLong(4)
    assert(est > 240000 && est < 430000, s"est=$est")
  }

  test("trimmedMean: hand-computed band, duplicate-aware overlaps, " +
      "degenerate trims") {
    // group a: occurrences 1,2,2,3,100 (n=5). 20% trim each side →
    // cut=1, keep ranks 2..4 = values 2,2,3 → mean 7/3
    val df = (Seq(1.0, 2.0, 2.0, 3.0, 100.0).map(("a", _)) ++
      Seq(("b", 7.0))).toDF("g", "v")
    val got = CorpusStats.trimmedMean(df, $"g", $"v", trimPpm = 200000L)
      .orderBy("grp").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        if (r.isNullAt(3)) None else Some(r.getDouble(3))))
    // 7e6/3 micro → half-up integral 2333333 → single /1e6 emit
    assert(got(0) == (("a", 5L, 3L, Some(2333333.0 / 1e6))))
    // b: n=1, cut=0 → keeps its single value exactly
    assert(got(1) == (("b", 1L, 1L, Some(7.0))))
    // a 49.99% trim of n=2 keeps both (cut = floor(2*.4999...) = 0);
    // property: trimPpm=0 equals the plain mean
    val plain = CorpusStats.trimmedMean(df, $"g", $"v", trimPpm = 0L)
      .filter($"grp" === "a").collect().head.getDouble(3)
    assert(plain == 108000000.0 / 5 / 1e6)
  }

  test("kmvSimilarity: group-cardinality guard fails loudly, not OOM") {
    val rows = (1 to 40).map(i => (s"g$i", "v")).toDF("g", "v")
    val e = intercept[IllegalArgumentException](
      CorpusStats.kmvSimilarity(rows, $"g", $"v", k = 8, maxGroups = 10)
        .collect())
    assert(e.getMessage.contains("maxGroups"))
    // at or under the bound it runs
    assert(CorpusStats.kmvSimilarity(rows.filter($"g".isin("g1", "g2")),
      $"g", $"v", k = 8, maxGroups = 10).count() == 1)
  }

  test("trimmedMean: null values are excluded, not ranked into the band") {
    // nulls must neither occupy trim-band ranks nor count in n_kept:
    // with two nulls present the a-group result is IDENTICAL to the
    // null-free fixture above
    val df = (Seq(Some(1.0), Some(2.0), Some(2.0), Some(3.0), Some(100.0),
        None, None).map(("a", _)) ++ Seq(("b", Some(7.0))))
      .toDF("g", "v")
    val got = CorpusStats.trimmedMean(df, $"g", $"v", trimPpm = 200000L)
      .orderBy("grp").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        if (r.isNullAt(3)) None else Some(r.getDouble(3))))
    assert(got(0) == (("a", 5L, 3L, Some(2333333.0 / 1e6))))
    assert(got(1) == (("b", 1L, 1L, Some(7.0))))
  }

  test("kmvSimilarity: property — exact floor-ppm Jaccard for every " +
      "pair of random sets under k") {
    val rng = new scala.util.Random(7L)
    val groups = (0 until 6).map(g => s"g$g" ->
      (1 to 30).map(_ => s"v${rng.nextInt(40)}").toSet)
    val rows = groups.flatMap { case (g, vs) => vs.map(v => (g, v)) }
      .toDF("g", "v")
    val got = CorpusStats.kmvSimilarity(rows, $"g", $"v", k = 64)
      .collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getLong(4)).toMap
    for {
      (ga, va) <- groups; (gb, vb) <- groups if ga < gb
    } {
      val expected = (va & vb).size.toLong * 1000000L / (va | vb).size
      assert(got((ga, gb)) == expected, s"pair ($ga,$gb)")
    }
  }

  test("collocations: hand-computed PMI, support floor, tie-break") {
    // "new york" always co-occurs (PMI high); "the cat" shares "the"
    // with other pairs (PMI lower); pairs under minCount vanish
    val docs = (Seq.fill(5)("new york") ++ Seq.fill(5)("the cat") ++
      Seq.fill(5)("the dog") ++ Seq("rare pair")).toDF("text")
    val out = CorpusStats.collocations(docs, $"text", minCount = 5, k = 10)
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2)))
      .toMap
    assert(!out.contains("rare pair")) // support floor
    // T1 = 32 tokens, T2 = 16 pairs.
    // new york: c2=5, c1=5,5 → ln(5*32*32/(16*5*5)) = ln(12.8)
    assert(out("new york")._2 ==
      Math.round(Math.log(5.0 * 32 * 32 / (16.0 * 5 * 5)) * 1e6))
    // the cat: c2=5, c1(the)=10 → ln(5*32*32/(16*10*5)) = ln(6.4)
    assert(out("the cat")._2 ==
      Math.round(Math.log(5.0 * 32 * 32 / (16.0 * 10 * 5)) * 1e6))
    assert(out("new york")._2 > out("the cat")._2)
    // the cat / the dog tie on PMI: both present, gram-ordered
    assert(out("the cat")._2 == out("the dog")._2)
  }

  test("importanceWeights: identical raw and target models cancel to zero") {
    val docs = Seq((1L, "a b c"), (2L, "a a d"), (3L, "e f"))
      .toDF("doc_id", "text")
    val out = CorpusStats.importanceWeights(docs, docs, $"doc_id", $"text",
        vocabK = 16)
      .select($"doc_id", $"imp_micro").as[(Long, Long)].collect().toMap
    assert(out.values.forall(_ == 0L), out.toString)
  }

  test("importanceWeights: target-like docs score higher") {
    // target corpus speaks "wiki lore"; raw adds web noise. The doc
    // made of target vocabulary must out-rank the noise doc.
    val target = Seq((10L, "wiki lore wiki lore"), (11L, "lore wiki"))
      .toDF("doc_id", "text")
    // noise tokens appear often enough in raw that their raw
    // probability clears the target model's OOV floor — otherwise the
    // floor upweights raw-rare tokens (a real property of floor LMs)
    val raw = Seq((1L, "wiki lore"), (2L, "spam click spam click"),
        (3L, "wiki spam"))
      .toDF("doc_id", "text").union(target)
    val out = CorpusStats.importanceWeights(raw, target, $"doc_id", $"text",
        vocabK = 16)
      .select($"doc_id", $"avg_imp").as[(Long, Double)].collect().toMap
    assert(out(1L) > out(3L) && out(3L) > out(2L), out.toString)
    // nll columns agree with the standalone unigramNll construction
    val nll = CorpusStats.unigramNll(raw, $"doc_id", $"text", vocabK = 16)
      .select($"doc_id", $"nll_micro").as[(Long, Long)].collect().toMap
    val rawSide = CorpusStats.importanceWeights(raw, target, $"doc_id",
        $"text", vocabK = 16)
      .select($"doc_id", $"nll_raw_micro").as[(Long, Long)].collect().toMap
    assert(rawSide == nll)
  }

  test("naiveBayesClassify separates disjoint-vocabulary classes") {
    val docs = Seq(
      (1L, "x x y", "a"), (2L, "y x x x", "a"), (3L, "x y y", "a"),
      (4L, "p q p", "b"), (5L, "q q p p", "b"), (6L, "p p q", "b"))
      .toDF("doc_id", "text", "lab")
    val out = CorpusStats.naiveBayesClassify(docs, $"doc_id", $"text",
        $"lab", vocabK = 16)
      .select($"doc_id", $"pred", $"margin_micro", $"correct")
      .as[(Long, String, Long, Boolean)].collect()
      .map(r => r._1 -> r).toMap
    assert(out.values.forall(_._4), out.toString) // all classified right
    assert(out.values.forall(_._3 > 0), "margins must be positive")
  }

  test("naiveBayesClassify: OOV tie goes to the smallest class; null label scored") {
    // classes are symmetric (same doc count, same token mass), so an
    // all-OOV doc ties exactly and the struct sort picks class "a"
    val docs = Seq(
      (1L, "x x", "a"), (2L, "x x", "a"),
      (3L, "p p", "b"), (4L, "p p", "b"),
      (5L, "zzz qqq", null)).toDF("doc_id", "text", "lab")
    val out = CorpusStats.naiveBayesClassify(docs, $"doc_id", $"text",
        $"lab", vocabK = 16)
      .select($"doc_id", $"label", $"pred", $"margin_micro")
      .collect().map(r => r.getLong(0) ->
        (Option(r.getString(1)), r.getString(2), r.getLong(3))).toMap
    assert(out(5L)._1.isEmpty)
    assert(out(5L)._2 == "a")
    assert(out(5L)._3 == 0L) // exact tie
  }

  test("naiveBayesClassify survives a class whose docs are all null-text") {
    val docs = Seq(
      (1L, null, "a"), (2L, "x y", "b"), (3L, "x", "b"), (4L, "y", "c"))
      .toDF("doc_id", "text", "lab")
    val out = CorpusStats.naiveBayesClassify(docs, $"doc_id", $"text",
        $"lab", vocabK = 16)
      .collect().map(r => r.getLong(0) -> Option(r.getString(2))).toMap
    // class "a" contributes a prior but no tokens (its smoothed model
    // is the pure OOV floor); scoring must not crash and null-text
    // rows score null
    assert(out.keySet == Set(1L, 2L, 3L, 4L))
    assert(out(1L).isEmpty) // null text → null scores → null pred
    assert(out(2L).nonEmpty)
  }

  test("rrfFuse matches SQL rank() semantics including ties and nulls") {
    val docs = Seq(
      (1L, Some(10L), Some(3L)), (2L, Some(20L), Some(3L)),
      (3L, Some(20L), Some(1L)), (4L, None, Some(2L)))
      .toDF("doc_id", "s1", "s2")
    val out = CorpusStats.rrfFuse(docs, $"doc_id",
        Seq("s1" -> $"s1", "s2" -> $"s2"), rrfK = 60)
      .orderBy($"doc_id")
      .as[(Long, Option[Long], Option[Long], Long)].collect().toSeq
    // s1 desc: 20,20 → rank 1; 10 → rank 3 (competition ranking)
    // s2 desc: 3,3 → rank 1; 2 → rank 3; 1 → rank 4
    def t(r: Long) = 1000000000L / (60L + r)
    assert(out == Seq(
      (1L, Some(3L), Some(1L), t(3) + t(1)),
      (2L, Some(1L), Some(1L), t(1) + t(1)),
      (3L, Some(1L), Some(4L), t(1) + t(4)),
      (4L, None, Some(3L), 0L + t(3))), out.toString)
  }

  test("rrfFuse: continuous signals rank exactly and the histogram " +
      "window never collapses to one partition") {
    // distinct random doubles — the histogram IS corpus-sized, the
    // shape the bounded-distinct contract used to exclude; drive the
    // bucketed branch directly (the public entry picks it by the
    // input's sizeInBytes estimate, infeasible to reach in-test)
    val rnd = new scala.util.Random(0xBEEF)
    val rows = (1L to 70000L).map(i => (i, rnd.nextDouble() * 1e6))
    val docs = rows.toDF("doc_id", "s")
    val fused = CorpusStats.rrfFuseImpl(docs, $"doc_id",
      Seq("s" -> $"s"), rrfK = 60, smallCorpus = false)
    val got = fused.orderBy($"doc_id")
      .as[(Long, Long, Long)].collect().toSeq
    // independent expectation: competition rank by descending value
    val rankOf = rows.map(_._2).sorted(Ordering[Double].reverse)
      .zipWithIndex.groupBy(_._1).map { case (v, g) =>
        v -> (g.map(_._2).min + 1L) }
    val expected = rows.map { case (id, v) =>
      (id, rankOf(v), 1000000000L / (60L + rankOf(v))) }
    assert(got == expected)
    // every per-value cumulative window must be partitioned (by the
    // range bucket); the only permissible unpartitioned window is the
    // ≤RrfBuckets-row bucket prefix (its frame sums __bsum, not __hc)
    val plan = fused.queryExecution.optimizedPlan.toString
    val hcWindows = plan.linesIterator
      .filter(l => l.contains("Window") && l.contains("__hc"))
    assert(hcWindows.forall(_.contains("__bkt")), plan)
  }

  test("postings caps lists, counts full df, and dedups within a doc") {
    val docs = Seq(
      (3L, "w w a"), (1L, "w b"), (2L, "w c"), (4L, "b b")) // w in 3 docs
      .toDF("doc_id", "text")
    val out = CorpusStats.postings(docs, $"doc_id", $"text",
        maxPostings = 2, minDf = 2)
      .orderBy($"term")
      .as[(String, Long, Seq[Long])].collect().toSeq
    // "w": df 3 (dup inside doc 3 counts once), postings capped to
    // the 2 smallest doc ids ascending; "b": df 2; singles pruned
    assert(out == Seq(("b", 2L, Seq(1L, 4L)), ("w", 3L, Seq(1L, 2L))),
      out.toString)
  }

  test("classTerms surfaces class-exclusive vocabulary first") {
    val docs = Seq(
      (1L, "shared quantum quantum quantum", "sci"),
      (2L, "quantum flux flux", "sci"),
      (3L, "shared gossip gossip gossip", "ent"),
      (4L, "gossip fame fame", "ent")).toDF("doc_id", "text", "src")
    val out = CorpusStats.classTerms(docs, $"src", $"text", k = 2)
      .orderBy($"cls", $"rank")
      .as[(String, String, Long, Double, Long)].collect().toSeq
    assert(out.map(r => (r._1, r._2)) ==
      Seq(("ent", "gossip"), ("ent", "fame"),
          ("sci", "quantum"), ("sci", "flux")), out.toString)
    // the ubiquitous low-tf term never makes a class's top list
    assert(out.forall(_._2 != "shared"))
    assert(out.map(_._5) == Seq(1L, 2L, 1L, 2L))
  }

  test("count-min: row mass conservation, one-sided error, mergeability") {
    val docs = Seq((1L, "a a b c"), (2L, "a b d e f")).toDF("doc_id", "text")
    def toks(df: org.apache.spark.sql.DataFrame) =
      df.select(explode(TextOps.tokens($"text")).as("w"))
    val sk = CorpusStats.countMinSketch(toks(docs), $"w", width = 8, depth = 3)
    val cells = sk.collect()
      .map(r => (r.getInt(0), r.getInt(1)) -> r.getLong(2)).toMap
    // each row is a full partition of the 9-token stream
    (0 until 3).foreach { r =>
      assert(cells.collect { case ((`r`, _), c) => c }.sum == 9L)
    }
    // estimates never undercount (CMS's one-sided guarantee)
    val exact = toks(docs).groupBy($"w").agg(count(lit(1)).as("c"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val est = CorpusStats.countMinEstimate(sk,
        toks(docs).distinct(), $"w", width = 8, depth = 3)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    exact.foreach { case (w, c) => assert(est(w) >= c, s"$w: ${est(w)} < $c") }
    // cell-wise addition of per-half sketches IS the union's sketch
    def cellsOf(df: org.apache.spark.sql.DataFrame) =
      CorpusStats.countMinSketch(toks(df), $"w", width = 8, depth = 3)
        .collect().map(r => (r.getInt(0), r.getInt(1)) -> r.getLong(2)).toMap
    val a = cellsOf(docs.filter($"doc_id" === 1L))
    val b = cellsOf(docs.filter($"doc_id" === 2L))
    val merged = (a.keySet ++ b.keySet)
      .map(k => k -> (a.getOrElse(k, 0L) + b.getOrElse(k, 0L))).toMap
    assert(merged == cells)
    // a NEVER-SEEN query value still emits a row, and with an empty
    // cell its estimate is the canonical 0 — never a silent drop or
    // an inflation from only its non-empty cells
    val cm = CorpusStats.countMin(toks(docs), $"w", width = 512, depth = 3)
    val zs = cm.estimate(Seq("zzz-unseen").toDF("w"), $"w")
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(zs == Map("zzz-unseen" -> 0L), zs.toString)
  }

  test("wordHist/ngramHist deletes equal from-scratch on corpus minus deleted") {
    val docs = Seq((1L, "a a b c"), (2L, "a b d e f"), (3L, "b c c g"))
      .toDF("doc_id", "text")
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(_.toSeq).sortBy(_.toString).toSeq
    val wFull = CorpusStats.wordTypeHistogram(docs, $"text")
    val wAfter = CorpusStats.wordHistDelete(wFull,
      docs.filter($"doc_id" === 3L), $"text")
    assert(rows(wAfter) == rows(CorpusStats.wordTypeHistogram(
      docs.filter($"doc_id" =!= 3L), $"text")))
    val gFull = CorpusStats.ngramHistogram(docs, $"text", n = 2)
    val gAfter = CorpusStats.ngramHistDelete(gFull,
      docs.filter($"doc_id" === 1L), $"text", n = 2)
    assert(rows(gAfter) == rows(CorpusStats.ngramHistogram(
      docs.filter($"doc_id" =!= 1L), $"text", n = 2)))
    // a non-subset delete drives a count negative and fails loudly
    def msgs(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(x =>
        Option(x.getMessage).toSeq ++ msgs(x.getCause))
    val e = intercept[Exception] {
      CorpusStats.wordHistDelete(wFull,
        docs.unionByName(docs), $"text").collect()
    }
    assert(msgs(e).exists(_.contains("went negative")), e.toString)
  }

  test("countMinDelete equals a from-scratch sketch on corpus minus deleted") {
    val docs = Seq((1L, "a a b c"), (2L, "a b d e f"), (3L, "b c c g"))
      .toDF("doc_id", "text")
    def toks(df: org.apache.spark.sql.DataFrame) =
      df.select(explode(TextOps.tokens($"text")).as("w"))
    def cellsOf(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getInt(0), r.getInt(1)) -> r.getLong(2)).toMap
    val full = CorpusStats.countMinSketch(toks(docs), $"w",
      width = 8, depth = 3)
    // turnstile delete of doc 3's rows: subtract its own sketch
    val afterDel = CorpusStats.countMinDelete(full,
      toks(docs.filter($"doc_id" === 3L)), $"w", width = 8, depth = 3)
    val scratch = CorpusStats.countMinSketch(
      toks(docs.filter($"doc_id" =!= 3L)), $"w", width = 8, depth = 3)
    assert(cellsOf(afterDel) == cellsOf(scratch))
    // deleting EVERYTHING leaves the canonical empty (sparse) sketch
    val empty = CorpusStats.countMinDelete(full, toks(docs), $"w",
      width = 8, depth = 3)
    assert(empty.isEmpty)
    // a non-subset delete drives a cell negative and fails loudly
    def msgs(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(x =>
        Option(x.getMessage).toSeq ++ msgs(x.getCause))
    val e = intercept[Exception] {
      CorpusStats.countMinDelete(full, toks(docs.unionByName(docs)),
        $"w", width = 8, depth = 3).collect()
    }
    assert(msgs(e).exists(_.contains("went negative")), e.toString)
  }

  test("aucPpm: hand-computed rank-sum AUC with ties; degenerate null") {
    // scores: pos {0.9, 0.7, 0.5}, neg {0.7, 0.3} — pairs: (0.9 beats
    // both) + (0.7 beats 0.3, ties 0.7 → ½) + (0.5 beats 0.3) =
    // 2 + 1.5 + 1 = 4.5 of 6 → AUC = 0.75
    val df = Seq((0.9, true), (0.7, true), (0.5, true),
      (0.7, false), (0.3, false)).toDF("s", "y")
    val r = CorpusStats.aucPpm(df, $"s", $"y").head()
    assert(r.getLong(0) == 3L && r.getLong(1) == 2L)
    assert(r.getLong(2) == 750000L && r.getDouble(3) == 0.75)
    // perfect separation → 1.0; one-class input → null
    val perfect = Seq((0.9, true), (0.1, false)).toDF("s", "y")
    assert(CorpusStats.aucPpm(perfect, $"s", $"y").head().getLong(2)
      == 1000000L)
    val oneClass = Seq((0.9, true), (0.5, true)).toDF("s", "y")
    assert(CorpusStats.aucPpm(oneClass, $"s", $"y").head().isNullAt(2))
  }

  test("calibration: bin edges clamp, rates and micro means exact") {
    val df = Seq(
      (Some(0.05), true), (Some(0.08), false), (Some(0.95), true),
      (Some(1.2), true), (Some(-0.1), false), (Some(0.55), false),
      (Option.empty[Double], true)).toDF("s", "y")
    val r = CorpusStats.calibration(df, $"s", $"y", bins = 10)
      .orderBy("bin").collect()
      .map(x => (x.getLong(0), x.getLong(1), x.getLong(2), x.getLong(3),
        x.getDouble(4)))
    // bin 0: 0.05, 0.08, -0.1 (clamped) → n=3, pos=1, mean=(50000+80000-100000+...
    // micro sum = 50000+80000-100000 = 30000 → half-up /3 = 10000 → 0.01
    assert(r(0) == ((0L, 3L, 1L, 333333L, 0.01)))
    assert(r(1) == ((5L, 1L, 0L, 0L, 0.55)))
    // bin 9: 0.95 and 1.2 (clamped) → mean (950000+1200000+... )/2
    assert(r(2) == ((9L, 2L, 2L, 1000000L, 1.075)))
  }

  test("bpePairCounts: hand-computed pair histogram, deterministic top-k") {
    val docs = Seq((1L, "abab ab x"), (2L, "abab")).toDF("doc_id", "text")
    // abab → ab, ba, ab (×2 docs); ab → ab; x contributes nothing
    val got = CorpusStats.bpePairCounts(docs, $"text", k = 10)
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    assert(got == Seq(("ab", 5L), ("ba", 2L)))
  }

  test("bpeTrain: classic merge sequence, ties lexicographic, early stop") {
    val docs = Seq((1L, "aaab aaab aaab")).toDF("doc_id", "text")
    // round 0: pairs aa×6, ab×3 → merge (a,a); words become [aa,a,b]
    // round 1: (aa,a)=3 ties (a,b)=3 → lexicographic picks (a,b)
    // round 2: (aa,ab)=3 → merge; round 3: single symbols → stop
    val got = CorpusStats.bpeTrain(docs, $"text", merges = 5)
      .orderBy("merge_rank").collect()
      .map(r => (r.getInt(0), r.getString(1), r.getString(2), r.getLong(3)))
    assert(got.toSeq == Seq(
      (0, "a", "a", 6L), (1, "a", "b", 3L), (2, "aa", "ab", 3L)))
    // word-type guard fails loudly
    val many = (0 until 50).map(i => (i.toLong, s"w$i word$i")).toDF("doc_id", "text")
    val e = intercept[IllegalArgumentException](
      CorpusStats.bpeTrain(many, $"text", 1, maxWordTypes = 10))
    assert(e.getMessage.contains("word types"))
  }

  test("fertility: hand-computed token ratios per source") {
    val docs = Seq((1L, "ab cd", "s1"), (2L, "a-b x1y", "s1"),
      (3L, "hello", "s2")).toDF("doc_id", "text", "src")
    val out = CorpusStats.fertility(docs, $"src", $"text")
      .orderBy($"source")
      .as[(String, Long, Long, Long, Long, Double, Double)].collect().toSeq
    // s1: ws 2+2; bpe "ab","cd" + "a","-","b","x","1","y" = 8; chars 5+7
    assert(out == Seq(
      ("s1", 2L, 4L, 8L, 12L, 2.0, 1.5),
      ("s2", 1L, 1L, 1L, 5L, 1.0, 5.0)), out.toString)
  }

  test("NB scoring is a pure projection: zero exchanges after model build") {
    val docs = Seq((1L, "x x", "a"), (2L, "p p", "b"), (3L, "x p", "a"))
      .toDF("doc_id", "text", "lab")
    val model = CorpusStats.naiveBayesModel(docs, $"text", $"lab", vocabK = 8)
    val scored = docs.select($"doc_id",
      model.scored($"text")(0)("c").as("pred"))
    scored.collect()
    val plan = scored.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"NB scoring shuffles:\n$plan")
  }

  test("postings cap lowers to a partial WindowGroupLimit") {
    val docs = (1 to 50).map(i => (i.toLong, s"w${i % 5} common"))
      .toDF("doc_id", "text")
    val df = CorpusStats.postings(docs, $"doc_id", $"text", maxPostings = 3)
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("WindowGroupLimit"), plan)
  }

  test("classTerms top-k lowers to a partial WindowGroupLimit") {
    val docs = (1 to 50).map(i => (i.toLong, s"w${i % 7} filler", s"s${i % 2}"))
      .toDF("doc_id", "text", "src")
    val df = CorpusStats.classTerms(docs, $"src", $"text", k = 2)
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("WindowGroupLimit"), plan)
  }

  test("quantiles shuffle carries the histogram, not the corpus") {
    // the aggregate keyed on (grp, v) must partial-aggregate map-side:
    // the plan has a partial HashAggregate BEFORE the first exchange
    val df = (1 to 100).map(i => ("g", (i % 5).toLong)).toDF("grp", "v")
    val plan = CorpusStats.quantiles(df, $"grp", $"v", Seq("m" -> 0.5))
      .queryExecution.executedPlan.toString
    val firstEx = plan.indexOf("Exchange")
    val firstAgg = plan.indexOf("HashAggregate")
    assert(firstAgg >= 0 && firstEx > firstAgg, plan)
  }
}
