package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/**
 * Corpus-level descriptive statistics for training-data builds: the
 * "what is in this 100 TB" pass that runs before any filtering
 * decision — vocabulary heavy hitters and per-group length
 * distributions. The reference has no corpus-wide surface at all
 * (every query is one series, `query.go:54`); these are one-pass
 * distributed aggregations.
 */
object CorpusStats {

  /**
   * Top-k n-grams by document frequency (the distinct-doc count, the
   * dedup/boilerplate signal — counting occurrences would let one
   * spammy doc dominate). Per-doc `array_distinct` BEFORE the explode
   * keeps the stream one row per (doc, gram) without a corpus-wide
   * distinct shuffle; the gram count partial-aggregates map-side, and
   * the top-k lowers to `TakeOrderedAndProject` — each partition
   * ships only its own k candidates to the driver, never the
   * vocabulary. Ties break lexicographically so any engine returns
   * the identical k rows.
   */
  def topNgrams(df: DataFrame, text: Column, n: Int, k: Int): DataFrame = {
    require(n >= 1 && k >= 1, "n and k must be >= 1")
    df.select(explode(array_distinct(TextOps.ngrams(text, n))).as("gram"))
      .groupBy(col("gram")).agg(count(lit(1)).as("doc_freq"))
      .orderBy(col("doc_freq").desc, col("gram"))
      .limit(k)
  }

  /**
   * BM25 keyword scoring (the Lucene `k1`/`b` form with
   * `idf = ln(1 + (N − df + 0.5)/(df + 0.5))`) of every document
   * against a fixed term list — the lexical-retrieval half of a
   * hybrid search stack, and the relevance filter of a targeted
   * corpus build.
   *
   * Scale shape: for a handful of terms, per-doc `tf` is an
   * `array-filter` size — no explode, no per-term join; the corpus
   * statistics (N, avg length, per-term df) are ONE map-side-combined
   * aggregate producing a single broadcast row. Everything else is a
   * codegen'd projection over the scan. Mean length is computed in
   * DECIMAL (order-free) so scores are bit-reproducible across
   * engines and partitionings.
   */
  def bm25(df: DataFrame, id: Column, text: Column, terms: Seq[String],
      k1: Double = 1.2, b: Double = 0.75): DataFrame = {
    require(terms.nonEmpty, "need at least one term")
    val toks = TextOps.tokens(text)
    val statAggs =
      count(lit(1)).cast("double").as("_n") +:
      (sum(size(toks).cast("long").cast("decimal(38,6)")) /
        count(lit(1))).cast("double").as("_avglen") +:
      terms.zipWithIndex.map { case (t, i) =>
        sum(when(array_contains(toks, t), 1L).otherwise(0L))
          .cast("double").as(s"_df$i")
      }
    val stats = df.agg(statAggs.head, statAggs.tail: _*)
    def score(t2: Column): Column = {
      val toks2 = TextOps.tokens(t2)
      val dl = size(toks2).cast("double")
      terms.zipWithIndex.map { case (t, i) =>
        val tf = size(filter(toks2, x => x === lit(t))).cast("double")
        val idf = log(lit(1.0) +
          (col("_n") - col(s"_df$i") + 0.5) / (col(s"_df$i") + 0.5))
        idf * tf * (k1 + 1) /
          (tf + lit(k1) * (lit(1.0) - b + lit(b) * dl / col("_avglen")))
      }.reduce(_ + _)
    }
    df.select(id.as("doc_id"), text.as("__t"))
      .crossJoin(broadcast(stats))
      .select(col("doc_id"), score(col("__t")).as("bm25"))
  }

  /**
   * Perplexity-style quality scoring: per-document negative
   * log-likelihood under a unigram language model estimated from the
   * corpus itself — the "does this read like the rest of the corpus"
   * filter of web-scale pipelines (gibberish, boilerplate, and
   * wrong-language docs score high; OOV-heavy docs get the floor
   * probability `1/total` per unknown token).
   *
   * Scale shape: the model build is ONE map-side-combined token count
   * (the shuffle carries distinct words, not tokens) whose top-`vocabK`
   * rows lower to `TakeOrderedAndProject` (ties break
   * lexicographically, so any engine picks the identical vocabulary);
   * scoring is a broadcast-table probe per token inside whole-stage
   * codegen ([[graft.functions.UnigramNllExpr]]) — a pure projection
   * over the scan, no explode, no join, no shuffle. Scores are
   * integer micro-nats (see the expression's scaladoc), so they are
   * bit-reproducible regardless of partitioning or libm.
   */
  def unigramNll(df: DataFrame, id: Column, text: Column,
      vocabK: Int = 65536): DataFrame = {
    val model = unigramModel(df, text, vocabK)
    df.select(id.as("doc_id"),
        size(TextOps.tokens(text)).cast("long").as("n_tokens"),
        model.nll(text).as("nll_micro"))
      .withColumn("avg_nll", col("nll_micro") / (col("n_tokens") * lit(1000000.0)))
  }

  /** A built unigram LM: the broadcastable word → micro-nat table plus
   * the scoring column factory. `nll(text)` is a pure projection, so
   * it applies to STREAMS as well as batches — estimate on a static
   * corpus, score an unbounded one (`SeriesStream.scoreStream`-style)
   * with zero per-batch state. */
  final case class UnigramModel(
      micro: org.apache.spark.broadcast.Broadcast[
        java.util.HashMap[String, java.lang.Long]], oovMicro: Long) {
    def nll(text: Column): Column =
      graft.functions.UnigramNllExpr.nllMicro(text, micro, oovMicro)
    def avgNll(text: Column): Column =
      nll(text) / (size(TextOps.tokens(text)).cast("long") * lit(1000000.0))
  }

  /** Estimate the [[UnigramModel]] from a STATIC corpus (two Spark
   * actions: the total and the vocab cut — streams cannot run these,
   * which is exactly why the model is a separate value). */
  /** UTF-8 byte-order string comparison — the collation SQL engines
   * (and every engine-side deterministic cut here) use for ORDER BY.
   * Java's natural String order is UTF-16 code units, which ranks
   * supplementary-plane symbols BELOW U+E000..U+FFFF; tie-breaks in
   * the tokenizer trainers must match the unrolled SQL oracles, so
   * they compare UTF-8 bytes. */
  private val utf8Ord: Ordering[String] = (x: String, y: String) =>
    org.apache.spark.unsafe.types.UTF8String.fromString(x)
      .compareTo(org.apache.spark.unsafe.types.UTF8String.fromString(y))

  /** Collected count total for an LM build; fails loudly on an empty
   * corpus/histogram, where the null sum would otherwise NPE (and a
   * zero total would poison every `-ln(c/total)` micro-nat). */
  private def tokenTotal(counts: DataFrame, c: String, what: String): Long = {
    val r = counts.agg(sum(col(c))).head
    require(!r.isNullAt(0) && r.getLong(0) > 0,
      s"$what: empty corpus/histogram — no token counts to model")
    r.getLong(0)
  }

  def unigramModel(df: DataFrame, text: Column,
      vocabK: Int = 65536): UnigramModel = {
    require(vocabK >= 1, "vocabK must be >= 1")
    val counts = df.select(explode(TextOps.tokens(text)).as("w"))
      .groupBy(col("w")).agg(count(lit(1)).as("c"))
      .localCheckpoint() // consumed twice: total + vocab cut — without
      // this the corpus-sized token explode runs twice
    val total = tokenTotal(counts, "c", "unigramModel")
    val micro = new java.util.HashMap[String, java.lang.Long](vocabK * 2)
    def microNll(c: Long): Long =
      Math.round(-Math.log(c.toDouble / total.toDouble) * 1000000.0)
    counts.orderBy(col("c").desc, col("w")).limit(vocabK).collect()
      .foreach(r => micro.put(r.getString(0), microNll(r.getLong(1))))
    // ship the table ONCE PER EXECUTOR via TorrentBroadcast; the
    // scoring expression carries only the broadcast handle, not a
    // closure-captured copy re-serialized into every task binary
    UnigramModel(df.sparkSession.sparkContext.broadcast(micro), microNll(1L))
  }

  /**
   * KMV (k-minimum-values) distinct-count sketch per group (Bar-Yossef
   * et al., RANDOM 2002): keep the k smallest distinct 60-bit hashes
   * of the value; if fewer than k exist the count is EXACT, otherwise
   * `est ≈ (k−1)·2⁶⁰/kth_min`. The cardinality sketch for "how many
   * distinct tokens/urls/users per source" when an exact
   * count-distinct would shuffle the full value set — the k-min set
   * is tiny, MERGEABLE (union two groups' sets and re-cut to k), and,
   * unlike HLL registers, deterministic enough to reproduce in any
   * engine: md5-derived hashes, and the estimator floors as
   * `(2⁶⁰ div kth)·(k−1)` so both sides do identical integer
   * arithmetic (the inner floor biases ≤ kth/2⁶⁰ — noise next to the
   * sketch's 1/√k error).
   *
   * Scale shape: the per-(group, hash) distinct partial-aggregates
   * map-side; the k-smallest ride the `row_number ≤ k` shape the
   * optimizer lowers to a PARTIAL WindowGroupLimit, so each partition
   * ships at most k rows per group — the exchange is k·|groups|-
   * bounded no matter the corpus. Hash collisions undercount by
   * ~n²/2⁶¹ — irrelevant below ~10⁹ distincts per group, and the
   * k-min construction is exactly as collision-exposed as any KMV.
   */
  def distinctKmv(df: DataFrame, group: Column, value: Column,
      k: Int): DataFrame = {
    require(k >= 2, "k must be >= 2") // k=1 admits kth_hash=0 (div 0)
    val h = df.select(group.as("source"), TextOps.hash60(value).as("hv"))
      .distinct()
    TopK.perGroup(h, col("source"), col("hv").asc, col("hv"), k)
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_kept"), max(col("hv")).as("kth_hash"))
      .withColumn("est_distinct",
        when(col("n_kept") < k, col("n_kept"))
          .otherwise(graft.functions.ldiv(lit(1152921504606846976L),
            col("kth_hash")) * lit((k - 1).toLong)))
  }

  /**
   * The persistable KMV artifact behind [[distinctKmv]]: each group's
   * `k` smallest DISTINCT 60-bit value hashes, as plain rows —
   * save it, merge it ([[kmvMerge]]), read the estimate off it
   * ([[kmvEstimate]]). Merging is an EXACT homomorphism (k-min of a
   * union of k-min sets IS the union's k-min set), so per-partition /
   * per-day sketches roll up to precisely the artifact one global
   * build produces — the same contract as
   * [[quantileSketch]]/[[quantileSketchMerge]], spec-pinned.
   *
   * DELETION: non-invertible — values beyond the k-min cut were
   * discarded, so retiring a doc's values cannot restore the
   * runners-up. A takedown REBUILDS from corpus ∖ ids
   * ([[countMinDelete]]'s scaladoc lists the whole family's
   * contracts).
   */
  def kmvSketch(df: DataFrame, group: Column, value: Column,
      k: Int): DataFrame = {
    require(k >= 2, "k must be >= 2")
    val h = df.select(group.as("source"), TextOps.hash60(value).as("hv"))
      .distinct()
    TopK.perGroup(h, col("source"), col("hv").asc, col("hv"), k)
      .drop("rank")
  }

  /** Merge [[kmvSketch]] frames: union, distinct, re-cut to the k
   * smallest per group. Associative and exact by construction. */
  def kmvMerge(sketches: DataFrame, k: Int): DataFrame = {
    require(k >= 2, "k must be >= 2")
    TopK.perGroup(sketches.select(col("source"), col("hv")).distinct(),
      col("source"), col("hv").asc, col("hv"), k).drop("rank")
  }

  /** [[distinctKmv]]'s estimator read off a persisted/merged sketch. */
  def kmvEstimate(sketch: DataFrame, k: Int): DataFrame = {
    require(k >= 2, "k must be >= 2")
    sketch.groupBy(col("source"))
      .agg(count(lit(1)).as("n_kept"), max(col("hv")).as("kth_hash"))
      .withColumn("est_distinct",
        when(col("n_kept") < k, col("n_kept"))
          .otherwise(graft.functions.ldiv(lit(1152921504606846976L),
            col("kth_hash")) * lit((k - 1).toLong)))
  }

  /**
   * Pairwise group-similarity matrix from merged KMV sketches — the
   * "which sources share vocabulary / content" overview
   * ([[distinctKmv]]'s algebra applied to set RESEMBLANCE, the
   * mergeable-sketch route to the matrix [[Dedup.sourceOverlap]]
   * computes from exact doc fingerprints). For every unordered group
   * pair (a, b): the k smallest distinct hashes of a ∪ b are the
   * union's KMV sketch (KMV merge = union the two k-min sets, re-cut
   * to k), and the classic estimator J ≈ |{h ∈ MinK(a∪b) : h ∈ a ∧
   * h ∈ b}| / k (Beyer et al., SIGMOD 2007) falls out by counting
   * which survivors carry both membership flags. EXACT when the union
   * has fewer than k distinct values; `jaccard_ppm` is a truncating
   * integral divide so the estimate itself is engine-portable.
   *
   * Scale shape: the ONLY corpus-scale work is the per-(group, hash)
   * distinct + the k-smallest cut — the same k·|groups|-bounded
   * PARTIAL WindowGroupLimit exchange as [[distinctKmv]]. Everything
   * pairwise happens on the sketch frame: |pairs| = |groups|²/2 rows
   * of ≤ 2k sketch entries each, with the pair list broadcast into
   * both expansion joins. Sources/domains/shards number in the
   * thousands at worst; the corpus never touches the quadratic part.
   */
  def kmvSimilarity(df: DataFrame, group: Column, value: Column,
      k: Int, maxGroups: Int = 4096): DataFrame = {
    require(k >= 2, "k must be >= 2")
    val h = df.select(group.as("grp"), TextOps.hash60(value).as("hv"))
      .distinct()
    // checkpointed: consumed by both expansion joins below (one sketch
    // build instead of two) and by the cardinality guard's count
    val sk = TopK.perGroup(h, col("grp"), col("hv").asc, col("hv"), k)
      .drop("rank").localCheckpoint()
    val groups = sk.select(col("grp")).distinct()
    // the pair list is |groups|²/2 rows broadcast into two joins —
    // guard the cardinality so a high-cardinality column passed by
    // mistake (a per-doc id) fails loudly here instead of OOMing the
    // driver on the broadcast build
    val nGroups = groups.count()
    require(nGroups <= maxGroups,
      s"kmvSimilarity: $nGroups groups exceed maxGroups=$maxGroups — the " +
        "pairwise matrix is |groups|^2/2; pass a coarse group column " +
        "(source/domain/shard), or raise maxGroups deliberately")
    val pairs = groups.select(col("grp").as("grp_a"))
      .crossJoin(groups.select(col("grp").as("grp_b")))
      .filter(col("grp_a") < col("grp_b"))
    val fromA = sk.join(broadcast(pairs), col("grp") === col("grp_a"))
      .select(col("grp_a"), col("grp_b"), col("hv"),
        lit(1L).as("__in_a"), lit(0L).as("__in_b"))
    val fromB = sk.join(broadcast(pairs), col("grp") === col("grp_b"))
      .select(col("grp_a"), col("grp_b"), col("hv"),
        lit(0L).as("__in_a"), lit(1L).as("__in_b"))
    val merged = fromA.union(fromB)
      .groupBy(col("grp_a"), col("grp_b"), col("hv"))
      .agg(max(col("__in_a")).as("__in_a"), max(col("__in_b")).as("__in_b"))
    merged
      .withColumn("__rn", row_number().over(Window
        .partitionBy(col("grp_a"), col("grp_b")).orderBy(col("hv"))))
      .filter(col("__rn") <= k)
      .groupBy(col("grp_a"), col("grp_b"))
      .agg(count(lit(1)).as("n_merged"),
        sum(col("__in_a") * col("__in_b")).as("n_both"))
      .withColumn("jaccard_ppm",
        graft.functions.ldiv(col("n_both") * lit(1000000L), col("n_merged")))
  }

  /**
   * Column-level table profile — the schema-quality report a pipeline
   * run records next to [[dataCard]]'s content stats: one row per
   * profiled column with row/null counts, null fraction, a
   * [[distinctKmv]] cardinality estimate (EXACT below k), and the
   * mean/max length of the value's canonical string form. The
   * "did a source start shipping empty/constant/exploded columns"
   * check, cheap enough to run on every ingest.
   *
   * Shape: columns stack into (col_name, value-string) rows; the
   * per-column aggregates and the KMV sketch are two independent
   * map-side-combined aggregation branches over that stacked scan
   * (two passes — the KMV's distinct cannot share the count
   * aggregate's buffers), #cols × k state total. All statistics are
   * integer-derived (the two ratios are exact-integer divisions), so
   * the profile is engine-reproducible.
   */
  def profile(df: DataFrame, columns: Seq[String], k: Int = 64): DataFrame = {
    require(columns.nonEmpty, "profile needs at least one column")
    val stackExpr = s"stack(${columns.size}, " +
      columns.map(c => s"'$c', cast(`$c` as string)").mkString(", ") +
      ") as (col_name, v)"
    val stacked = df.selectExpr(stackExpr)
    val basic = stacked.groupBy(col("col_name")).agg(
      count(lit(1)).as("n_rows"),
      sum(when(col("v").isNull, lit(1L)).otherwise(lit(0L))).as("n_null"),
      sum(length(col("v"))).as("__lensum"),
      count(col("v")).as("__nnn"),
      max(length(col("v"))).cast("long").as("max_len"))
    val kmv = distinctKmv(stacked.filter(col("v").isNotNull),
        col("col_name"), col("v"), k)
      .select(col("source").as("col_name"), col("est_distinct"))
    basic.join(kmv, Seq("col_name"), "left")
      .select(col("col_name"), col("n_rows"), col("n_null"),
        (col("n_null") / col("n_rows")).as("null_frac"),
        coalesce(col("est_distinct"), lit(0L)).as("est_distinct"),
        (col("__lensum") / col("__nnn")).as("avg_len"),
        col("max_len"))
  }

  /**
   * PMI collocation mining: the top-k adjacent word pairs by pointwise
   * mutual information `ln(p(w₁w₂)/(p(w₁)p(w₂)))` with a minimum
   * pair-count support — the collocation/"multi-word expression"
   * detector of corpus analysis (Church & Hanks, 1990), and the raw
   * material for tokenizer-merge and phrase-mining decisions.
   *
   * Portability: PMI reduces to `ln` of a RATIO OF EXACT INTEGER
   * COUNTS, `(c₂·T·T)/(T₂·c₁ₐ·c₁ᵦ)` — both engines convert the same
   * longs to double, multiply in the same order, and round to integer
   * micro-nats, so the score hash-matches like the LM gates (counts
   * must stay under 2⁵³ for the double conversion to be exact —
   * ~9e15 tokens, past a 100 TB corpus).
   *
   * Scale shape: two map-side-combined count aggregations (words,
   * adjacent pairs — both vocabulary-sized after the combine); the
   * support filter runs BEFORE the unigram joins so only surviving
   * pairs join; the top-k lowers to `TakeOrderedAndProject`. The
   * unigram frame checkpoints once and serves both endpoint joins.
   */
  def collocations(df: DataFrame, text: Column, minCount: Long = 5,
      k: Int = 50): DataFrame = {
    require(minCount >= 1 && k >= 1, "minCount and k must be >= 1")
    val uni = df.select(explode(TextOps.tokens(text)).as("w"))
      .groupBy(col("w")).agg(count(lit(1)).as("c1"))
      .localCheckpoint() // consumed thrice: total + both endpoint joins
    val t1 = tokenTotal(uni, "c1", "collocations").toDouble
    val bi = df.select(explode(TextOps.ngrams(text, 2)).as("g"))
      .groupBy(col("g")).agg(count(lit(1)).as("c2"))
      .localCheckpoint() // consumed twice: total + scoring
    val t2 = tokenTotal(bi, "c2", "collocations").toDouble
    bi.filter(col("c2") >= minCount)
      .withColumn("w1", substring_index(col("g"), " ", 1))
      .withColumn("w2", substring_index(col("g"), " ", -1))
      .join(uni.select(col("w").as("w1"), col("c1").as("c1a")), "w1")
      .join(uni.select(col("w").as("w2"), col("c1").as("c1b")), "w2")
      .select(col("g").as("gram"), col("c2"),
        round(log((col("c2").cast("double") * lit(t1) * lit(t1)) /
          (lit(t2) * col("c1a").cast("double") * col("c1b").cast("double")))
          * lit(1000000.0)).cast("long").as("pmi_micro"))
      .orderBy(col("pmi_micro").desc, col("gram"))
      .limit(k)
  }

  /**
   * Per-source corpus "data card": the one-table summary a curation
   * run publishes next to its output — document/token/char volumes,
   * exact mean length, language spread and the dominant language with
   * its share, per source. Two tiny aggregations (doc-level rollup by
   * source; language histogram by (source, lang) whose top-1 rides
   * the `row_number ≤ 1` group-limit shape) joined on the handful of
   * source rows — every shuffle is map-side combined, nothing
   * corpus-sized crosses the wire. Mean length divides in DECIMAL
   * (order-free) so the card is bit-reproducible.
   */
  def dataCard(df: DataFrame, source: Column, text: Column,
      lang: Column): DataFrame = {
    val d = df.select(source.as("source"), lang.as("lang"),
      size(TextOps.tokens(text)).cast("long").as("toks"),
      length(text).cast("long").as("ch"))
    val stats = d.groupBy(col("source")).agg(
      count(lit(1)).as("n_docs"),
      sum(col("toks")).as("n_tokens"),
      sum(col("ch")).as("n_chars"),
      (sum(col("ch").cast("decimal(38,6)")) / count(lit(1)))
        .cast("double").as("mean_chars"))
    val l = d.groupBy(col("source"), col("lang")).agg(count(lit(1)).as("c"))
    val nl = l.groupBy(col("source")).agg(count(lit(1)).as("n_langs"))
    val top = TopK.perGroup(l, col("source"), col("c").desc, col("lang"), 1)
      .select(col("source"), col("lang").as("top_lang"),
        col("c").as("top_lang_docs"))
    stats.join(nl, "source").join(top, "source")
      // integer-ratio emit (functions.ratio6): round(double, 6) is
      // engine-private exactly at the 5e-7 ties int ratios sit on
      .withColumn("top_lang_share",
        graft.functions.ratio6(col("top_lang_docs"), col("n_docs")))
  }

  /**
   * Bigram-LM scoring with stupid backoff (Brants et al., EMNLP 2007:
   * no discounting, a fixed backoff factor `alpha` — the estimator of
   * choice when the model comes from raw counts at corpus scale) —
   * the stronger sibling of [[unigramNll]]: position 1 scores the
   * unigram, later positions score `−ln(c(w₁w₂)/c(w₁))` when the
   * bigram made the table and back off to `−ln(α·p(w))` otherwise.
   *
   * Same scale/portability shape as [[unigramNll]]: two
   * map-side-combined count aggregations (words, word-pairs), tables
   * cut deterministically (count desc, gram asc — the pair table
   * orders by the concatenated gram so any engine cuts identically),
   * every per-token case pre-rounded to integer micro-nats, LONG
   * sums, scoring a pure codegen projection
   * ([[graft.functions.BigramNllExpr]], two probes per token).
   */
  def bigramNll(df: DataFrame, id: Column, text: Column,
      vocabK: Int = 65536, bigramK: Int = 262144,
      alpha: Double = 0.4): DataFrame = {
    require(vocabK >= 1 && bigramK >= 1, "vocabK and bigramK must be >= 1")
    require(alpha > 0 && alpha <= 1, "alpha must be in (0, 1]")
    val uniCounts = df.select(explode(TextOps.tokens(text)).as("w"))
      .groupBy(col("w")).agg(count(lit(1)).as("c"))
      .localCheckpoint() // consumed by total, vocab cut, and bigram join
    val total = tokenTotal(uniCounts, "c", "bigramNll")
    def mUni(c: Long): Long =
      Math.round(-Math.log(c.toDouble / total.toDouble) * 1000000.0)
    def mBack(c: Long): Long =
      Math.round(-Math.log(alpha * (c.toDouble / total.toDouble)) * 1000000.0)
    val uni = new java.util.HashMap[String, Array[Long]](vocabK * 2)
    uniCounts.orderBy(col("c").desc, col("w")).limit(vocabK).collect()
      .foreach { r =>
        val c = r.getLong(1)
        uni.put(r.getString(0), Array(mUni(c), mBack(c)))
      }
    val bi = new java.util.HashMap[String, java.lang.Long](bigramK * 2)
    df.select(explode(TextOps.ngrams(text, 2)).as("g"))
      .groupBy(col("g")).agg(count(lit(1)).as("c2"))
      .withColumn("p", substring_index(col("g"), " ", 1))
      .join(uniCounts.select(col("w").as("p"), col("c").as("c1")), "p")
      .orderBy(col("c2").desc, col("g")).limit(bigramK).collect()
      .foreach { r =>
        val c2 = r.getAs[Long]("c2"); val c1 = r.getAs[Long]("c1")
        bi.put(r.getAs[String]("g"),
          Math.round(-Math.log(c2.toDouble / c1.toDouble) * 1000000.0))
      }
    val sc = df.sparkSession.sparkContext // tables broadcast once per executor
    val nll = graft.functions.BigramNllExpr.nllMicro(text,
      sc.broadcast(uni), sc.broadcast(bi), mUni(1L), mBack(1L))
    df.select(id.as("doc_id"),
        size(TextOps.tokens(text)).cast("long").as("n_tokens"),
        nll.as("nll_micro"))
      .withColumn("avg_nll", col("nll_micro") / (col("n_tokens") * lit(1000000.0)))
  }

  /**
   * Trigram-LM scoring with two-level stupid backoff — the n=3 tier
   * of the [[unigramNll]]/[[bigramNll]] ladder and the in-engine
   * form of the KenLM-style quality scorer (CCNet's perplexity
   * filter at n=5): position 1 scores the unigram, position 2 the
   * bigram (backing off to `α·p(w)`), positions ≥ 3 the trigram
   * `−ln(c(w₁w₂w₃)/c(w₁w₂))`, backing off to `α·` the bigram score
   * and then `α²·` the unigram — the canonical S(w|context) chain.
   *
   * Same scale/portability shape as [[bigramNll]]: three
   * map-side-combined count aggregations (words, pairs, triples),
   * tables cut deterministically (count desc, gram asc), every
   * per-token case pre-rounded to integer micro-nats at build (α/α²
   * variants are distinct entries — rounding does not distribute
   * over the product), LONG sums, scoring a pure codegen projection
   * ([[graft.functions.TrigramNllExpr]], ≤ 3 probes per token).
   * Trigram denominators are the UNCUT prefix-bigram counts, so a
   * trigram can make the table even when its prefix bigram missed
   * the bigram cut.
   */
  def trigramNll(df: DataFrame, id: Column, text: Column,
      vocabK: Int = 65536, bigramK: Int = 262144, trigramK: Int = 262144,
      alpha: Double = 0.4): DataFrame =
    trigramNllFromHists(df, id, text,
      ngramHistogram(df, text, 1), ngramHistogram(df, text, 2),
      ngramHistogram(df, text, 3), vocabK, bigramK, trigramK, alpha)

  /**
   * The n-gram count frame `(g, c)` the LM scorers read — exposed as
   * its own PERSISTABLE artifact (the [[wordTypeHistogram]] pattern
   * for the perplexity family): per-part counts merge exactly
   * ([[ngramHistMerge]]), the standing
   * [[graft.streaming.SeriesStream.ngramHistStream]] keeps one
   * current per ingest batch, and [[trigramNllFromHists]] builds its
   * scoring tables off the artifacts — so a standing corpus rescores
   * documents under an always-current LM with zero count scans.
   * n = 1 counts raw tokens (the LM convention — empties included,
   * unlike [[wordTypeHistogram]]'s trainer filter); n ≥ 2 counts
   * space-joined n-grams.
   */
  def ngramHistogram(df: DataFrame, text: Column, n: Int): DataFrame = {
    require(n >= 1, "n must be >= 1")
    val g = if (n == 1) TextOps.tokens(text) else TextOps.ngrams(text, n)
    df.select(explode(g).as("g")).groupBy(col("g"))
      .agg(count(lit(1)).as("c"))
  }

  /** Merge [[ngramHistogram]] parts: per-gram count sums — exact. */
  def ngramHistMerge(parts: DataFrame): DataFrame =
    parts.groupBy(col("g")).agg(sum(col("c")).as("c"))

  /** [[wordHistDelete]] for the n-gram count artifacts (the trigram
   * quality-LM's standing tables): subtract the deleted docs' own
   * n-gram histogram — exact, zero-count grams drop. Non-subset
   * detection is BEST-EFFORT: only a violation that drives some count
   * negative fails loudly; a non-subset delete whose per-gram counts
   * all stay non-negative (e.g. deleting a doc merely similar to an
   * ingested one) silently persists a wrong artifact — a clean run is
   * not proof of subset-correctness, that remains the caller's
   * contract. Post-delete ≡ [[ngramHistogram]] over
   * corpus ∖ deleted (spec-pinned), so the LM rescoring path keeps
   * its zero-count-scan property through takedowns. */
  def ngramHistDelete(hist: DataFrame, deleted: DataFrame, text: Column,
      n: Int): DataFrame =
    ngramHistMerge(hist.unionByName(
        ngramHistogram(deleted, text, n).withColumn("c", -col("c"))))
      .where(assert_true(col("c") >= 0L,
        concat(lit("ngramHistDelete: count for gram '"), col("g"),
          lit("' went negative — the deleted rows were not a subset " +
            "of what this histogram ingested"))).isNull)
      .filter(col("c") =!= 0L)

  /** [[trigramNll]] with the count tables built off prebuilt
   * [[ngramHistogram]] artifacts (n = 1, 2, 3) — identical scores,
   * none of the three corpus count scans. */
  def trigramNllFromHists(df: DataFrame, id: Column, text: Column,
      uniHist: DataFrame, biHist: DataFrame, triHist: DataFrame,
      vocabK: Int = 65536, bigramK: Int = 262144, trigramK: Int = 262144,
      alpha: Double = 0.4): DataFrame = {
    require(vocabK >= 1 && bigramK >= 1 && trigramK >= 1,
      "vocabK, bigramK, trigramK must be >= 1")
    require(alpha > 0 && alpha <= 1, "alpha must be in (0, 1]")
    val uniCounts = uniHist.select(col("g").as("w"), col("c"))
      .localCheckpoint() // consumed by total, vocab cut, bigram join
    val total = tokenTotal(uniCounts, "c", "trigramNllFromHists")
    def mUni(c: Long, a: Double): Long =
      Math.round(-Math.log(a * (c.toDouble / total.toDouble)) * 1000000.0)
    val uni = new java.util.HashMap[String, Array[Long]](vocabK * 2)
    uniCounts.orderBy(col("c").desc, col("w")).limit(vocabK).collect()
      .foreach { r =>
        val c = r.getLong(1)
        uni.put(r.getString(0),
          Array(mUni(c, 1.0), mUni(c, alpha), mUni(c, alpha * alpha)))
      }
    // uncut bigram counts: the bigram TABLE cut reads them, and the
    // trigram denominators need them regardless of the cut
    val biCounts = biHist.select(col("g"), col("c").as("c2"))
      .localCheckpoint()
    def mRatio(num: Long, den: Long, a: Double): Long =
      Math.round(-Math.log(a * (num.toDouble / den.toDouble)) * 1000000.0)
    val bi = new java.util.HashMap[String, Array[Long]](bigramK * 2)
    biCounts
      .withColumn("p", substring_index(col("g"), " ", 1))
      .join(uniCounts.select(col("w").as("p"), col("c").as("c1")), "p")
      .orderBy(col("c2").desc, col("g")).limit(bigramK).collect()
      .foreach { r =>
        val c2 = r.getAs[Long]("c2"); val c1 = r.getAs[Long]("c1")
        bi.put(r.getAs[String]("g"),
          Array(mRatio(c2, c1, 1.0), mRatio(c2, c1, alpha)))
      }
    val tri = new java.util.HashMap[String, java.lang.Long](trigramK * 2)
    triHist.select(col("g"), col("c").as("c3"))
      .withColumn("p2", substring_index(col("g"), " ", 2))
      .join(biCounts.select(col("g").as("p2"), col("c2").as("cp")), "p2")
      .orderBy(col("c3").desc, col("g")).limit(trigramK).collect()
      .foreach { r =>
        tri.put(r.getAs[String]("g"),
          mRatio(r.getAs[Long]("c3"), r.getAs[Long]("cp"), 1.0))
      }
    val sc = df.sparkSession.sparkContext // tables broadcast once per executor
    val nll = graft.functions.TrigramNllExpr.nllMicro(text,
      sc.broadcast(uni), sc.broadcast(bi), sc.broadcast(tri),
      mUni(1L, 1.0), mUni(1L, alpha), mUni(1L, alpha * alpha))
    df.select(id.as("doc_id"),
        size(TextOps.tokens(text)).cast("long").as("n_tokens"),
        nll.as("nll_micro"))
      .withColumn("avg_nll", col("nll_micro") / (col("n_tokens") * lit(1000000.0)))
  }

  /**
   * TF-IDF keyword extraction: the top-`k` most characteristic terms
   * per document — the tagging/labeling pass of a corpus build and
   * the lightweight alternative to embedding-based topic assignment.
   * `score = tf · ln(N / df)` with document frequencies taken exactly
   * for the `vocabK` most common words and floored at 1 (maximum
   * idf) for the tail — exact idf where ranking precision matters
   * (the common head), "rare = maximally characteristic" for the
   * long tail, the direction tf-idf wants anyway.
   *
   * Scale shape: term frequencies are one map-side-combined
   * (doc, word) count — the only corpus-sized shuffle; document
   * frequencies reuse the same pre-aggregated frame (counting rows,
   * never re-exploding tokens); the df table broadcasts into an O(1)
   * codegen'd hash probe ([[graft.functions.LongMapLookupExpr]] — a
   * literal-map `element_at` would linear-scan per row); and the
   * per-doc top-k is the `row_number ≤ k` shape the optimizer lowers
   * to a map-side partial `WindowGroupLimit`. Scores round to 6 dp
   * BEFORE ranking so the selected rows are engine-portable.
   */
  def keywords(df: DataFrame, id: Column, text: Column, k: Int,
      vocabK: Int = 65536): DataFrame = {
    require(k >= 1 && vocabK >= 1, "k and vocabK must be >= 1")
    // explode_outer keeps token-less docs as one null-term row, so the
    // corpus doc count N rides the same scan + shuffle as tf — no
    // separate full-corpus count action (ids are assumed unique per
    // doc, the contract every per-doc operator here shares)
    val tf0 = df.select(id.as("doc_id"),
        explode_outer(TextOps.tokens(text)).as("term"))
      .groupBy(col("doc_id"), col("term")).agg(count(lit(1)).as("tf"))
      .localCheckpoint() // consumed thrice: N, df build, scoring
    val n = tf0.agg(count_distinct(col("doc_id"))).head().getLong(0).toDouble
    val tf = tf0.filter(col("term").isNotNull)
    val dfreq = tf.groupBy(col("term")).agg(count(lit(1)).as("df"))
    val table = new java.util.HashMap[String, java.lang.Long](vocabK * 2)
    dfreq.orderBy(col("df").desc, col("term")).limit(vocabK).collect()
      .foreach(r => table.put(r.getString(0), r.getLong(1)))
    val dfCol = graft.functions.LongMapLookupExpr.lookup(col("term"),
      df.sparkSession.sparkContext.broadcast(table), 1L)
    // scale-0 quantization of the scaled product (not round(x, 6)):
    // both engines round the SAME score·10⁶ double, where half-away
    // conventions agree — the derived-rational tie rule
    val scored = tf.withColumn("score",
      round(col("tf") * log(lit(n) / dfCol.cast("double")) *
        lit(1000000.0)) / lit(1000000.0))
    TopK.perGroup(scored, col("doc_id"), col("score").desc, col("term"), k)
      .select(col("doc_id"), col("term"), col("tf"), col("score"),
        col("rank").cast("long").as("rank"))
  }

  /**
   * Per-group vocabulary drift: `KL(p_group ‖ p_corpus)` in integer
   * NANO-nats — how far each source/slice's unigram distribution sits
   * from the corpus mixture. The monitoring statistic of a data-mixing
   * pipeline: a source whose KL jumps between crawls changed character
   * (template rollout, language shift, spam influx) before any
   * downstream metric notices.
   *
   * Same portability construction as [[unigramNll]], per (group, word)
   * term instead of per token: each term
   * `(c_gw/N_g) · ln((c_gw/N_g)/(c_w/N))` is computed with an
   * identical float-op sequence on any engine, quantized to 1e-9, and
   * summed as LONGs — order-free and libm-proof (terms are signed:
   * over-represented words contribute positive, under-represented
   * negative; the sum is ≥ 0 up to quantization). Shuffles carry the
   * (group, word) histogram, never tokens; the per-group and total
   * frames broadcast back onto it.
   */
  def vocabDivergence(df: DataFrame, group: Column, text: Column): DataFrame = {
    val gw = df.select(group.as("grp"), explode(TextOps.tokens(text)).as("w"))
      .groupBy(col("grp"), col("w")).agg(count(lit(1)).as("cgw"))
      .localCheckpoint() // consumed three times: word/group/total rollups
    val wc = gw.groupBy(col("w")).agg(sum(col("cgw")).as("cw"))
    val ng = gw.groupBy(col("grp")).agg(sum(col("cgw")).as("ngc"))
    val n = wc.agg(sum(col("cw")).as("n"))
    val a = col("cgw") / col("ngc")
    val b = col("cw") / col("n")
    gw.join(wc, "w").join(broadcast(ng), "grp").crossJoin(broadcast(n))
      .withColumn("t", round((a * log(a / b)) * lit(1e9)).cast("long"))
      .groupBy(col("grp")).agg(sum(col("t")).as("kl_nano"))
      .select(col("grp").as("source"), col("kl_nano"),
        (col("kl_nano") / lit(1e9)).as("kl"))
  }

  /**
   * Per-group Population Stability Index over a NUMERIC feature —
   * the histogram complement of [[vocabDivergence]]: how far each
   * source/slice's distribution of `value` (doc length, quality
   * score, token count) sits from the corpus mixture, over
   * fixed-width bins. `PSI = Σ_b (p_gb − q_b)·ln(p_gb/q_b)` — the
   * symmetrized-KL-shaped drift statistic model-monitoring uses
   * (PSI > 0.2 ≈ "investigate"). Counts are +1-smoothed over the
   * occupied-bin set, so a bin one side lacks contributes a finite
   * term instead of ln(0).
   *
   * Portability: the same nano-nat construction as
   * [[vocabDivergence]] — identical integer counts feed an identical
   * float-op sequence, quantized to 1e-9 and summed as LONGs. Scale
   * shape: the only corpus-sized exchange is the (group, bin)
   * histogram group-by (map-side combined); the #groups × #bins
   * completion grid and the 1-row totals are broadcast-sized.
   */
  def psi(df: DataFrame, group: Column, value: Column,
      binWidth: Double): DataFrame = {
    require(binWidth > 0, "binWidth must be positive")
    // null values OR null groups would mint phantom histogram rows
    // that inflate the shared totals but can never match a grid cell
    // (null ≠ null in the equi-join) — they carry no attributable
    // distribution mass, drop them
    val d = df.select(group.as("grp"),
        floor(value.cast("double") / lit(binWidth)).cast("long").as("bin"))
      .filter(col("bin").isNotNull && col("grp").isNotNull)
    val gb = d.groupBy(col("grp"), col("bin")).agg(count(lit(1)).as("cgb"))
      .localCheckpoint() // consumed three times: bin/group rollups + grid
    val bins = gb.groupBy(col("bin")).agg(sum(col("cgb")).as("cb"))
    val grps = gb.groupBy(col("grp")).agg(sum(col("cgb")).as("ng"))
    val tots = bins.agg(sum(col("cb")).as("n"), count(lit(1)).as("nb"))
    // every (group, occupied bin) cell, zeros included — the grid is
    // #groups × #bins, nowhere near corpus-sized
    val grid = grps.crossJoin(broadcast(bins))
      .join(gb, Seq("grp", "bin"), "left")
      .withColumn("cgb", coalesce(col("cgb"), lit(0L)))
      .crossJoin(broadcast(tots))
    val p = (col("cgb") + lit(1.0)) / (col("ng") + col("nb"))
    val q = (col("cb") + lit(1.0)) / (col("n") + col("nb"))
    grid.withColumn("t", round((p - q) * log(p / q) * lit(1e9)).cast("long"))
      .groupBy(col("grp")).agg(sum(col("t")).as("psi_nano"))
      .select(col("grp").as("source"), col("psi_nano"),
        (col("psi_nano") / lit(1e9)).as("psi"))
  }

  /**
   * Per-group robust feature normalization — the scaling pass before
   * thresholding/mixing heterogeneous quality signals: within each
   * group, `robust = (x − median) / IQR` (outlier-insensitive, the
   * right scaler for heavy-tailed corpus features like lengths and
   * scores) and `minmax = (x − min) / (max − min)`. Groups where the
   * spread collapses (IQR or range 0) yield null rather than ±Inf.
   *
   * Scale shape: the group statistics ride [[quantiles]]' histogram
   * construction (the shuffle carries distinct values, not rows) plus
   * an exact min/max rollup, and broadcast back onto the scan as a
   * handful of rows per group — the normalization itself is a
   * projection. All statistics are exact, so scaled values are
   * engine-reproducible (the oracle's `quantile_cont` shares the
   * type-7 definition).
   */
  def normalize(df: DataFrame, group: Column, value: Column): DataFrame = {
    // internal stat columns are prefixed (like percentileRank's): the
    // stats frame joins back onto the caller's FULL row, whose own
    // columns must neither collide ambiguously nor get dropped
    val v = value.cast("double")
    val qs = quantiles(df, group, value,
      Seq("__nmq25" -> 0.25, "__nmq50" -> 0.5, "__nmq75" -> 0.75))
      .withColumnRenamed("grp", "__nmg")
    val mm = df.groupBy(group.as("__nmg"))
      .agg(min(v).as("__nmmn"), max(v).as("__nmmx"))
    df.withColumn("__g", group)
      .join(broadcast(qs.join(mm, "__nmg")), col("__g") === col("__nmg"))
      .withColumn("robust",
        when(col("__nmq75") =!= col("__nmq25"),
          (v - col("__nmq50")) / (col("__nmq75") - col("__nmq25"))))
      .withColumn("minmax",
        when(col("__nmmx") =!= col("__nmmn"),
          (v - col("__nmmn")) / (col("__nmmx") - col("__nmmn"))))
      .drop("__g", "__nmg", "__nmq25", "__nmq50", "__nmq75", "__nmmn", "__nmmx")
  }

  /**
   * Exact per-group percentile rank — `(rows strictly below x) /
   * (n − 1)`, the `percent_rank()` definition — for "keep the top
   * decile of quality per language" selections where the threshold
   * must adapt to each group's own distribution.
   *
   * The scale trick is [[quantiles]]' histogram again: a direct
   * `percent_rank` window needs each group's TOTAL ORDER through one
   * task; here the corpus collapses to the (group, value) → count
   * histogram (the shuffle carries distinct values), cumulative
   * counts rank the histogram's rows, and the per-row rank comes back
   * via a broadcastable join on (group, value). Single-row groups
   * rank 0, matching SQL `percent_rank`.
   */
  def percentileRank(df: DataFrame, group: Column, value: Column): DataFrame = {
    // internal names are prefixed: the rank frame joins back onto the
    // caller's full row, whose columns must not collide
    val hist = df.groupBy(group.as("__prg"), value.cast("double").as("__prv"))
      .agg(count(lit(1)).as("__prc"))
    val cum = hist
      .withColumn("__prhi", sum(col("__prc")).over(
        Window.partitionBy(col("__prg")).orderBy(col("__prv"))))
      .withColumn("__prlo", col("__prhi") - col("__prc"))
      .withColumn("__prn",
        sum(col("__prc")).over(Window.partitionBy(col("__prg"))))
      .select(col("__prg"), col("__prv"),
        when(col("__prn") > 1, col("__prlo") / (col("__prn") - 1))
          .otherwise(lit(0.0)).as("pct_rank"))
    df.withColumn("__g", group).withColumn("__v", value.cast("double"))
      .join(broadcast(cum),
        col("__g") === col("__prg") && col("__v") === col("__prv"))
      .drop("__g", "__v", "__prg", "__prv")
  }

  /**
   * EXACT per-group quantiles (linear interpolation, the type-7 /
   * `quantile_cont` definition every engine shares) over a
   * discrete-valued column — lengths, token counts, scores on a
   * fixed grid.
   *
   * The scale trick: `percentile()`-style exact quantiles buffer a
   * group's every value on one reducer — dead at 100 TB. Here the
   * corpus collapses FIRST to a (group, value) → count histogram
   * (map-side combined; the shuffle carries distinct values, not
   * rows), and the quantile is read off the histogram's cumulative
   * ranges with one tiny per-group window. Exact for any column with
   * bounded distinct values; for continuous doubles, bin first (or
   * use `approx_percentile`, same call shape).
   *
   * Each distinct value `v` covers sorted 0-based row indexes
   * `[lo, hi)`; quantile q sits at `pos = q·(n−1)`, interpolating
   * between the values covering `floor(pos)` and `floor(pos)+1`.
   */
  def quantiles(df: DataFrame, group: Column, value: Column,
      qs: Seq[(String, Double)]): DataFrame = {
    require(qs.nonEmpty && qs.forall { case (_, q) => q >= 0 && q <= 1 },
      "quantiles must be in [0, 1]")
    val hist = df.groupBy(group.as("grp"), value.cast("double").as("v"))
      .agg(count(lit(1)).as("c"))
    val cum = hist
      .withColumn("hi", sum(col("c")).over(
        Window.partitionBy(col("grp")).orderBy(col("v"))))
      .withColumn("lo", col("hi") - col("c"))
      .withColumn("n", sum(col("c")).over(Window.partitionBy(col("grp"))))
    val aggs = qs.zipWithIndex.flatMap { case ((_, q), i) =>
      val pos = lit(q) * (col("n") - 1).cast("double")
      val k = floor(pos).cast("long")
      Seq(
        max(when(col("lo") <= k && k < col("hi"), col("v"))).as(s"_l$i"),
        max(when(col("lo") <= k + 1 && k + 1 < col("hi"), col("v"))).as(s"_u$i"),
        max(pos - k.cast("double")).as(s"_f$i"))
    }
    val outs = qs.zipWithIndex.map { case ((name, _), i) =>
      (col(s"_l$i") + col(s"_f$i") *
        (coalesce(col(s"_u$i"), col(s"_l$i")) - col(s"_l$i"))).as(name)
    }
    cum.groupBy(col("grp"))
      .agg(aggs.head, aggs.tail: _*)
      .select(col("grp") +: outs: _*)
  }

  /**
   * Exact per-group TRIMMED mean — the robust center statistic
   * ("mean length ignoring the top/bottom α of occurrences") computed
   * off the same (group, value) histogram [[quantiles]] uses, so no
   * per-group total-order pass over ROWS ever happens: each distinct
   * value row carries its cumulative rank range [lo+1, hi], the kept
   * rank band is [⌊n·α⌋+1, n−⌊n·α⌋], and the value contributes
   * `overlap = min(hi, band_hi) − max(lo+1, band_lo) + 1` occurrences
   * — an EXACT integer. Values micro-quantize (`round(v·10⁶)`, the
   * scale-0 round every engine agrees on) so the weighted sum is pure
   * DECIMAL(38,0) integer arithmetic and the mean is a fixed
   * two-division IEEE sequence — engine-portable, no decimal-division
   * scale rules (which differ across engines) anywhere. `trimPpm` is
   * the per-side trim fraction in parts-per-million (50000 = 5 %
   * each side); a band that trims everything emits null.
   *
   * Scale shape: one map-side-combined histogram aggregate over the
   * corpus, then windows over DISTINCT VALUES per group (bounded by
   * value cardinality, not row count — the [[quantiles]] contract),
   * then one rollup to |groups| rows.
   */
  def trimmedMean(df: DataFrame, group: Column, value: Column,
      trimPpm: Long = 50000L): DataFrame = {
    require(trimPpm >= 0 && trimPpm < 500000L,
      "trimPpm must be in [0, 500000)")
    // nulls are excluded OUTRIGHT, not ranked: a null histogram row
    // would occupy trim-band rank positions (biasing the mean low) and
    // rank differently across engines — Spark orders nulls first
    // ascending, DuckDB last
    val hist = df.filter(value.isNotNull)
      .groupBy(group.as("grp"), value.cast("double").as("v"))
      .agg(count(lit(1)).as("c"))
    val cum = hist
      .withColumn("hi", sum(col("c")).over(
        Window.partitionBy(col("grp")).orderBy(col("v"))))
      .withColumn("lo", col("hi") - col("c"))
      .withColumn("n", sum(col("c")).over(Window.partitionBy(col("grp"))))
    val cut = graft.functions.ldiv(col("n") * lit(trimPpm), lit(1000000L))
    val bandLo = cut + lit(1L)
    val bandHi = col("n") - cut
    val overlap = least(col("hi"), bandHi) -
      greatest(col("lo") + lit(1L), bandLo) + lit(1L)
    val vi = round(col("v") * lit(1000000.0)).cast("long")
    cum
      .withColumn("__w", greatest(overlap, lit(0L)))
      .groupBy(col("grp"))
      .agg(sum(vi.cast("decimal(38,0)") * col("__w")).as("__s"),
        sum(col("__w")).as("n_kept"),
        max(col("n")).as("n_total"))
      .select(col("grp"), col("n_total"), col("n_kept"), {
        // half-up integral division down to a < 2^63 micro value
        // BEFORE any double: a > 2^64 decimal→double cast is one ulp
        // off nearest on some engines (SURVEY §7.5, the twap finding)
        val d0 = col("n_kept").cast("decimal(38,0)")
        val mag = graft.functions.ldiv(
          abs(col("__s")) * lit(2L) + d0, d0 * lit(2L))
        val micro = when(col("__s") < 0, -mag).otherwise(mag)
        when(col("n_kept") > 0,
          micro.cast("double") / lit(1000000.0)).as("trimmed_mean")
      })
  }

  /**
   * DSIR-style importance weighting (cf. Xie et al. 2023, "Data
   * Selection for Language Models via Importance Resampling",
   * arXiv:2302.03169): score every RAW-corpus document by how much
   * more likely it is under a TARGET-domain language model than under
   * the raw corpus's own — `imp = log p_target(x) − log p_raw(x) =
   * nll_raw − nll_target`. Positive means "reads more like the target
   * than like the background"; feed `imp_micro` (or `exp(avg_imp)`)
   * to [[Sampling.weighted]] for the resampling step.
   *
   * Both models are [[unigramModel]]s — each model's top-`vocabK`
   * vocabulary with floor probability `1/total` for OOV (the same
   * count-1 floor DSIR's hashed-ngram features effectively apply).
   * Scoring is two broadcast-table probes per token inside whole-stage
   * codegen; the difference of two integer micro-nat sums is itself an
   * order-free integer — bit-reproducible anywhere. The model builds
   * are the only shuffles (one distinct-word count each; the target
   * corpus is typically small).
   */
  def importanceWeights(raw: DataFrame, target: DataFrame, id: Column,
      text: Column, vocabK: Int = 65536): DataFrame = {
    val pRaw = unigramModel(raw, text, vocabK)
    val pTgt = unigramModel(target, text, vocabK)
    raw.select(id.as("doc_id"),
        size(TextOps.tokens(text)).cast("long").as("n_tokens"),
        pRaw.nll(text).as("nll_raw_micro"),
        pTgt.nll(text).as("nll_target_micro"))
      .withColumn("imp_micro", col("nll_raw_micro") - col("nll_target_micro"))
      .withColumn("avg_imp",
        col("imp_micro") / (col("n_tokens") * lit(1000000.0)))
  }

  /**
   * Multinomial Naive Bayes text classification, trained AND applied
   * in-engine — the fastText-shaped lightweight classifier of corpus
   * pipelines (CCNet/CommonCrawl-style quality and language routing)
   * without an external model artifact: per-class add-1-smoothed
   * unigram likelihoods over a shared top-`vocabK` vocabulary, class
   * priors from document counts, argmin total NLL.
   *
   * Portability discipline (the [[unigramNll]] construction, per
   * class): token scores are integer micro-nats
   * (`round(−ln((c+1)/(n_c+V+1))·1e6)`), absent-from-class vocabulary
   * words and OOV words share the count-0 floor `1/(n_c+V+1)`, priors
   * quantize the same way, and per-class document scores are LONG
   * sums — order-free, so any engine reproduces them bit-for-bit. The
   * argmin sorts `(score, class)` structs: ties go to the
   * lexicographically smallest class in every engine.
   *
   * Scale shape: training is ONE token-explode groupBy (map-side
   * combined; the shuffle carries distinct (class, word) pairs), the
   * driver collects only the `vocabK·|classes|`-bounded count table,
   * and scoring is |classes| broadcast-map probes per token inside
   * whole-stage codegen — a pure projection over the scan, no join,
   * no shuffle, stream-applicable. Suited to the small class counts
   * (languages, quality tiers, sources) these routers have.
   *
   * Rows with a null label still get scored (their `label`/`correct`
   * are null) — train on the labeled subset, predict everywhere.
   */
  /** A trained NB model: per-class broadcast micro-nat tables plus the
   * scoring column factory. Like [[UnigramModel]], `scored(text)` is a
   * pure projection — estimate on a static labeled corpus, classify an
   * unbounded STREAM with zero per-batch state
   * (`SeriesStream.scoreStream`-style). */
  final case class NaiveBayesModel(classes: Seq[String],
      perClass: Seq[(String, org.apache.spark.broadcast.Broadcast[
        java.util.HashMap[String, java.lang.Long]], Long, Long)]) {
    /** Ascending-sorted array of (score, class) structs: element 0 is
     * the argmin (min NLL, ties to the smallest class name — the
     * struct sort is deterministic in any engine), element 1 the
     * runner-up for margins. */
    def scored(text: Column): Column =
      array_sort(array(perClass.map { case (c, bc, oov, prior) =>
        struct(
          (graft.functions.UnigramNllExpr.nllMicro(text, bc, oov) + lit(prior)).as("s"),
          lit(c).as("c"))
      }: _*))
  }

  /** Estimate a [[NaiveBayesModel]] from a labeled STATIC corpus (the
   * driver actions — vocab cut, class totals, the K·|classes|-bounded
   * class-vocab count collect — are why the model is a separate
   * value, exactly like [[unigramModel]]). */
  def naiveBayesModel(df: DataFrame, text: Column, label: Column,
      vocabK: Int = 65536): NaiveBayesModel = {
    require(vocabK >= 1, "vocabK must be >= 1")
    val labeled = df.filter(label.isNotNull)
    val cw = labeled
      .select(label.cast("string").as("cls"), explode(TextOps.tokens(text)).as("w"))
      .groupBy(col("cls"), col("w")).agg(count(lit(1)).as("c"))
      .localCheckpoint() // consumed 3×: vocab cut, class totals, class-vocab counts
    val vocabDf = cw.groupBy(col("w")).agg(sum(col("c")).as("cc"))
      .orderBy(col("cc").desc, col("w")).limit(vocabK).select(col("w"))
    val v = vocabDf.count()
    val nTok = cw.groupBy(col("cls")).agg(sum(col("c")).as("n")).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val nDoc = labeled.groupBy(label.cast("string").as("cls"))
      .agg(count(lit(1)).as("nd")).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val totalDocs = nDoc.values.sum
    val classes = nDoc.keys.toSeq.sorted
    require(classes.size >= 2, "naiveBayesModel needs >= 2 classes")
    // class-conditional counts restricted to the shared vocabulary:
    // K·|classes|-bounded — the only corpus-derived table the driver
    // ever holds
    val cv = cw.join(broadcast(vocabDf), "w")
      .select(col("cls"), col("w"), col("c")).collect()
      .groupBy(_.getString(0)) // one driver pass, not one scan per class
    def micro(num: Double, den: Double): Long =
      Math.round(-Math.log(num / den) * 1000000.0)
    val sc = df.sparkSession.sparkContext
    NaiveBayesModel(classes, classes.map { c =>
      // getOrElse: a class whose docs are all null-text has doc rows
      // (so it IS a class with a prior) but zero token rows
      val den = (nTok.getOrElse(c, 0L) + v + 1).toDouble
      val m = new java.util.HashMap[String, java.lang.Long]()
      // only observed (class, vocab-word) counts: an absent vocab word's
      // (0+1)/den equals the OOV floor, so the map stays sparse
      cv.getOrElse(c, Array.empty).foreach { r =>
        m.put(r.getString(1), micro(r.getLong(2) + 1.0, den))
      }
      val prior = Math.round(-Math.log(nDoc(c).toDouble / totalDocs) * 1000000.0)
      (c, sc.broadcast(m), micro(1.0, den), prior)
    })
  }

  def naiveBayesClassify(df: DataFrame, id: Column, text: Column,
      label: Column, vocabK: Int = 65536): DataFrame = {
    val model = naiveBayesModel(df, text, label, vocabK)
    // null text → null scores for EVERY class (the probe expression is
    // null-propagating), so the struct sort would tie arbitrarily —
    // gate the outputs on a non-null best score instead
    val s0 = col("__a")(0)("s")
    df.select(id.as("doc_id"), label.cast("string").as("label"),
        model.scored(text).as("__a"))
      .select(col("doc_id"), col("label"),
        when(s0.isNotNull, col("__a")(0)("c")).as("pred"),
        s0.as("nll_micro"),
        (col("__a")(1)("s") - s0).as("margin_micro"))
      .withColumn("correct", col("label") === col("pred"))
  }

  /**
   * Reciprocal-rank fusion (Cormack, Clarke & Buettcher, SIGIR 2009)
   * of several per-document ranking signals into one consensus score:
   * `rrf(d) = Σ_s 1/(k + rank_s(d))`, emitted in integer NANO-units
   * (`Σ ⌊1e9/(k+rank)⌋` — order-free LONG sums, engine-portable).
   * The standard way to combine heterogeneous signals (length,
   * quality, perplexity, novelty) without calibrating their scales —
   * only the RANKS matter.
   *
   * Ranks are standard-competition (`rank()`) ranks, higher signal
   * value = better = rank 1, computed WITHOUT a global sort: each
   * signal collapses to its value histogram (map-side combined; the
   * shuffle carries distinct values), cumulative counts over the
   * descending histogram give each value's min-rank, and ranks come
   * back via a broadcast join on the value.
   *
   * The histogram cumulative sum itself is RANGE-BUCKETED (the
   * [[Packing.packSequences]] prefix construction): up to
   * `RrfBuckets − 1` approximate percentiles of the distinct values
   * become order-preserving split points, per-bucket totals prefix on
   * a ≤`RrfBuckets`-row frame, and the exact cumulative window runs
   * partitioned by bucket — so a CONTINUOUS signal (distinct values ≈
   * corpus size) never collapses the rank pass to one partition.
   * Split points steer only the PARTITIONING: ranks are exact for any
   * order-preserving split, so `percentile_approx`'s sampling
   * nondeterminism cannot reach the output. Bounded-distinct signals
   * (lengths, counts, quantized scores) stay the preferred input —
   * their histograms are tiny — but are no longer a correctness-of-
   * scale requirement.
   *
   * A null signal value gets a null rank and contributes 0 to the
   * fusion (the "skip missing lists" RRF convention).
   *
   * Precision contract: signals are cast to DOUBLE for the histogram
   * build and the rank join, so integral values must stay below 2⁵³
   * — distinct longs beyond that (or doubles that collapse under the
   * cast) silently merge into one histogram cell and share a rank.
   * NaN values rely on Spark's NaN-equality join/group semantics
   * (all NaNs are one histogram cell, ranked after +∞ in the
   * descending order); engines with IEEE NaN joins would drop them —
   * filter or bin NaN signals first if the fusion must be portable.
   */
  /** Range buckets for [[rrfFuse]]'s histogram prefix sums, and the
   * estimated input size under which one cumulative window is cheaper
   * than the bucketed construction (a histogram from a ≤64 MB input
   * sorts in ms on one partition). */
  val RrfBuckets = 1024
  val RrfSmallCorpusBytes = 64L << 20
  /** Histogram row count under which one cumulative window beats the
   * bucketed construction (a 64k-row window sorts in ms). */
  val RrfSmallHist = 65536L

  def rrfFuse(df: DataFrame, id: Column, signals: Seq[(String, Column)],
      rrfK: Int = 60): DataFrame =
    // Decision without ANY job: Catalyst's sizeInBytes estimate for
    // the input (the statistic autoBroadcastJoinThreshold reads). A
    // small corpus cannot have a big histogram; a big corpus takes the
    // bucketed path even for bounded-distinct signals — harmless,
    // since every extra pass there runs over the (tiny) histogram,
    // not the corpus. Both branches are exact; the threshold is
    // purely a performance heuristic, so an estimate is enough.
    rrfFuseImpl(df, id, signals, rrfK,
      smallCorpus = df.queryExecution.optimizedPlan.stats.sizeInBytes
        <= RrfSmallCorpusBytes)

  private[operators] def rrfFuseImpl(df: DataFrame, id: Column,
      signals: Seq[(String, Column)], rrfK: Int,
      smallCorpus: Boolean): DataFrame = {
    require(signals.nonEmpty, "need at least one signal")
    require(rrfK >= 0, "rrfK must be >= 0")
    val base = df.select(id.as("doc_id") +:
      signals.map { case (n, c) => c.cast("double").as(s"__v_$n") }: _*)
    // every histogram derives from the BASE projection, not the
    // progressively-joined frame — otherwise signal i's histogram job
    // would re-execute the i−1 prior joins (O(S²) scan work)
    def oneWindow(hist: DataFrame, n: String): DataFrame =
      hist.withColumn("__cum",
          sum(col("__hc")).over(Window.orderBy(col("__hv").desc)))
        .select(col("__hv"),
          (col("__cum") - col("__hc") + 1).as(s"rank_$n"))
    // Big corpus: ONE sketch pass sizes every signal's histogram, so
    // bounded-distinct signals (lengths, counts — tiny histograms)
    // keep the plain single-window plan with no checkpoint, and only
    // genuinely continuous signals pay for the bucketed machinery.
    // Approximation is safe: both branches are exact, the threshold
    // is purely a performance heuristic.
    lazy val approxSizes: Map[String, Long] = {
      val row = base.agg(
        approx_count_distinct(col(s"__v_${signals.head._1}")),
        signals.tail.map { case (n, _) =>
          approx_count_distinct(col(s"__v_$n")) }: _*).head()
      signals.map(_._1).zipWithIndex
        .map { case (n, i) => n -> row.getLong(i) }.toMap
    }
    val ranked = signals.map { case (n, _) =>
      val hist = base.filter(col(s"__v_$n").isNotNull)
        .groupBy(col(s"__v_$n").as("__hv")).agg(count(lit(1)).as("__hc"))
      n -> (if (smallCorpus || approxSizes(n) <= RrfSmallHist)
        // small corpus or bounded-distinct signal: one trivial
        // window; no checkpoint, no percentile pass
        oneWindow(hist, n)
      else {
        // continuous signal: order-preserving split points over the
        // DISTINCT values (one-row frame, broadcast back) range-bucket
        // the cumulative sum so it never collapses to one partition.
        // Split points steer only the PARTITIONING — ranks are exact
        // for any order-preserving split, so percentile_approx's
        // sampling nondeterminism cannot reach the output. Spark's NaN
        // total order (NaN > +∞, NaN = NaN) puts NaN cells in the top
        // bucket — first in descending rank order, the doc'd contract.
        // Checkpointed: the histogram feeds the split-point aggregate
        // AND the rank pass (corpus-sized here, so worth one
        // materialization; the bounded-distinct paths never pay it).
        val ckHist = hist.localCheckpoint()
        locally {
          val splits = ckHist.agg(percentile_approx(col("__hv"),
            array((1 until RrfBuckets).map(i =>
              lit(i.toDouble / RrfBuckets)): _*), lit(10000)).as("__sp"))
          val bucketed = ckHist.crossJoin(broadcast(splits))
            .withColumn("__bkt",
              size(filter(col("__sp"), s => s < col("__hv"))))
            .drop("__sp")
          val pfx = bucketed.groupBy(col("__bkt"))
            .agg(sum(col("__hc")).as("__bsum"))
            .withColumn("__bbefore", coalesce(
              sum(col("__bsum")).over(Window.orderBy(col("__bkt").desc)
                .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
            .select(col("__bkt"), col("__bbefore"))
          val wIn = Window.partitionBy(col("__bkt")).orderBy(col("__hv").desc)
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)
          bucketed.join(broadcast(pfx), Seq("__bkt"))
            .withColumn("__cum",
              col("__bbefore") + sum(col("__hc")).over(wIn))
            .select(col("__hv"),
              (col("__cum") - col("__hc") + 1).as(s"rank_$n"))
        }
      })
    }
    var out = base
    ranked.foreach { case (n, r) =>
      out = out.join(broadcast(r), out(s"__v_$n") === r("__hv"), "left")
        .drop("__hv")
    }
    val fused = signals.map { case (n, _) =>
      coalesce(graft.functions.ldiv(lit(1000000000L), lit(rrfK.toLong) + col(s"rank_$n")),
        lit(0L))
    }.reduce(_ + _)
    out.withColumn("rrf_nano", fused)
      .drop(signals.map { case (n, _) => s"__v_$n" }: _*)
  }

  /**
   * Inverted postings index: term → document frequency + the first
   * `maxPostings` doc ids (ascending) — the corpus-scale build of a
   * keyword-search / retrieval index ([[bm25]] scores against a FIXED
   * term list; this materializes the term-major view for arbitrary
   * lookups and feeds df tables to anything idf-shaped).
   *
   * Scale shape: per-doc `array_distinct` BEFORE the explode (the
   * [[topNgrams]] trick) keeps the stream one row per (doc, term)
   * without a corpus-wide distinct; the pair frame is checkpointed
   * once and feeds BOTH aggregates; df counts partial-aggregate
   * map-side; the posting cap rides the `row_number ≤ k` shape the
   * optimizer lowers to a PARTIAL WindowGroupLimit, so each partition
   * ships at most `maxPostings` rows per term — a stopword's exchange
   * is capped like everything else, and no unbounded per-term list is
   * ever collected. `minDf` prunes the hapax tail, which at web scale
   * is most of the vocabulary.
   */
  def postings(df: DataFrame, id: Column, text: Column,
      maxPostings: Int = 8, minDf: Long = 1): DataFrame = {
    require(maxPostings >= 1, "maxPostings must be >= 1")
    val pairs = df.select(id.as("doc_id"),
        explode(array_distinct(TextOps.tokens(text))).as("term"))
      .localCheckpoint() // consumed twice: df counts + capped lists
    val dfc = pairs.groupBy(col("term")).agg(count(lit(1)).as("doc_freq"))
      .filter(col("doc_freq") >= minDf)
    val capped = TopK.perGroup(pairs, col("term"), col("doc_id").asc,
        col("doc_id"), maxPostings)
      .groupBy(col("term"))
      .agg(sort_array(collect_list(col("doc_id"))).as("postings"))
    // both sides keyed on term — the join reuses the agg partitioning
    dfc.join(capped, "term")
  }

  /**
   * Class-based TF-IDF (the c-TF-IDF of Grootendorst 2022, "BERTopic:
   * Neural topic modeling with a class-based TF-IDF procedure",
   * arXiv:2203.05794, §2.3): the top-`k` terms that CHARACTERIZE each
   * class — `score(w, c) = tf(w, c) · ln(1 + A/cf(w))` where `cf(w)`
   * is the term's corpus-wide count and `A` the average class token
   * mass. The per-source / per-topic "what is this slice about"
   * descriptor that [[dataCard]]'s aggregate stats don't give.
   *
   * Portability: the idf factor quantizes to integer nano-nats after
   * one shared double expression (`round(ln(1 + A/cf)·1e9)`), the
   * tf·idf product runs in DECIMAL(38,0) (exact, overflow-safe to
   * ~10²⁰ token-weighted terms), and the emitted double is the one
   * final cast — identical in any engine. Ties rank lexicographically.
   *
   * Scale shape: one token-explode groupBy to the (class, word) count
   * table (map-side combined), word totals reuse it, the scalar
   * totals row broadcasts, and the per-class top-k rides the
   * `row_number ≤ k` PARTIAL WindowGroupLimit — the exchange is
   * k·|classes|-bounded, never vocabulary-sized.
   */
  def classTerms(df: DataFrame, label: Column, text: Column,
      k: Int): DataFrame = {
    require(k >= 1, "k must be >= 1")
    val cw = df.filter(label.isNotNull)
      .select(label.cast("string").as("cls"), explode(TextOps.tokens(text)).as("term"))
      .groupBy(col("cls"), col("term")).agg(count(lit(1)).as("tf"))
      .localCheckpoint() // feeds word totals, the scalar row, and scoring
    val wTot = cw.groupBy(col("term")).agg(sum(col("tf")).as("__cf"))
    val tot = cw.agg(sum(col("tf")).as("__tot"),
      count_distinct(col("cls")).as("__ncls"))
    val scored = cw.join(wTot, "term").crossJoin(broadcast(tot))
      .withColumn("__m", round(log(lit(1.0) +
        (col("__tot").cast("double") / col("__ncls").cast("double")) /
          col("__cf").cast("double")) * 1e9).cast("long"))
      .withColumn("__score", col("tf").cast("decimal(38,0)") * col("__m"))
    TopK.perGroup(scored, col("cls"), col("__score").desc, col("term"), k)
      .select(col("cls"), col("term"), col("tf"),
        (col("__score").cast("double") / 1e9).as("ctfidf"),
        col("rank").cast("long").as("rank"))
  }

  /**
   * Count-min sketch (Cormode & Muthukrishnan, J. Algorithms 2005)
   * over a value stream: `depth` hash rows × `width` buckets of
   * counts; a value's frequency estimate is the MIN of its bucket
   * counts across rows — never an underestimate, overestimates
   * bounded by `e·N/width` with probability `1 − e^−depth`. The
   * frequency complement of [[distinctKmv]]: heavy-hitter queries and
   * frequency joins over vocabularies too large to count exactly,
   * MERGEABLE by cell-wise addition (union two corpora's sketches
   * without touching either corpus).
   *
   * Determinism/portability: bucket hashes are the same md5-derived
   * 60-bit construction every sampling/sketch decision uses (row `r`
   * hashes `"cms<r>:" + value`), so any engine reproduces the exact
   * cell table — the sketch itself is oracle-checkable, not just its
   * estimates. One map-side-combined groupBy of (row, bucket) —
   * `depth` rows per input value; the exchange is bounded by
   * `depth · width`, never the vocabulary.
   */
  def countMinSketch(df: DataFrame, value: Column, width: Int = 1024,
      depth: Int = 4): DataFrame = {
    require(width >= 2 && depth >= 1, "need width >= 2, depth >= 1")
    df.select(explode(array((0 until depth).map(r =>
        struct(lit(r).as("row"),
          pmod(TextOps.hash60(concat(lit(s"cms$r:"), value.cast("string"))),
            lit(width.toLong)).cast("int").as("bucket"))): _*)).as("rb"))
      .groupBy(col("rb.row").as("row"), col("rb.bucket").as("bucket"))
      .agg(count(lit(1)).as("c"))
  }

  /** Merge [[countMinSketch]] frames built with the SAME
   * (width, depth): cell-wise count addition — an exact homomorphism
   * (counts are additive), so per-split/per-day/streamed sketches sum
   * to precisely the global build. Parameter agreement is the
   * caller's contract, as in [[countMinEstimate]]. */
  def countMinMerge(sketches: DataFrame): DataFrame =
    sketches.groupBy(col("row"), col("bucket"))
      .agg(sum(col("c")).as("c"))

  /**
   * TAKEDOWN propagation for the CMS — the one sketch in this family
   * whose delete is EXACTLY invertible (the classic turnstile
   * property: cells are plain sums): sketch the deleted rows alone
   * and subtract cell-wise. Post-delete ≡ from-scratch
   * [[countMinSketch]] over corpus ∖ deleted, bit-for-bit
   * (spec-pinned; zeroed cells drop, matching the from-scratch
   * build's sparse shape), PROVIDED `deleted` is a sub-multiset of
   * what the sketch ingested — the standing-artifact contract.
   * Violations are detected BEST-EFFORT only: a non-subset delete
   * fails loudly iff some cell goes negative; one whose cells all
   * stay non-negative persists a silently wrong sketch, so a clean
   * run is not proof the contract held.
   *
   * The rest of the sketch family is NOT invertible — takedowns
   * there rebuild from the remaining corpus: [[kmvSketch]] (values
   * beyond the k-min cut were discarded), [[mgSketch]] (decrements
   * destroyed counts), [[quantileSketch]] (a shrunken value range
   * re-grids at a width the standing sketch cannot refine to),
   * [[graft.operators.TextOps.evalGrams]] as a DISTINCT set (a gram
   * shared with surviving docs must stay — recount required), and
   * Bloom filters (bits are ORs). Each carries this note; the
   * invertible paths are this, [[wordHistMerge]]-style count
   * histograms (subtract the deleted batch's histogram), and the
   * covariance/moment partials (plain sums).
   */
  def countMinDelete(sketch: DataFrame, deleted: DataFrame, value: Column,
      width: Int = 1024, depth: Int = 4): DataFrame =
    sketch.unionByName(countMinSketch(deleted, value, width, depth)
        .withColumn("c", -col("c")))
      .groupBy(col("row"), col("bucket"))
      .agg(sum(col("c")).as("c"))
      // a cell driven negative means the deleted rows were not a
      // subset of what the sketch ingested — fail loudly like
      // wordHistDelete, never persist a sketch whose min-over-rows
      // estimates have gone silently wrong
      .where(assert_true(col("c") >= 0L,
        concat(lit("countMinDelete: cell ("), col("row"), lit(","),
          col("bucket"),
          lit(") went negative — the deleted rows were not a subset " +
            "of what this sketch ingested"))).isNull)
      .filter(col("c") =!= 0L)

  /** Point-frequency estimates off a [[countMinSketch]]: for each
   * queried value, `min` over the depth rows of its bucket's count.
   * The probe is a `depth`-way explode LEFT-joined once against the
   * (depth·width)-bounded sketch — broadcastable, no corpus access.
   * The sketch is SPARSE (zero cells are unmaterialized), so an
   * unmatched probe coalesces to 0: a value with any empty cell
   * estimates 0 (the canonical CMS answer for never-seen values) and
   * always emits a row — an inner join would silently drop it or
   * over-estimate from its non-empty cells only.
   *
   * `width`/`depth` MUST match the sketch's build parameters — a
   * mismatch probes the wrong cells and can UNDERCOUNT, voiding the
   * one-sided guarantee. [[countMin]] carries them for you. */
  def countMinEstimate(sketch: DataFrame, queries: DataFrame, value: Column,
      width: Int = 1024, depth: Int = 4): DataFrame = {
    require(width >= 2 && depth >= 1, "need width >= 2, depth >= 1")
    queries.select(value.as("v"))
      .select(col("v"), explode(array((0 until depth).map(r =>
        struct(lit(r).as("row"),
          pmod(TextOps.hash60(concat(lit(s"cms$r:"), col("v").cast("string"))),
            lit(width.toLong)).cast("int").as("bucket"))): _*)).as("rb"))
      .join(broadcast(sketch),
        col("rb.row") === sketch("row") && col("rb.bucket") === sketch("bucket"),
        "left")
      .groupBy(col("v"))
      .agg(min(coalesce(col("c"), lit(0L))).as("est"))
  }

  /** A built sketch WITH its parameters — use this pairing so probe
   * hashing can never drift from build hashing (see
   * [[countMinEstimate]]'s parameter-mismatch trap). */
  final case class CountMin(cells: DataFrame, width: Int, depth: Int) {
    def estimate(queries: DataFrame, value: Column): DataFrame =
      countMinEstimate(cells, queries, value, width, depth)
  }

  def countMin(df: DataFrame, value: Column, width: Int = 1024,
      depth: Int = 4): CountMin =
    CountMin(countMinSketch(df, value, width, depth), width, depth)

  /**
   * Tokenizer fertility per group: how many subword-ish tokens the
   * BPE-shaped tokenization ([[TextOps.tokenCounts]]' letter-run /
   * digit-run / symbol split) produces per whitespace word, and how
   * many characters each costs — the budget-planning metric that
   * decides how far a token budget actually stretches on each source
   * or language (morphologically rich and non-spaced scripts fragment
   * more; cf. the fertility analyses of multilingual tokenizers, e.g.
   * Rust et al. 2021, arXiv:2012.15613).
   *
   * One map-side-combined groupBy over pure codegen'd projections;
   * counts sum as integers (order-free), each ratio is a single final
   * double division — engine-portable like [[dataCard]]'s means.
   */
  def fertility(df: DataFrame, group: Column, text: Column): DataFrame = {
    val tc = TextOps.tokenCounts(text).toMap
    df.groupBy(group.as("source"))
      .agg(count(lit(1)).as("n_docs"),
        sum(tc("ws_tokens")).as("ws_tokens"),
        sum(tc("bpe_tokens")).as("bpe_tokens"),
        sum(length(text).cast("long")).as("n_chars"))
      .withColumn("fertility",
        col("bpe_tokens").cast("double") / col("ws_tokens").cast("double"))
      // bpe_tokens CAN be 0 (whitespace-only texts tokenize to no
      // runs; ws_tokens cannot — split always emits >= 1): null the
      // ratio rather than ride an engine-private 0-division (Spark's
      // non-ANSI Divide yields null, IEEE engines yield inf)
      .withColumn("chars_per_token",
        when(col("bpe_tokens") > 0,
          col("n_chars").cast("double") / col("bpe_tokens").cast("double")))
  }

  /**
   * Classifier calibration table — the reliability diagram a
   * quality/langid classifier's threshold is picked from: scores in
   * [0, 1] bucket into `bins` equal-width bins, each emitting its row
   * count, positive count, positive rate (integer ppm), and mean
   * score (micro, twap-discipline integral divide) — compare
   * `mean_score` to `pos_rate` per bin and the gap IS the
   * calibration error. Scores outside [0, 1] clamp into the edge
   * bins; null scores drop. One map-side-combined groupBy over a
   * codegen'd projection; |bins| rows out.
   */
  def calibration(df: DataFrame, score: Column, label: Column,
      bins: Int = 10): DataFrame = {
    require(bins >= 2, "bins must be >= 2")
    val s = score.cast("double")
    val bin = least(greatest(floor(s * bins), lit(0.0)),
      lit((bins - 1).toDouble)).cast("long")
    val si = round(s * lit(1000000.0)).cast("long")
    // NaN would pass a bare isNotNull and clamp into the top bin
    // (greatest/least treat NaN as the largest double) while its
    // micro cast contributes nothing — drop it like null
    df.filter(s.isNotNull && !isnan(s))
      .groupBy(bin.as("bin"))
      .agg(count(lit(1)).as("n"),
        sum(when(label, 1L).otherwise(0L)).as("n_pos"),
        sum(si.cast("decimal(38,0)")).as("__ssum"))
      .select(col("bin"), col("n"), col("n_pos"),
        graft.functions.ldiv(col("n_pos") * lit(1000000L), col("n"))
          .as("pos_rate_ppm"),
        {
          // half-up integral micro mean (the twap construction)
          val d0 = col("n").cast("decimal(38,0)")
          val mag = graft.functions.ldiv(
            abs(col("__ssum")) * lit(2L) + d0, d0 * lit(2L))
          (when(col("__ssum") < 0, -mag).otherwise(mag).cast("double") /
            lit(1000000.0)).as("mean_score")
        })
  }

  /**
   * Exact AUC by the rank-sum (Mann–Whitney U) identity, in pure
   * integer arithmetic off the SCORE HISTOGRAM: with tied scores
   * sharing their average rank, `AUC = (Σ_pos rank − P(P+1)/2)/(P·N)`.
   * Doubling every rank keeps the ±½ tie terms integral:
   * `rank2 = 2·(items below) + n_at_score + 1`, `AUC_ppm =
   * ⌊(Σ p·rank2 − P(P+1))·10⁶ / (2·P·N)⌋` — no float ever, so the
   * number is bit-identical on any engine. This is also the
   * probability a random positive outranks a random negative (ties
   * count ½) — the metric a quality-classifier sweep reports.
   *
   * Scale shape: one histogram groupBy (bounded by distinct scores,
   * the [[quantiles]] contract), one ordered window over it, one
   * 1-row rollup. Null scores drop. Returns
   * (n_pos, n_neg, auc_ppm, auc); AUC is null when either class is
   * empty.
   */
  def aucPpm(df: DataFrame, score: Column, label: Column): DataFrame = {
    val s = score.cast("double")
    val hist = df.filter(s.isNotNull && !isnan(s))
      .groupBy(s.as("s"))
      .agg(count(lit(1)).as("n"),
        sum(when(label, 1L).otherwise(0L)).as("p"))
      .withColumn("b", floor(col("s") * lit(1024.0)))
    // two-pass cumulative count so a CONTINUOUS score (near-per-doc
    // distinct values at 100 TB) never funnels its whole histogram
    // through one unpartitioned-window task: within-bucket prefix
    // sums run partitioned by a coarse score bucket (floor(s·1024) —
    // monotonic in s, so bucket order extends score order), and only
    // the ~1024-per-unit-range bucket TOTALS ride the ordered window.
    // Exactness is untouched: ranks are over the raw double scores.
    val wB = Window.orderBy(col("b"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val bucketBelow = hist.groupBy(col("b")).agg(sum(col("n")).as("bn"))
      .withColumn("bbelow", coalesce(sum(col("bn")).over(wB), lit(0L)))
      .select(col("b"), col("bbelow"))
    val wIn = Window.partitionBy(col("b")).orderBy(col("s"))
      .rowsBetween(Window.unboundedPreceding, -1)
    hist.join(broadcast(bucketBelow), Seq("b"))
      .withColumn("below",
        col("bbelow") + coalesce(sum(col("n")).over(wIn), lit(0L)))
      .withColumn("r2p",
        (lit(2L) * col("below") + col("n") + 1L).cast("decimal(38,0)") *
          col("p").cast("decimal(38,0)"))
      .agg(sum(col("p")).as("n_pos"),
        (sum(col("n")) - sum(col("p"))).as("n_neg"),
        sum(col("r2p")).as("__sr2"))
      .select(col("n_pos"), col("n_neg"),
        when(col("n_pos") > 0 && col("n_neg") > 0,
          graft.functions.ldiv(
            (col("__sr2") - col("n_pos").cast("decimal(38,0)") *
              (col("n_pos") + 1L).cast("decimal(38,0)")) * lit(1000000L),
            col("n_pos").cast("decimal(38,0)") *
              col("n_neg").cast("decimal(38,0)") * lit(2L)))
          .as("auc_ppm"))
      .withColumn("auc", col("auc_ppm").cast("double") / lit(1000000.0))
  }

  /**
   * Corpus-weighted adjacent character-pair counts — the statistic a
   * BPE tokenizer trainer's FIRST merge decision reads (Sennrich et
   * al. 2016, arXiv:1508.07909), exposed as a top-k table for vocab
   * analysis and as the oracle-checkable step of [[bpeTrain]]'s loop.
   * One explode pass (each word contributes its `len−1` overlapping
   * 2-char substrings), a map-side-combined count, and a
   * TakeOrderedAndProject top-k — no corpus-sized shuffle beyond the
   * pair histogram.
   */
  def bpePairCounts(df: DataFrame, text: Column, k: Int): DataFrame = {
    require(k >= 1, "k must be >= 1")
    df.select(explode(TextOps.tokens(text)).as("w"))
      .filter(length(col("w")) >= 2)
      .select(explode(transform(sequence(lit(1), length(col("w")) - 1),
        i => col("w").substr(i, lit(2)))).as("pair"))
      .groupBy("pair").agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc, col("pair")).limit(k)
  }

  /**
   * BPE merge-rule training (Sennrich et al. 2016): learn `merges`
   * byte-pair merge rules from the corpus. The construction real BPE
   * trainers use: ONE corpus pass builds the word-TYPE histogram
   * (map-side combined, bounded by vocabulary size, guarded by
   * `maxWordTypes`), and every merge round then runs on that
   * driver-held table — pair counting and rule application never
   * touch the corpus again, so training cost is
   * O(word types · word length · merges), independent of corpus rows.
   * Deterministic: the argmax breaks count ties by (left, right)
   * lexicographic order, and merges apply left-to-right
   * non-overlapping. Returns (merge_rank, left, right, pair_count) —
   * the tokenizer artifact, persistable like [[unigramModel]]'s
   * tables.
   */
  def bpeTrain(df: DataFrame, text: Column, merges: Int,
      maxWordTypes: Int = 1000000, pretok: Boolean = false): DataFrame =
    bpeTrainFromHist(wordTypeHistogram(df, text, pretok), merges,
      maxWordTypes)

  /**
   * The word-TYPE histogram `(w, n)` every tokenizer trainer reads —
   * exposed as its own PERSISTABLE artifact: per-part histograms
   * merge exactly ([[wordHistMerge]] — counts are plain sums), so a
   * standing corpus can keep the histogram current per ingest batch
   * ([[graft.streaming.SeriesStream.wordHistStream]]) and retrain
   * ANY of the three tokenizers at any time WITHOUT a corpus scan —
   * at 100 TB the difference between a retrain that reads an
   * artifact and one that re-tokenizes the fleet's worth of text.
   */
  def wordTypeHistogram(df: DataFrame, text: Column,
      pretok: Boolean = false): DataFrame =
    df.select(explode(
        if (pretok) TextOps.pretokens(text) else TextOps.tokens(text)).as("w"))
      .filter(col("w").isNotNull && length(col("w")) > 0)
      .groupBy("w").agg(count(lit(1)).as("n"))

  /** Merge [[wordTypeHistogram]] parts: per-word count sums —
   * associative, commutative, exact (the KMV/CMS/covariance merge
   * discipline for the tokenizer family). */
  def wordHistMerge(parts: DataFrame): DataFrame =
    parts.groupBy(col("w")).agg(sum(col("n")).as("n"))

  /** TAKEDOWN propagation for the word-type histogram — count
   * histograms are plain sums, so the delete is exactly invertible
   * ([[countMinDelete]]'s turnstile contract): subtract the deleted
   * docs' own histogram; words whose count reaches zero drop (the
   * from-scratch shape); a count driven NEGATIVE (deleting rows the
   * histogram never ingested) fails loudly instead of persisting a
   * corrupt artifact — but that detection is BEST-EFFORT: a
   * non-subset delete whose counts stay non-negative passes
   * silently, so subset-correctness remains the caller's contract,
   * not something a clean run proves. Post-delete ≡
   * [[wordTypeHistogram]] over
   * corpus ∖ deleted, bit-for-bit (spec-pinned) — so a standing
   * corpus can retrain any tokenizer after a takedown with zero
   * corpus scans, the [[wordTypeHistogram]] promise preserved
   * through deletion. */
  def wordHistDelete(hist: DataFrame, deleted: DataFrame, text: Column,
      pretok: Boolean = false): DataFrame =
    wordHistMerge(hist.unionByName(
        wordTypeHistogram(deleted, text, pretok)
          .withColumn("n", -col("n"))))
      .where(assert_true(col("n") >= 0L,
        concat(lit("wordHistDelete: count for word '"), col("w"),
          lit("' went negative — the deleted rows were not a subset " +
            "of what this histogram ingested"))).isNull)
      .filter(col("n") =!= 0L)

  /** [[bpeTrain]] off a prebuilt [[wordTypeHistogram]] — identical
   * merges, none of the corpus scan. */
  def bpeTrainFromHist(hist: DataFrame, merges: Int,
      maxWordTypes: Int = 1000000): DataFrame = {
    require(merges >= 1, "merges must be >= 1")
    val spark = hist.sparkSession
    val rows = hist.filter(length(col("w")) >= 2)
      .select(col("w").cast("string"), col("n").cast("long"))
      .limit(maxWordTypes + 1).collect()
    require(rows.length <= maxWordTypes,
      s"bpeTrain: more than $maxWordTypes word types — raise the bound " +
        "deliberately or pre-normalize the corpus")
    // split on CODE POINTS, not UTF-16 units — [[bpePairCounts]] uses
    // Spark substr (code-point based); a char-wise split would turn
    // astral-plane characters (emoji, CJK ext) into lone surrogates
    // and the two operators would disagree on such corpora
    var words: Array[(Array[String], Long)] =
      rows.map(r => (r.getString(0).codePoints().toArray
        .map(cp => new String(Character.toChars(cp))), r.getLong(1)))
    val out = Vector.newBuilder[(Int, String, String, Long)]
    var rank = 0
    var exhausted = false
    while (rank < merges && !exhausted) {
      val counts = scala.collection.mutable.HashMap.empty[(String, String), Long]
      words.foreach { case (syms, n) =>
        var i = 0
        while (i < syms.length - 1) {
          val p = (syms(i), syms(i + 1))
          counts(p) = counts.getOrElse(p, 0L) + n
          i += 1
        }
      }
      if (counts.isEmpty) exhausted = true
      else {
        val ((l, r), c) = counts.minBy { case ((a, b), n) => (-n, a, b) }(
          Ordering.Tuple3(Ordering.Long, utf8Ord, utf8Ord))
        out += ((rank, l, r, c))
        words = words.map { case (syms, n) =>
          val b = Array.newBuilder[String]
          var i = 0
          while (i < syms.length) {
            if (i < syms.length - 1 && syms(i) == l && syms(i + 1) == r) {
              b += (l + r); i += 2 // left-to-right, non-overlapping
            } else { b += syms(i); i += 1 }
          }
          (b.result(), n)
        }
        rank += 1
      }
    }
    import spark.implicits._
    out.result().toDF("merge_rank", "left", "right", "pair_count")
  }

  /**
   * WordPiece tokenizer training (Schuster & Nakajima 2012, "Japanese
   * and Korean Voice Search", ICASSP; the BERT tokenizer's trainer) —
   * the likelihood-gain counterpart of [[bpeTrain]]: same word-type
   * histogram, same driver loop, but each round merges the pair
   * maximizing `count(lr) / (count(l)·count(r))` — the unigram-LM
   * likelihood gain — instead of the raw pair count. Scores compare
   * as EXACT integers: the argmax key is
   * `⌊count·10¹⁸ / (count_l·count_r)⌋` (BigInt floor — a 10⁻¹⁸
   * score quantization both engines reproduce, which is what lets
   * the gate's oracle UNROLL the training iterations as SQL CTEs,
   * the logreg-gate discipline); ties break on (left, right)
   * ascending. Inference for the trained vocab is greedy
   * longest-match ([[graft.functions.GreedyEncodeExpr]], via
   * [[wordpieceVocab]]). Completes the classic subword trio's
   * TRAINING side: BPE (count), WordPiece (likelihood gain), unigram
   * LM (EM pruning). Emits `(merge_rank, left, right, pair_count)`,
   * [[bpeTrain]]'s schema.
   */
  def wordpieceTrain(df: DataFrame, text: Column, merges: Int,
      maxWordTypes: Int = 1000000, pretok: Boolean = false): DataFrame =
    wordpieceTrainFromHist(wordTypeHistogram(df, text, pretok), merges,
      maxWordTypes)

  /** [[wordpieceTrain]] off a prebuilt [[wordTypeHistogram]] —
   * identical merges, none of the corpus scan (the standing-artifact
   * retrain path). */
  def wordpieceTrainFromHist(hist: DataFrame, merges: Int,
      maxWordTypes: Int = 1000000): DataFrame = {
    require(merges >= 1, "merges must be >= 1")
    val spark = hist.sparkSession
    val rows = hist.filter(length(col("w")) >= 2)
      .select(col("w").cast("string"), col("n").cast("long"))
      .limit(maxWordTypes + 1).collect()
    require(rows.length <= maxWordTypes,
      s"wordpieceTrain: more than $maxWordTypes word types — raise the " +
        "bound deliberately or pre-normalize the corpus")
    var words: Array[(Array[String], Long)] =
      rows.map(r => (r.getString(0).codePoints().toArray
        .map(cp => new String(Character.toChars(cp))), r.getLong(1)))
    val e18 = BigInt(10).pow(18)
    val out = Vector.newBuilder[(Int, String, String, Long)]
    var rank = 0
    var exhausted = false
    while (rank < merges && !exhausted) {
      val syms = scala.collection.mutable.HashMap.empty[String, Long]
      val pairs = scala.collection.mutable.HashMap.empty[(String, String), Long]
      words.foreach { case (ss, n) =>
        var i = 0
        while (i < ss.length) {
          syms(ss(i)) = syms.getOrElse(ss(i), 0L) + n
          if (i < ss.length - 1) {
            val p = (ss(i), ss(i + 1))
            pairs(p) = pairs.getOrElse(p, 0L) + n
          }
          i += 1
        }
      }
      if (pairs.isEmpty) exhausted = true
      else {
        val ((l, r), c) = pairs.minBy { case ((a, b), n) =>
          // likelihood-gain argmax: key DESC, then (a, b) ASC —
          // negate the exact integer key for minBy
          (-(BigInt(n) * e18 / (BigInt(syms(a)) * BigInt(syms(b)))),
            a, b)
        }(Ordering.Tuple3(Ordering.BigInt, utf8Ord, utf8Ord))
        out += ((rank, l, r, c))
        words = words.map { case (ss, n) =>
          val b = Array.newBuilder[String]
          var i = 0
          while (i < ss.length) {
            if (i < ss.length - 1 && ss(i) == l && ss(i + 1) == r) {
              b += (l + r); i += 2 // left-to-right, non-overlapping
            } else { b += ss(i); i += 1 }
          }
          (b.result(), n)
        }
        rank += 1
      }
    }
    import spark.implicits._
    out.result().toDF("merge_rank", "left", "right", "pair_count")
  }

  /**
   * The greedy-inference vocab off a [[wordpieceTrain]] (or
   * [[bpeTrain]]) merge table: the distinct merge OUTPUTS with their
   * counts, rank-stable — what [[graft.functions.GreedyEncodeExpr]]
   * consumes (scores are membership-only there). Single code points
   * need no entries: greedy passes unknown singles through, so the
   * outputs ARE the vocabulary that changes segmentation.
   */
  def wordpieceVocab(merges: DataFrame): Array[(String, Long)] =
    merges.select(concat(col("left"), col("right")).as("p"),
        col("pair_count").cast("long").as("n"))
      .collect().map(r => (r.getString(0), r.getLong(1)))
      .distinct

  /**
   * CONTINUATION-MARKED WordPiece training — the BERT `##` namespace
   * [[wordpieceTrain]] flattens: a word splits to its first code
   * point PLAIN and every later code point `##`-prefixed, so
   * word-initial and word-internal occurrences of the same character
   * count (and merge) SEPARATELY — `c("t")` is "t starting a word",
   * `c("##t")` is "t inside one", which changes both the
   * likelihood-gain scores and the trained segmentation (Schuster &
   * Nakajima's actual construction; [[wordpieceTrain]] remains as
   * the single-namespace variant). Merging keeps the LEFT symbol's
   * marker and strips the right's (`"hu" + "##g" → "hug"`,
   * `"##u" + "##g" → "##ug"`), so trained pieces land in the correct
   * positional namespace. Inference is
   * [[graft.functions.GreedyEncodeMarkedExpr]] (longest-match with
   * the positional `##` probe). Emits [[bpeTrain]]'s schema with the
   * markers visible in `left`/`right`.
   */
  def wordpieceTrainMarked(df: DataFrame, text: Column, merges: Int,
      maxWordTypes: Int = 1000000, pretok: Boolean = false): DataFrame =
    wordpieceTrainMarkedFromHist(wordTypeHistogram(df, text, pretok), merges,
      maxWordTypes)

  /** [[wordpieceTrainMarked]] off a prebuilt [[wordTypeHistogram]] —
   * identical merges, none of the corpus scan. */
  def wordpieceTrainMarkedFromHist(hist: DataFrame, merges: Int,
      maxWordTypes: Int = 1000000): DataFrame = {
    require(merges >= 1, "merges must be >= 1")
    val spark = hist.sparkSession
    val rows = hist.filter(length(col("w")) >= 2)
      .select(col("w").cast("string"), col("n").cast("long"))
      .limit(maxWordTypes + 1).collect()
    require(rows.length <= maxWordTypes,
      s"wordpieceTrainMarked: more than $maxWordTypes word types — raise " +
        "the bound deliberately or pre-normalize the corpus")
    def strip(s: String): String =
      if (s.startsWith("##")) s.substring(2) else s
    var words: Array[(Array[String], Long)] =
      rows.map { r =>
        val cps = r.getString(0).codePoints().toArray
          .map(cp => new String(Character.toChars(cp)))
        (cps.zipWithIndex.map { case (c, i) =>
          if (i == 0) c else "##" + c }, r.getLong(1))
      }
    val e18 = BigInt(10).pow(18)
    val out = Vector.newBuilder[(Int, String, String, Long)]
    var rank = 0
    var exhausted = false
    while (rank < merges && !exhausted) {
      val syms = scala.collection.mutable.HashMap.empty[String, Long]
      val pairs = scala.collection.mutable.HashMap.empty[(String, String), Long]
      words.foreach { case (ss, n) =>
        var i = 0
        while (i < ss.length) {
          syms(ss(i)) = syms.getOrElse(ss(i), 0L) + n
          if (i < ss.length - 1) {
            val p = (ss(i), ss(i + 1))
            pairs(p) = pairs.getOrElse(p, 0L) + n
          }
          i += 1
        }
      }
      if (pairs.isEmpty) exhausted = true
      else {
        val ((l, r), c) = pairs.minBy { case ((a, b), n) =>
          (-(BigInt(n) * e18 / (BigInt(syms(a)) * BigInt(syms(b)))),
            a, b)
        }(Ordering.Tuple3(Ordering.BigInt, utf8Ord, utf8Ord))
        out += ((rank, l, r, c))
        val merged = l + strip(r)
        words = words.map { case (ss, n) =>
          val b = Array.newBuilder[String]
          var i = 0
          while (i < ss.length) {
            if (i < ss.length - 1 && ss(i) == l && ss(i + 1) == r) {
              b += merged; i += 2 // left-to-right, non-overlapping
            } else { b += ss(i); i += 1 }
          }
          (b.result(), n)
        }
        rank += 1
      }
    }
    import spark.implicits._
    out.result().toDF("merge_rank", "left", "right", "pair_count")
  }

  /** [[wordpieceVocab]] for the MARKED trainer: merge outputs keep
   * the left operand's marker and strip the right's — the positional
   * vocabulary [[graft.functions.GreedyEncodeMarkedExpr]] probes. */
  def wordpieceVocabMarked(merges: DataFrame): Array[(String, Long)] =
    merges.select(concat(col("left"),
          when(col("right").startsWith("##"),
            col("right").substr(lit(3), length(col("right"))))
            .otherwise(col("right"))).as("p"),
        col("pair_count").cast("long").as("n"))
      .collect().map(r => (r.getString(0), r.getLong(1)))
      .distinct

  /** [[bpeTrain]]'s merge table collected rank-ascending and shipped
   * as a broadcast handle — the bounded tokenizer artifact every
   * encode-side operator probes (the codebook/unigram-table shape). */
  private def mergeRules(merges: DataFrame):
      org.apache.spark.broadcast.Broadcast[Array[Array[String]]] = {
    val rules = merges
      .select(col("merge_rank").cast("int").as("r"),
        col("left").cast("string").as("l"),
        col("right").cast("string").as("r2"))
      .collect().sortBy(_.getInt(0))
      .map(row => Array(row.getString(1), row.getString(2)))
    merges.sparkSession.sparkContext.broadcast(rules)
  }

  /** Per-document tokens under a trained BPE merge table: the encode
   * half of the tokenizer loop ([[bpeTrain]] is the train half).
   * Whitespace words each encode independently ([[TextOps.tokens]] is
   * the pre-tokenizer, as in the paper), rules apply in merge-rank
   * order, and the resulting subword streams concatenate in word
   * order. `n_bpe_tokens` is the TRUE token count — feed it to
   * `Sampling.tokenBudget` / `Packing.packSequences` as the weight so
   * budget and packing decisions use the tokenizer training uses.
   *
   * Scale shape: the merge table is a broadcast artifact; encoding is
   * a per-row codegen'd projection with per-task word-TYPE
   * memoization ([[graft.functions.BpeEncodeExpr]]) — the corpus pays
   * one scan, no join, no shuffle.
   */
  def bpeEncode(df: DataFrame, id: Column, text: Column,
      merges: DataFrame, pretok: Boolean = false): DataFrame = {
    val bc = mergeRules(merges)
    // one codegen'd whole-text call per row — the flatten(transform(..))
    // HOF form evaluates its lambda interpreted per WORD and read 17 s
    // at the 100x probe vs ~2 s for this shape, identical output
    df.select(id.as("id"),
        graft.functions.BpeEncodeExpr.bpeText(text, bc, pretok)
          .as("bpe_tokens"))
      .select(col("id"), col("bpe_tokens"),
        size(col("bpe_tokens")).cast("long").as("n_bpe_tokens"))
  }

  /**
   * [[bpeEncode]] with integer token IDS — what a packing/training
   * export actually ships. The vocabulary is corpus-deterministic:
   * every distinct emitted token (≤ distinct corpus code points +
   * |merges|, bounded by construction) gets its lexicographic rank.
   * The vocab table returns alongside the encoded frame so the
   * id↔token mapping is persistable next to the merge table; ids
   * resolve through one broadcast hash probe per token
   * ([[graft.functions.LongMapLookupExpr]]), never a corpus-side
   * join. Two corpus passes total (one to discover the emitted vocab,
   * one to emit ids); `maxVocab` guards the driver-held table.
   */
  def bpeEncodeIds(df: DataFrame, id: Column, text: Column,
      merges: DataFrame, maxVocab: Int = 1 << 20,
      pretok: Boolean = false): (DataFrame, DataFrame) = {
    val spark = df.sparkSession
    val enc = bpeEncode(df, id, text, merges, pretok)
    val vocabRows = enc.select(explode(col("bpe_tokens")).as("token"))
      .distinct().orderBy(col("token")).limit(maxVocab + 1).collect()
    require(vocabRows.length <= maxVocab,
      s"bpeEncodeIds: more than $maxVocab distinct tokens — raise the " +
        "bound deliberately or train more merges")
    val table = new java.util.HashMap[String, java.lang.Long]()
    vocabRows.zipWithIndex.foreach { case (r, i) =>
      table.put(r.getString(0), i.toLong)
    }
    val bc = spark.sparkContext.broadcast(table)
    val ids = enc.select(col("id"),
      transform(col("bpe_tokens"),
        t => graft.functions.LongMapLookupExpr.lookup(t, bc, -1L))
        .as("token_ids"),
      col("n_bpe_tokens"))
    import spark.implicits._
    val vocab = vocabRows.zipWithIndex
      .map { case (r, i) => (i.toLong, r.getString(0)) }.toSeq
      .toDF("token_id", "token")
    (ids, vocab)
  }

  /**
   * The tokenizer ALPHABET artifact for byte-fallback encoding: the
   * corpus's distinct non-space code points, sorted — the bounded
   * "characters this tokenizer knows" table persisted next to the
   * merge table (Unicode is ≤ ~150k assigned cps; real corpora are
   * far under `maxAlphabet`). One distinct-aggregate scan.
   */
  def bpeAlphabet(df: DataFrame, text: Column,
      maxAlphabet: Int = 65536): Array[String] = {
    val rows = df.select(explode(split(text, "")).as("c"))
      .filter(col("c") =!= "" && col("c") =!= " ")
      .distinct().orderBy(col("c")).limit(maxAlphabet + 1).collect()
    require(rows.length <= maxAlphabet,
      s"bpeAlphabet: more than $maxAlphabet distinct code points — raise " +
        "the bound deliberately or pre-normalize the corpus")
    rows.map(_.getString(0))
  }

  /**
   * [[bpeEncode]] with BYTE FALLBACK — the GPT-2/SentencePiece norm
   * for 100-TB multilingual crawl data: code points outside
   * `alphabet` decompose into their UTF-8 `<0xXX>` pieces before the
   * merge pass ([[graft.functions.BpeEncodeExpr.byteFallback]]), so
   * ANY UTF-8 input — unseen scripts, astral-plane emoji — encodes
   * with zero unknown-piece loss instead of diverging from what
   * production tokenizers do. The alphabet is a bounded broadcast
   * extension (build it with [[bpeAlphabet]] from the TRAINING
   * corpus); same one-scan, no-join, word-type-memoized shape as
   * [[bpeEncode]].
   */
  def bpeEncodeBytes(df: DataFrame, id: Column, text: Column,
      merges: DataFrame, alphabet: Seq[String]): DataFrame = {
    val bc = mergeRules(merges)
    val alpha = df.sparkSession.sparkContext.broadcast(
      alphabet.flatMap(_.codePoints().toArray).distinct.sorted.toArray)
    df.select(id.as("id"),
        graft.functions.BpeEncodeExpr.bpeTextBytes(text, bc, alpha)
          .as("bpe_tokens"))
      .select(col("id"), col("bpe_tokens"),
        size(col("bpe_tokens")).cast("long").as("n_bpe_tokens"))
  }

  /**
   * [[bpeEncodeIds]] under byte fallback, with a CLOSED vocabulary:
   * `alphabet chars ∪ merge outputs ∪ all 256 byte pieces` — fully
   * determined by the tokenizer artifacts, independent of any corpus.
   * Closure argument: every initial symbol is an alphabet char or a
   * byte piece, and the merge pass only ever creates rule outputs —
   * so NO emitted token can miss the table, for this corpus or any
   * future one (the -1 sentinel is unreachable; spec-pinned). This
   * also drops [[bpeEncodeIds]]'s vocab-discovery pass: ONE corpus
   * scan total.
   */
  def bpeEncodeIdsBytes(df: DataFrame, id: Column, text: Column,
      merges: DataFrame, alphabet: Seq[String]): (DataFrame, DataFrame) = {
    val spark = df.sparkSession
    val mergeOut = merges
      .select(concat(col("left"), col("right")).as("t"))
      .collect().map(_.getString(0))
    val alphaSyms = alphabet.flatMap(_.codePoints().toArray
      .map(cp => new String(Character.toChars(cp))))
    val bytes = (0 until 256).map(graft.functions.BpeEncodeExpr.bytePiece)
    val vocabTokens = (alphaSyms ++ mergeOut ++ bytes).distinct.sorted
    val table = new java.util.HashMap[String, java.lang.Long]()
    vocabTokens.zipWithIndex.foreach { case (t, i) =>
      table.put(t, i.toLong)
    }
    val bcT = spark.sparkContext.broadcast(table)
    val ids = bpeEncodeBytes(df, id, text, merges, alphabet)
      .select(col("id"),
        transform(col("bpe_tokens"),
          t => graft.functions.LongMapLookupExpr.lookup(t, bcT, -1L))
          .as("token_ids"),
        col("n_bpe_tokens"))
    import spark.implicits._
    val vocab = vocabTokens.zipWithIndex
      .map { case (t, i) => (i.toLong, t) }.toSeq
      .toDF("token_id", "token")
    (ids, vocab)
  }

  /**
   * Tokenizer usage statistics — the data-card table a trained
   * tokenizer ships with: each emitted token's corpus count, document
   * frequency, and corpus share (ppm, truncating integral divide),
   * top `k` by count. Reads the [[bpeEncode]] stream once
   * (map-side-combined counts over the bounded emitted vocabulary);
   * the "how much of the corpus do the top tokens cover / which
   * merges earn their slot" readout that decides whether to retrain
   * with more or fewer merges.
   */
  def bpeVocabStats(df: DataFrame, id: Column, text: Column,
      merges: DataFrame, k: Int): DataFrame = {
    require(k >= 1, "k must be >= 1")
    val bc = mergeRules(merges)
    // ONE encode pass for BOTH aggregates (the old shape paid a
    // second full corpus encode just for document frequency): sort
    // each doc's token array, flag first occurrences (s[i] ≠ s[i−1] —
    // doc-local, no shuffle), explode once; then count(*) is the
    // corpus count and sum(first) the document frequency, combined
    // map-side to a vocab-bounded exchange. NOT the word-type-
    // histogram derivation: exact too, but its groupBy(word) exchange
    // is TYPE-scale, which adversarial/synthetic corpora (unique-
    // token noise) push to row-scale — this shape's exchange is
    // vocab-bounded for any corpus.
    // the doc-local (token, cnt) combine happens INSIDE the codegen'd
    // expression ([[graft.functions.BpeEncodeExpr.encodeTextCard]]):
    // the explode then carries per-doc-DISTINCT rows, not every token
    // occurrence, and corpus count + doc frequency fall out of one
    // aggregate (sum(cnt) / count(*)). The transform((x, i) => …) HOF
    // form of the same derivation evaluates interpreted per element
    // and measured 2× the whole query at the 100× probe.
    val st = df
      .select(explode(graft.functions.BpeEncodeExpr.bpeTextCard(text, bc))
        .as("t"))
      .select(col("t.token").as("token"), col("t.cnt").as("cnt"))
      .groupBy(col("token"))
      .agg(sum(col("cnt")).as("n"), count(lit(1)).as("n_docs"))
      .localCheckpoint() // total + the emit below: don't re-encode
    val total = st.agg(coalesce(sum(col("n")), lit(0L)))
      .head().getLong(0)
    st.withColumn("share_ppm",
        graft.functions.ldiv(col("n") * lit(1000000L),
          lit(math.max(1L, total))))
      .select(col("token"), col("n"), col("n_docs"), col("share_ppm"))
      .orderBy(col("n").desc, col("token")).limit(k)
  }

  /** [[fertility]] with the TRUE tokenizer: `bpe_tokens` counts come
   * from [[bpeEncode]]'s merge-table application instead of the
   * BPE-ish regex approximation — the number a multilingual-tokenizer
   * fertility analysis actually reports. Same output schema. */
  def fertilityBpe(df: DataFrame, group: Column, text: Column,
      merges: DataFrame, pretok: Boolean = false): DataFrame = {
    val bc = mergeRules(merges)
    // `ws_tokens` stays the whitespace count in BOTH modes — the
    // comparability denominator fertility is defined over
    val nTrue = size(
        graft.functions.BpeEncodeExpr.bpeText(text, bc, pretok))
      .cast("long")
    df.groupBy(group.as("source"))
      .agg(count(lit(1)).as("n_docs"),
        sum(size(TextOps.tokens(text)).cast("long")).as("ws_tokens"),
        sum(nTrue).as("bpe_tokens"),
        sum(length(text).cast("long")).as("n_chars"))
      .withColumn("fertility",
        col("bpe_tokens").cast("double") / col("ws_tokens").cast("double"))
      .withColumn("chars_per_token",
        when(col("bpe_tokens") > 0,
          col("n_chars").cast("double") / col("bpe_tokens").cast("double")))
  }

  // ---- mergeable fixed-grid quantile sketch ---------------------------
  // The sketch tier [[quantiles]]/[[percentileRank]] lack for
  // CONTINUOUS columns: their exact histograms are distinct-VALUE-
  // bounded, which for micro-quantized scores or norms is row-scale at
  // 100 TB. This sketch is k-bounded BY CONSTRUCTION — per group, a
  // power-of-two-width grid over the micro domain, width chosen as the
  // smallest 2^j with ≤ k cells over the group's value range — and
  // mergeable like [[distinctKmv]]: grids at multiples of 2^j NEST, so
  // re-gridding a finer sketch into a coarser one is exact cell
  // arithmetic. Merging is a HOMOMORPHISM: because a part's range is
  // contained in the union's, part widths never exceed the union's
  // width, so merge(sketch(A), sketch(B)) == sketch(A ∪ B) exactly —
  // per-partition sketches roll up to the same artifact one global
  // build produces (the property the spec pins, with associativity).
  // Exactness below the bound: a group whose micro RANGE fits in k
  // cells keeps width 1 — the sketch IS the exact micro histogram.
  // Estimates are cell STARTS clamped to [sk_min, sk_max]: integer,
  // engine-portable, within one cell width (≤ 2·range/k micro) of the
  // true order statistic.

  /** Smallest power-of-two cell width with ≤ `k` grid cells over a
   * micro-value span of `range` slots: ceil(range/k) rounded up to a
   * power of two (`bin()`-length trick — integer-exact, and the
   * oracle reproduces it verbatim). */
  private def gridW(range: Column, k: Int): Column = {
    import org.apache.spark.sql.graftbridge.Bridge
    val raw = graft.functions.ldiv(range + lit((k - 1).toLong), lit(k.toLong))
    val shifted = Bridge.column(
      org.apache.spark.sql.catalyst.expressions.ShiftLeft(
        Bridge.expression(lit(1L)),
        Bridge.expression(length(bin(raw - lit(1L))).cast("int"))))
    when(raw <= 1L, lit(1L)).otherwise(shifted)
  }

  /**
   * Unigram-LM tokenizer training (Kudo 2018, arXiv:1804.10959 — the
   * SentencePiece algorithm, completing the subword family next to
   * [[bpeTrain]]): seed a large candidate vocabulary from the
   * corpus's substrings, then EM — E-step Viterbi-segments every word
   * type under the current piece scores, M-step recounts pieces from
   * the segmentations — and prune to `vocabSize` keeping every
   * single code point (coverage). Scores are micro nats
   * (`round(−ln(count/total)·10⁶)`, the [[unigramModel]] convention).
   *
   * Scale shape is [[bpeTrain]]'s: the corpus pays ONE tokenize scan
   * for the word-TYPE histogram; the EM loop runs driver-side over
   * the top-`topTypes` histogram rows (a bounded artifact — Zipf
   * coverage makes the tail immaterial to piece counts), reusing the
   * EXACT segmentation kernel the serving expression runs
   * ([[graft.functions.UnigramEncodeExpr.Memo]]), so training and
   * encoding can never disagree. Emits `(piece, n, nll_micro)`.
   */
  def unigramTrain(df: DataFrame, text: Column, vocabSize: Int,
      iters: Int = 2, maxPieceLen: Int = 6, topTypes: Int = 50000,
      minCount: Long = 2L, unkNllMicro: Long = 20000000L,
      pretok: Boolean = false): DataFrame =
    unigramTrainFromHist(wordTypeHistogram(df, text, pretok), vocabSize,
      iters, maxPieceLen, topTypes, minCount, unkNllMicro)

  /** [[unigramTrain]] off a prebuilt [[wordTypeHistogram]] —
   * identical EM, none of the corpus scan (the standing-artifact
   * retrain path; all three trainers now read the same artifact). */
  def unigramTrainFromHist(hist: DataFrame, vocabSize: Int,
      iters: Int = 2, maxPieceLen: Int = 6, topTypes: Int = 50000,
      minCount: Long = 2L, unkNllMicro: Long = 20000000L): DataFrame = {
    require(vocabSize >= 1 && iters >= 1 && maxPieceLen >= 1 &&
      topTypes >= 1, "vocabSize, iters, maxPieceLen, topTypes must be >= 1")
    val spark = hist.sparkSession
    val types: Array[(String, Long)] = hist
      .select(col("w").cast("string"), col("n").cast("long").as("c"))
      .orderBy(col("c").desc, col("w"))
      .limit(topTypes)
      .collect().map(r => (r.getString(0), r.getLong(1)))
    require(types.nonEmpty, "no word types (empty corpus)")
    def cps(s: String): Array[String] =
      s.codePoints().toArray.map(cp => new String(Character.toChars(cp)))
    // seed: substring counts weighted by type frequency
    val seedCounts = scala.collection.mutable.HashMap[String, Long]()
    val singles = scala.collection.mutable.HashMap[String, Long]()
    types.foreach { case (w, c) =>
      val units = cps(w)
      units.foreach(u =>
        singles.update(u, singles.getOrElse(u, 0L) + c))
      for (a <- units.indices; b <- (a + 1) to
          math.min(units.length, a + maxPieceLen)) {
        val p = units.slice(a, b).mkString
        seedCounts.update(p, seedCounts.getOrElse(p, 0L) + c)
      }
    }
    val seedCap = math.max(vocabSize * 8, singles.size + vocabSize)
    var vocab: Map[String, Long] = { // piece -> count
      val multi = seedCounts.iterator
        .filter { case (p, c) => p.length > 1 || !singles.contains(p) }
        .filter(_._2 >= minCount)
        .toArray.sortBy { case (p, c) => (-c, p) }
        .take(seedCap - singles.size)
      (singles.iterator ++ multi.iterator).toMap
    }
    def scoresOf(counts: Map[String, Long]): Array[(String, Long)] = {
      val total = math.max(counts.values.sum, 1L)
      counts.iterator.map { case (p, c) =>
        p -> math.round(-math.log(
          math.max(c, 1L).toDouble / total.toDouble) * 1e6)
      }.toArray.sortBy(_._1)
    }
    for (_ <- 1 to iters) {
      val memo = new graft.functions.UnigramEncodeExpr.Memo(
        scoresOf(vocab), maxPieceLen, unkNllMicro)
      val next = scala.collection.mutable.HashMap[String, Long]()
      types.foreach { case (w, c) =>
        memo.segment(w).foreach(p =>
          next.update(p, next.getOrElse(p, 0L) + c))
      }
      // coverage floor: single code points survive at count >= 1
      singles.keysIterator.foreach(u =>
        if (!next.contains(u)) next.update(u, 1L))
      vocab = next.toMap
    }
    // prune to vocabSize: singles are mandatory, the rest by count
    val mandatory = vocab.iterator.filter(kv => singles.contains(kv._1))
      .toArray
    val rest = vocab.iterator.filterNot(kv => singles.contains(kv._1))
      .toArray.sortBy { case (p, c) => (-c, p) }
      .take(math.max(vocabSize - mandatory.length, 0))
    val kept = (mandatory ++ rest).toMap
    val total = math.max(kept.values.sum, 1L)
    import spark.implicits._
    kept.iterator.map { case (p, c) =>
      (p, c, math.round(-math.log(c.toDouble / total.toDouble) * 1e6))
    }.toArray.sortBy { case (p, c, _) => (-c, p) }
      .toSeq.toDF("piece", "n", "nll_micro")
  }

  /**
   * Viterbi-tokenize the corpus under a unigram vocab frame
   * (`(piece, nll_micro)` — [[unigramTrain]]'s output or a fixed
   * table): one codegen'd whole-text call per row against the
   * broadcast model, emitting `(id, pieces, n_pieces)`. The
   * [[bpeEncode]] counterpart for the unigram tokenizer.
   */
  def unigramEncode(df: DataFrame, id: Column, text: Column,
      vocab: DataFrame, maxPieceLen: Int = 6,
      unkNllMicro: Long = 20000000L): DataFrame = {
    val spark = df.sparkSession
    val v: Array[(String, Long)] = vocab
      .select(col("piece").cast("string"), col("nll_micro").cast("long"))
      .collect().map(r => (r.getString(0), r.getLong(1)))
    val bc = spark.sparkContext.broadcast(v)
    val enc = graft.functions.UnigramEncodeExpr.unigramText(
      text, bc, maxPieceLen, unkNllMicro)
    df.filter(text.isNotNull)
      .select(id.as("id"), enc.as("pieces"))
      .withColumn("n_pieces", size(col("pieces")).cast("long"))
  }

  /** Floor division of a micro value by a positive width (pmod keeps
   * it exact for negatives, where truncating div would round UP). */
  private def cellOf(x: Column, w: Column): Column =
    graft.functions.ldiv(x - pmod(x, w), w)

  /**
   * Build the per-group sketch: `(source, sk_w, sk_min, sk_max, cell,
   * n)`, ≤ k cells per group. Values micro-quantize (`round(v·10⁶)`,
   * the [[trimmedMean]] round); nulls and NaN drop. Two bounded
   * shuffles: a per-group (min, max) pre-pass (2 longs per group,
   * map-side combined) picks the width, then the corpus aggregates
   * straight into grid cells — the distinct-VALUE histogram is never
   * materialized, which is the whole point at row-scale cardinality.
   */
  def quantileSketch(df: DataFrame, group: Column, value: Column,
      k: Int = 4096): DataFrame = {
    require(k >= 2, "k must be >= 2")
    val v = value.cast("double")
    val rows = df.filter(v.isNotNull && !isnan(v))
      .select(group.as("source"),
        round(v * lit(1000000.0)).cast("long").as("vi"))
    val mm = rows.groupBy(col("source"))
      .agg(min(col("vi")).as("sk_min"), max(col("vi")).as("sk_max"))
      .withColumn("sk_w", gridW(col("sk_max") - col("sk_min") + 1L, k))
    rows.join(broadcast(mm), Seq("source"))
      .groupBy(col("source"), col("sk_w"), col("sk_min"), col("sk_max"),
        cellOf(col("vi"), col("sk_w")).as("cell"))
      .agg(count(lit(1)).as("n"))
  }

  /**
   * Merge sketch frames (a union of [[quantileSketch]] outputs for
   * the same k — per-partition builds, per-day builds, standing
   * artifact + fresh batch): per group the merged width is
   * `max(part widths, gridW(merged range))` and every part cell
   * re-grids exactly (widths are powers of two, grids nest). The
   * width rule is a max of maxes plus a monotone function of the
   * merged range, so the merge is ASSOCIATIVE and commutative — and
   * equal to building the sketch from the unioned raw data.
   *
   * DELETION: non-invertible — widths only coarsen (a delete that
   * shrinks a group's value range would need a FINER grid than the
   * standing sketch holds), so takedowns rebuild from corpus ∖ ids
   * ([[countMinDelete]]'s scaladoc lists the family's contracts).
   */
  def quantileSketchMerge(sketches: DataFrame, k: Int = 4096): DataFrame = {
    require(k >= 2, "k must be >= 2")
    val mm = sketches.groupBy(col("source"))
      .agg(min(col("sk_min")).as("mn"), max(col("sk_max")).as("mx"),
        max(col("sk_w")).as("wmax"))
      .withColumn("w2", greatest(col("wmax"),
        gridW(col("mx") - col("mn") + 1L, k)))
      .select(col("source"), col("mn"), col("mx"), col("w2"))
    sketches.join(broadcast(mm), Seq("source"))
      .withColumn("cell2", cellOf(col("cell") * col("sk_w"), col("w2")))
      .groupBy(col("source"), col("w2"), col("mn"), col("mx"), col("cell2"))
      .agg(sum(col("n")).as("n"))
      .select(col("source"), col("w2").as("sk_w"), col("mn").as("sk_min"),
        col("mx").as("sk_max"), col("cell2").as("cell"), col("n"))
  }

  /**
   * Per-row percentile rank off the sketch — [[percentileRank]]'s
   * scale tier for continuous columns: each row's rank estimate is
   * the exact count of rows in STRICTLY LOWER grid cells over (n−1),
   * i.e. the rank of its cell's lower boundary. Identical to the
   * exact operator when the group's width is 1; within one cell's
   * population otherwise. The join back to rows is a broadcast of the
   * ≤ k-cells-per-group cumulative table — rows never shuffle, and
   * the distinct-value histogram [[percentileRank]] would build is
   * never materialized. Rows with null/NaN values drop (the exact
   * operator's histogram join does the same).
   */
  def percentileRankSketch(df: DataFrame, group: Column, value: Column,
      k: Int = 4096): DataFrame = {
    val cum = quantileSketch(df, group, value, k)
      .withColumn("__pslo", coalesce(sum(col("n")).over(
        Window.partitionBy(col("source")).orderBy(col("cell"))
          .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .withColumn("__psn", sum(col("n")).over(
        Window.partitionBy(col("source"))))
      .select(col("source").as("__psg"), col("sk_w").as("__psw"),
        col("cell").as("__psc"), col("__pslo"), col("__psn"))
    val vi = round(value.cast("double") * lit(1000000.0)).cast("long")
    df.withColumn("__g", group).withColumn("__vi", vi)
      .join(broadcast(cum), col("__g") === col("__psg") &&
        cellOf(col("__vi"), col("__psw")) === col("__psc"))
      .withColumn("pct_rank_est",
        when(col("__psn") > 1,
          col("__pslo").cast("double") / (col("__psn") - 1).cast("double"))
          .otherwise(lit(0.0)))
      .drop("__g", "__vi", "__psg", "__psw", "__psc", "__pslo", "__psn")
  }

  /**
   * Quantile estimates off a sketch: for each (name, q) the LOWER
   * order statistic's cell — rank `⌊q·(n−1)⌋ + 1` — emitted as the
   * clamped cell start, both micro (`<name>_micro` long, integer-
   * exact) and double (`<name>`, one division). Exact when the
   * group's width is 1 (range under the bound); within one cell width
   * otherwise. The ordered window runs over ≤ k cells per group —
   * never the corpus ([[quantiles]]' argument, with the cardinality
   * now GUARANTEED by the sketch, not assumed of the column).
   */
  def quantileSketchQuantiles(sketch: DataFrame,
      qs: Seq[(String, Double)]): DataFrame = {
    require(qs.nonEmpty && qs.forall { case (_, q) => q >= 0 && q <= 1 },
      "quantiles must be in [0, 1]")
    val cum = sketch
      .withColumn("cv", greatest(least(col("cell") * col("sk_w"),
        col("sk_max")), col("sk_min")))
      .withColumn("hi", sum(col("n")).over(
        Window.partitionBy(col("source")).orderBy(col("cell"))))
      .withColumn("lo", col("hi") - col("n"))
      .withColumn("nt", sum(col("n")).over(
        Window.partitionBy(col("source"))))
    val aggs = max(col("nt")).as("n_rows") +:
      qs.zipWithIndex.map { case ((_, q), i) =>
        val kr = floor(lit(q) * (col("nt") - 1).cast("double"))
          .cast("long") + lit(1L)
        max(when(col("lo") < kr && kr <= col("hi"), col("cv")))
          .as(s"_m$i")
      }
    val outs = qs.zipWithIndex.flatMap { case ((name, _), i) =>
      Seq(col(s"_m$i").as(s"${name}_micro"),
        (col(s"_m$i").cast("double") / lit(1000000.0)).as(name))
    }
    cum.groupBy(col("source"))
      .agg(aggs.head, aggs.tail: _*)
      .select(col("source") +: col("n_rows") +: outs: _*)
  }

  /**
   * Per-partition Misra–Gries heavy-hitter summaries — the mergeable
   * frequent-items sketch (Misra & Gries 1982; merge rule per Agarwal
   * et al. 2012, "Mergeability of Summaries" §3.1) that completes the
   * sketch family next to [[kmvSketch]] (distinct), [[countMinSketch]]
   * (point counts) and [[quantileSketch]] (order stats). Each
   * partition keeps ≤ `k` counters with the classic deficit contract:
   * for every value, `c ≤ exact ≤ c + err`, and any value with
   * `exact > err` is PRESENT — err ≤ N_p/(k+1). The compression step
   * is the merge rule itself (subtract the (k+1)-th largest counter,
   * drop non-positives) run whenever the map hits 2k distincts, so
   * per-item cost is O(log k) amortized. Emits `(sid, v, c, err)` —
   * `err` constant within a summary (`sid` = partition id).
   *
   * This is the ONE family where `mapPartitions` is the right tool:
   * the summary is inherently an imperative bounded-state pass (the
   * whole point is to never materialize the vocabulary), and each
   * task emits ≤ k rows — the shuffle carries k·P rows, never the
   * corpus. Summary CONTENT depends on the partition layout (any MG
   * does); the deficit/coverage bounds hold for every layout, which
   * is what [[heavyHittersAudit]] gates.
   *
   * `sid` names one summary and is unique WITHIN this frame
   * (`"p<partition>"`); two independently built sketch frames reuse
   * the same names, so union them through [[mgMergeFrames]] (which
   * renumbers into disjoint namespaces), never by hand — colliding
   * sids make [[mgMerge]] count two summaries' errs as one and
   * silently break the deficit bound.
   *
   * DELETION: non-invertible — MG decrements destroy counts (a
   * decremented-away value is unrecoverable), so a takedown REBUILDS
   * from corpus ∖ ids ([[countMinDelete]]'s scaladoc lists the
   * family's contracts).
   */
  def mgSketch(df: DataFrame, value: Column, k: Int): DataFrame = {
    require(k >= 2, "k must be >= 2")
    val spark = df.sparkSession
    import spark.implicits._
    df.select(value.cast("string").as("v")).na.drop("any")
      .as[String]
      .mapPartitions { it =>
        val m = scala.collection.mutable.HashMap[String, Long]()
        var err = 0L
        def compress(): Unit = {
          // (k+1)-th largest counter = the merge-rule threshold
          val t = m.values.toArray.sortInPlace()(Ordering[Long].reverse)
            .apply(k)
          err += t
          m.mapValuesInPlace((_, c) => c - t)
          m.filterInPlace((_, c) => c > 0L)
        }
        it.foreach { v =>
          m.update(v, m.getOrElse(v, 0L) + 1L)
          if (m.size >= 2 * k) compress()
        }
        if (m.size > k) compress()
        val sid = "p" + org.apache.spark.TaskContext.getPartitionId()
        // an all-ties compression can empty the map: the sentinel row
        // (null v, c 0) still carries this partition's err downstream
        val rows = m.iterator.map { case (v, c) => (sid, v, c, err) }
        if (m.isEmpty && err > 0L)
          Iterator.single((sid, null.asInstanceOf[String], 0L, err))
        else rows
      }
      .toDF("sid", "v", "c", "err")
  }

  /**
   * Merge [[mgSketch]] summaries into one (sid = 0): pointwise
   * counter sums, per-summary errs added once, ONE truncation back to
   * k (subtract the (k+1)-th largest, drop non-positives, charge it
   * to err). Order-free — the sum is commutative and the single
   * truncation sees all summaries — so re-merging replayed artifacts
   * is idempotent-safe for the standing stream. Every frame in the
   * plan is summary-sized (≤ k·#summaries rows); the unpartitioned
   * rank window rides the value-sum Aggregate, never raw data.
   *
   * PRECONDITION: `sid` values must be DISJOINT across distinct
   * summaries — the per-summary errs are recovered as
   * `groupBy(sid).max(err)`, so two summaries sharing a sid collapse
   * their errs to a max instead of a sum and the deficit bound
   * `c ≤ exact ≤ c + err` silently breaks. One [[mgSketch]] frame
   * satisfies this by construction (sids `"p0".."pP"`), and so does
   * unioning it with ONE standing merged artifact (sid `"m"`, the
   * stream's shape). To combine several independently built frames —
   * including two merged artifacts, which BOTH carry sid `"m"` —
   * use [[mgMergeFrames]], which renumbers first.
   */
  def mgMerge(sketches: DataFrame, k: Int): DataFrame = {
    require(k >= 2, "k must be >= 2")
    val errSum = sketches.groupBy(col("sid"))
      .agg(max(col("err")).as("e"))
      .agg(coalesce(sum(col("e")), lit(0L)).as("err_in"))
    val summed = sketches.filter(col("v").isNotNull)
      .groupBy(col("v"))
      .agg(sum(col("c")).as("c"))
      .withColumn("rank",
        row_number().over(Window.orderBy(col("c").desc, col("v"))))
    val t = summed
      .agg(coalesce(max(when(col("rank") === k + 1, col("c"))), lit(0L))
        .as("t"))
    val body = summed.filter(col("rank") <= k)
      .crossJoin(broadcast(t)).crossJoin(broadcast(errSum))
      .filter(col("c") > col("t"))
      .select(lit("m").as("sid"), col("v"),
        (col("c") - col("t")).as("c"),
        (col("err_in") + col("t")).as("err"))
    // the same all-ties degeneracy as the partition pass: an empty
    // merged body must still carry err forward for chained merges
    val sentinel = t.crossJoin(errSum)
      .crossJoin(body.agg(count(lit(1)).as("nb")))
      .filter(col("nb") === 0 && col("err_in") + col("t") > 0)
      .select(lit("m").as("sid"), lit(null).cast("string").as("v"),
        lit(0L).as("c"), (col("err_in") + col("t")).as("err"))
    body.unionByName(sentinel)
  }

  /** [[mgMerge]] over INDEPENDENTLY BUILT summary frames — sketch
   * frames, merged artifacts, or a mix. Each frame's sids are
   * renumbered into a disjoint namespace (`"f<idx>/<sid>"`) before
   * the union, so the per-summary errs sum correctly even when the
   * inputs reuse names (every [[mgSketch]] numbers partitions from
   * `p0`; every merged artifact is `m`). This is the only safe way
   * to union MG frames you did not build in the same pass. */
  def mgMergeFrames(frames: Seq[DataFrame], k: Int): DataFrame = {
    require(frames.nonEmpty, "need at least one frame")
    mgMerge(frames.zipWithIndex.map { case (f, i) =>
      f.withColumn("sid", concat(lit(s"f$i/"), col("sid").cast("string")))
    }.reduce(_ unionByName _), k)
  }

  /** The composed corpus heavy-hitter summary: per-partition
   * [[mgSketch]] → one [[mgMerge]]. ≤ k rows, deficit contract
   * `c ≤ exact ≤ c + err`, coverage for every value with
   * `exact > err`. */
  /** The composed corpus heavy-hitter summary: per-partition
   * [[mgSketch]] → one [[mgMerge]]. The summary frame materializes
   * (k·P rows — tiny) before the merge: [[mgMerge]] reads it for the
   * counter sums AND the truncation threshold, and a lazy frame would
   * re-run the corpus mapPartitions pass per read. */
  def heavyHitters(df: DataFrame, value: Column, k: Int,
      ckpt: CheckpointMode = CheckpointMode.Local): DataFrame =
    mgMerge(ckpt(mgSketch(df, value, k)), k)

  /**
   * The measured-guarantee gate for [[heavyHitters]] (the
   * [[graft.operators.Dedup.lshRecallAudit]] discipline: ship the
   * BOUND as a number the oracle can check, not a hope): for the
   * exact top-`topN` values (count desc, value asc — deterministic),
   * verify the summary's theory contract. All three flags are
   * guaranteed TRUE for any partition layout — a red cell means the
   * sketch itself is broken, so the oracle asserts literal truth
   * against independently-computed exact counts.
   */
  def heavyHittersAudit(df: DataFrame, value: Column, k: Int,
      topN: Int, ckpt: CheckpointMode = CheckpointMode.Local): DataFrame = {
    require(topN >= 1, "topN must be >= 1")
    // materialized twice-read artifact (≤ k rows): the scalar err
    // aggregate and the join below must not each re-run the sketch
    val hh = ckpt(heavyHitters(df, value, k, ckpt)
      .select(col("v"), col("c"), col("err")))
    // err must reach UNFOUND rows too: attach it as a scalar, not via
    // the left join (which nulls it exactly where ok_found needs it)
    val errS = hh.agg(coalesce(max(col("err")), lit(0L)).as("err"))
    val exact = df.select(value.cast("string").as("v")).na.drop("any")
      .groupBy(col("v")).agg(count(lit(1)).as("exact_n"))
      .orderBy(col("exact_n").desc, col("v")).limit(topN)
    exact.join(broadcast(hh.select(col("v"), col("c"))), Seq("v"), "left")
      .crossJoin(broadcast(errS))
      .select(col("v"), col("exact_n"),
        (col("c").isNotNull || col("exact_n") <= col("err"))
          .as("ok_found"),
        (col("c").isNull || col("c") <= col("exact_n")).as("ok_lower"),
        (col("c").isNull || col("exact_n") <= col("c") + col("err"))
          .as("ok_upper"))
  }

  /**
   * Per-group [[mgSketch]] — one independent Misra–Gries summary per
   * group value (the per-domain/per-source frequent-items pass a
   * curation pipeline runs next to the corpus-wide one). Each
   * partition keeps ≤ k counters PER GROUP it sees, with a per-group
   * deficit: `c ≤ exact_g ≤ c + err_g`, coverage for
   * `exact_g > err_g`. Emits `(sid, g, v, c, err)`; `err` constant
   * within a (sid, g) cell. State per task is k·|groups seen by the
   * task| counters — the caller picks the group granularity (domain,
   * source, language), which is bounded in curation practice, and
   * `maxGroups` enforces it: a task that sees more distinct groups
   * fails fast with the [[kmvSimilarity]] guard's message instead of
   * growing k·|groups| state until the executor OOMs (the failure
   * mode of grouping by URL). Sids carry the disjointness contract
   * documented on [[mgSketch]]/[[mgMerge]].
   */
  def mgSketchBy(df: DataFrame, group: Column, value: Column,
      k: Int, maxGroups: Int = 4096): DataFrame = {
    require(k >= 2, "k must be >= 2")
    require(maxGroups >= 1, "maxGroups must be >= 1")
    val spark = df.sparkSession
    import spark.implicits._
    df.select(group.cast("string").as("g"), value.cast("string").as("v"))
      .na.drop("any")
      .as[(String, String)]
      .mapPartitions { it =>
        val maps = scala.collection.mutable
          .HashMap[String, scala.collection.mutable.HashMap[String, Long]]()
        val errs = scala.collection.mutable.HashMap[String, Long]()
        def compress(g: String): Unit = {
          val m = maps(g)
          val t = m.values.toArray.sortInPlace()(Ordering[Long].reverse)
            .apply(k)
          errs.update(g, errs.getOrElse(g, 0L) + t)
          m.mapValuesInPlace((_, c) => c - t)
          m.filterInPlace((_, c) => c > 0L)
        }
        it.foreach { case (g, v) =>
          val m = maps.getOrElseUpdate(g, {
            // fail fast at the memory unit that actually OOMs — the
            // per-task group map — not after the executor dies
            require(maps.size < maxGroups,
              s"mgSketchBy: a task saw more than maxGroups=$maxGroups " +
                "distinct groups — per-task state is k*|groups|; pass a " +
                "coarse group column (source/domain/shard), or raise " +
                "maxGroups deliberately")
            scala.collection.mutable.HashMap[String, Long]()
          })
          m.update(v, m.getOrElse(v, 0L) + 1L)
          if (m.size >= 2 * k) compress(g)
        }
        maps.keysIterator.toArray.foreach(g =>
          if (maps(g).size > k) compress(g))
        val sid = "p" + org.apache.spark.TaskContext.getPartitionId()
        maps.iterator.flatMap { case (g, m) =>
          val err = errs.getOrElse(g, 0L)
          if (m.isEmpty && err > 0L)
            Iterator.single((sid, g, null.asInstanceOf[String], 0L, err))
          else m.iterator.map { case (v, c) => (sid, g, v, c, err) }
        }
      }
      .toDF("sid", "g", "v", "c", "err")
  }

  /**
   * Merge [[mgSketchBy]] summaries group-by-group: the [[mgMerge]]
   * rule applied independently inside each `g` — counter sums, one
   * truncation per group, per-(sid, g) errs added once. The rank
   * window partitions by `g`, so the merge scales across groups; each
   * group's frame is summary-bounded. Same disjoint-sid PRECONDITION
   * as [[mgMerge]] — combine independently built frames through
   * [[mgMergeByFrames]].
   */
  def mgMergeBy(sketches: DataFrame, k: Int): DataFrame = {
    require(k >= 2, "k must be >= 2")
    val errSum = sketches.groupBy(col("sid"), col("g"))
      .agg(max(col("err")).as("e"))
      .groupBy(col("g")).agg(sum(col("e")).as("err_in"))
    val summed = sketches.filter(col("v").isNotNull)
      .groupBy(col("g"), col("v"))
      .agg(sum(col("c")).as("c"))
      .withColumn("rank", row_number().over(
        Window.partitionBy(col("g")).orderBy(col("c").desc, col("v"))))
    // the group universe comes from errSum (EVERY summary row has a
    // g, sentinels included) — a group whose partition summaries all
    // degenerated to sentinels is absent from `summed`, and an inner
    // join on a summed-derived t would silently drop it and its err
    val t = errSum.select(col("g"))
      .join(summed.groupBy(col("g"))
        .agg(coalesce(max(when(col("rank") === k + 1, col("c"))), lit(0L))
          .as("t0")), Seq("g"), "left")
      .select(col("g"), coalesce(col("t0"), lit(0L)).as("t"))
    val body = summed.filter(col("rank") <= k)
      .join(t, Seq("g")).join(errSum, Seq("g"))
      .filter(col("c") > col("t"))
      .select(lit("m").as("sid"), col("g"), col("v"),
        (col("c") - col("t")).as("c"),
        (col("err_in") + col("t")).as("err"))
    // groups whose merged body emptied (all-ties) still carry err
    val sentinel = t.join(errSum, Seq("g"))
      .join(body.groupBy(col("g")).agg(count(lit(1)).as("nb")),
        Seq("g"), "left")
      .filter(coalesce(col("nb"), lit(0L)) === 0 &&
        col("err_in") + col("t") > 0)
      .select(lit("m").as("sid"), col("g"),
        lit(null).cast("string").as("v"), lit(0L).as("c"),
        (col("err_in") + col("t")).as("err"))
    body.unionByName(sentinel)
  }

  /** [[mgMergeFrames]] for the per-group family: renumber each
   * frame's sids into a disjoint namespace, union, [[mgMergeBy]] —
   * the safe way to combine independently built per-group summaries
   * (each numbers partitions from `p0`; merged artifacts are `m`). */
  def mgMergeByFrames(frames: Seq[DataFrame], k: Int): DataFrame = {
    require(frames.nonEmpty, "need at least one frame")
    mgMergeBy(frames.zipWithIndex.map { case (f, i) =>
      f.withColumn("sid", concat(lit(s"f$i/"), col("sid").cast("string")))
    }.reduce(_ unionByName _), k)
  }

  /** Per-group [[heavyHitters]]: sketch → merge, one summary per
   * group. `maxGroups` is [[mgSketchBy]]'s fail-fast state bound. */
  def heavyHittersBy(df: DataFrame, group: Column, value: Column,
      k: Int, ckpt: CheckpointMode = CheckpointMode.Local,
      maxGroups: Int = 4096): DataFrame =
    mgMergeBy(ckpt(mgSketchBy(df, group, value, k, maxGroups)), k)

  /** Per-group [[heavyHittersAudit]]: the layout-independent deficit/
   * coverage contract checked against each group's exact top-`topN`
   * (count desc, value asc). All flags are theory-guaranteed true. */
  def heavyHittersByAudit(df: DataFrame, group: Column, value: Column,
      k: Int, topN: Int,
      ckpt: CheckpointMode = CheckpointMode.Local): DataFrame = {
    require(topN >= 1, "topN must be >= 1")
    val hh = ckpt(heavyHittersBy(df, group, value, k, ckpt))
    val errS = hh.groupBy(col("g"))
      .agg(coalesce(max(col("err")), lit(0L)).as("err"))
    val counts = df
      .select(group.cast("string").as("g"), value.cast("string").as("v"))
      .na.drop("any")
      .groupBy(col("g"), col("v")).agg(count(lit(1)).as("exact_n"))
    val exact = TopK.perGroup(counts, col("g"),
      col("exact_n").desc, col("v"), topN).drop("rank")
    exact
      .join(hh.filter(col("v").isNotNull).select(col("g"), col("v"),
        col("c")), Seq("g", "v"), "left")
      .join(errS, Seq("g"), "left")
      .select(col("g"), col("v"), col("exact_n"),
        (col("c").isNotNull || col("exact_n") <= coalesce(col("err"),
          lit(0L))).as("ok_found"),
        (col("c").isNull || col("c") <= col("exact_n")).as("ok_lower"),
        (col("c").isNull || col("exact_n") <= col("c") +
          coalesce(col("err"), lit(0L))).as("ok_upper"))
  }

  /**
   * The four micro-integer features the trained quality classifier
   * reads — shared by [[logregQuality]] and the oracle generator so
   * both engines score the identical design matrix. All integer
   * arithmetic (`ldiv` = truncating long division, the
   * [[graft.operators.TextOps.gopherRules]] discipline): bias,
   * punctuation ratio, English-stopword ratio, and mean word length
   * capped at 10 chars — each lands in [0, 10⁶].
   */
  def logregFeatures(text: Column): Seq[(String, Column)] = {
    import graft.functions.ldiv
    val w = TextOps.tokens(text)
    val nWords = nullif(size(w).cast("long"), lit(0L))
    val nChars = nullif(length(text).cast("long"), lit(0L))
    val punct = length(regexp_replace(text, "[a-zA-Z0-9 ]", "")).cast("long")
    val stops = size(filter(w,
      x => x.isInCollection(TextOps.stopwords.toMap.apply("en")))).cast("long")
    val sumChars = aggregate(w, lit(0L), (acc, x) => acc + length(x))
    Seq(
      "x0" -> lit(1000000L),
      "x1" -> ldiv(punct * lit(1000000L), nChars),
      "x2" -> ldiv(stops * lit(1000000L), nWords),
      "x3" -> ldiv(least(ldiv(sumChars * lit(1000000L), nWords),
        lit(10000000L)), lit(10L)))
  }

  /**
   * Trained quality classifier: full-batch logistic regression by
   * gradient descent over [[logregFeatures]], labels from the
   * caller's `positive` predicate (the fastText-style "wiki = good,
   * crawl = bad" bootstrap every production quality filter starts
   * from — Joulin et al. 2016 shape; the reference has no learned
   * surface at all). Emits per-doc `(id, y, z_pico, p_micro, pred)`
   * under the FINAL weights.
   *
   * Exactness discipline — the whole train loop is reproducible
   * bit-for-bit on any engine/cluster layout:
   *   - features and weights are micro LONGs; the margin
   *     `z_pico = Σ wⱼ·xⱼ` is an exact integer (|z| ≤ 10¹⁴ < 2⁵³);
   *   - the ONLY transcendental touch is the per-row residual
   *     `r_micro = round((σ(z) − y)·10⁶)` — the [[unigramNll]]
   *     micro-quantization point (engines' exp agree far inside
   *     10⁻⁶); iteration 1 has z ≡ 0 so σ is exactly ½ and r is
   *     integral on both engines;
   *   - gradients Σ r·xⱼ sum in DECIMAL(38,0) (exact, order-free —
   *     a 100-TB corpus overflows a LONG here);
   *   - the weight step is EXACT rational arithmetic: half-away-
   *     from-zero of `lr·gⱼ/(n·10⁶)` via the [[graft.functions.ratio6]]
   *     integer construction on driver-side BigInts — `round(double)`
   *     on an integer ratio hits 5·10⁻⁷ ties (the events_seasonal
   *     mechanism), so no double ever enters the update.
   *
   * Scale shape: one scan per iteration against a checkpointed
   * feature frame (the [[graft.operators.Embeddings.kmeansRun]]
   * loop), map-side partial aggregation down to ONE 4-cell gradient
   * row per pass; weights are a d+1-value driver artifact (the
   * [[bpeTrain]] bounded-artifact pattern). Nothing driver-side ever
   * scales with the corpus.
   */
  def logregQuality(df: DataFrame, id: Column, text: Column,
      positive: Column, iters: Int = 4, lrNum: Long = 1L, lrDen: Long = 1L,
      ckpt: CheckpointMode = CheckpointMode.Local): DataFrame = {
    val feats = ckpt(logregFeatFrame(df, id, text, positive))
    val w = logregSteps(feats, Vector.fill(4)(BigInt(0)), iters,
      lrNum, lrDen, requireRows = true)
    logregScoreFeats(feats, w)
  }

  /** The (doc_id, y, x0..x3) design matrix [[logregQuality]],
   * [[logregSteps]] and the standing stream all read — null/empty
   * texts excluded on both engines identically. */
  def logregFeatFrame(df: DataFrame, id: Column, text: Column,
      positive: Column): DataFrame =
    df.filter(text.isNotNull && length(text) > 0)
      .select((id.as("doc_id") +:
        when(positive, 1L).otherwise(0L).as("y") +:
        logregFeatures(text).map { case (n, c) => c.as(n) }): _*)

  private def logregZ(wv: Vector[BigInt]): Column =
    wv.indices.map(j => lit(wv(j).toLong) * col(s"x$j")).reduce(_ + _)

  /**
   * `iters` exact GD steps over a [[logregFeatFrame]], starting from
   * `init` — the reusable training kernel: [[logregQuality]] starts
   * from zeros; the standing stream
   * ([[graft.streaming.SeriesStream.logregStream]]) starts each batch
   * from the persisted weights, which makes the online model a pure
   * fold of the batch kernel over the batch sequence (bit-exact to
   * replaying the batches through this function by hand). An empty
   * frame returns `init` unchanged unless `requireRows`.
   */
  private[graft] def logregSteps(feats: DataFrame, init: Vector[BigInt],
      iters: Int, lrNum: Long = 1L, lrDen: Long = 1L,
      requireRows: Boolean = false): Vector[BigInt] = {
    require(iters >= 1, "iters must be >= 1")
    require(lrNum >= 1 && lrDen >= 1, "learning rate must be positive")
    val n = feats.count()
    if (requireRows) require(n > 0, "no trainable rows (all texts null/empty)")
    if (n == 0) return init
    val den = BigInt(lrDen) * BigInt(n) * BigInt(1000000L)
    var w = init
    def rMicro(wv: Vector[BigInt]): Column =
      round((lit(1.0) / (lit(1.0) +
        exp(-(logregZ(wv).cast("double") / lit(1.0e12)))) -
        col("y").cast("double")) * lit(1000000.0)).cast("long")
    for (_ <- 1 to iters) {
      val gs = w.indices.map(j =>
        sum((col("r") * col(s"x$j")).cast("decimal(38,0)")).as(s"g$j"))
      val grads = feats.select(rMicro(w).as("r"), col("*"))
        .agg(gs.head, gs.tail: _*)
        .collect()(0)
      w = w.indices.map { j =>
        val g = BigInt(grads.getDecimal(j).toBigInteger)
        val step = (g.abs * 2 * lrNum + den) / (den * 2)
        w(j) - (if (g < 0) -step else step)
      }.toVector
    }
    w
  }

  /** Score a [[logregFeatFrame]] under fixed micro weights — the
   * serving half: `(doc_id, y, z_pico, p_micro, pred)`. */
  def logregScoreFeats(feats: DataFrame, w: Vector[BigInt]): DataFrame = {
    val z = logregZ(w)
    val p = round((lit(1.0) / (lit(1.0) +
      exp(-(z.cast("double") / lit(1.0e12))))) * lit(1000000.0))
      .cast("long")
    feats.select(col("doc_id"), col("y"), z.as("z_pico"),
      p.as("p_micro"), (p >= 500000L).as("pred"))
  }

  /**
   * Confusion counts + threshold metrics for any binary classifier
   * output ([[logregQuality]], [[naiveBayesClassify]] verdicts, a
   * rule filter) — the one-row summary a filter ships with next to
   * its [[calibration]] bins and [[aucPpm]]. Counts are one
   * map-side-combined aggregate; the ppm ratios are the
   * `gopherRules` truncating-integer construction (no float at the
   * emit edge, zero denominators → null). F1 derives from the ppm
   * precision/recall integers, so it is engine-exact too.
   */
  def classifierReport(df: DataFrame, label: Column, pred: Column): DataFrame = {
    import graft.functions.ldiv
    def cnt(c: Column): Column = sum(when(c, 1L).otherwise(0L))
    val base = df.agg(
      cnt(label && pred).as("tp"), cnt(!label && pred).as("fp"),
      cnt(label && !pred).as("fn"), cnt(!label && !pred).as("tn"))
    val prec = ldiv(col("tp") * lit(1000000L),
      nullif(col("tp") + col("fp"), lit(0L)))
    val rec = ldiv(col("tp") * lit(1000000L),
      nullif(col("tp") + col("fn"), lit(0L)))
    base
      .withColumn("precision_ppm", prec)
      .withColumn("recall_ppm", rec)
      .withColumn("f1_ppm", ldiv(
        lit(2L) * col("precision_ppm") * col("recall_ppm"),
        nullif(col("precision_ppm") + col("recall_ppm"), lit(0L))))
      .withColumn("accuracy_ppm", ldiv((col("tp") + col("tn")) * lit(1000000L),
        nullif(col("tp") + col("fp") + col("fn") + col("tn"), lit(0L))))
  }
}
