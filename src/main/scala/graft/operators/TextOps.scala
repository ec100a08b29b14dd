package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/**
 * Text-analysis operators for large-scale training-data pipelines:
 * tokenization, language ID, quality scoring, fingerprinting. All are
 * pure codegen'd `functions._` compositions — no UDFs — so they
 * whole-stage-compile and scale linearly with the scan.
 */
object TextOps {

  /** Whitespace tokens (the corpus is single-space separated). */
  def tokens(text: Column): Column = split(text, " ")

  /** GPT-2-style regex pre-tokenization segments — the production
   * tokenizer-family alternative to [[tokens]] (contractions,
   * leading-space-attached letter/digit/punctuation runs, whitespace
   * runs). Opt-in: every trainer/encoder defaults to [[tokens]];
   * passing `pretok = true` routes them here. See
   * [[graft.functions.PreTokenizeExpr]] for the pattern contract. */
  def pretokens(text: Column): Column =
    graft.functions.PreTokenizeExpr.pretokenize(text)

  /** All overlapping k-word grams in position order (duplicates
   * kept). The token array is let-bound so `split` runs once per
   * document — an expression referenced inside a higher-order-
   * function lambda is otherwise re-evaluated per element
   * (O(words²) splits). */
  def ngrams(text: Column, k: Int): Column =
    let(tokens(text)) { w =>
      when(size(w) >= k,
        transform(sequence(lit(0), size(w) - k),
          i => concat_ws(" ", (0 until k).map(j => element_at(w, i + j + 1)): _*)))
        .otherwise(array().cast("array<string>"))
    }

  /** Sliding k-word shingles, deduplicated; the standard unit for
   * n-gram Jaccard / MinHash document similarity. */
  def shingles(text: Column, k: Int = 3): Column =
    array_distinct(ngrams(text, k))

  /** 60-bit stable content hash from md5 (portable: any engine with
   * md5 + hex parsing reproduces it — the correctness oracle does). */
  def hash60(c: Column): Column = graft.functions.Hash60Expr.hash60(c)

  // Minimal per-language stopword lists for the n-gram/stopword
  // language-ID heuristic. Deliberately tiny and static: the operator
  // shape (token-set membership scoring) is what matters at scale.
  val stopwords: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "a", "of", "to", "and", "in", "is", "it", "you", "that"),
    "es" -> Seq("el", "la", "de", "que", "y", "en", "un", "los", "se", "no"),
    "de" -> Seq("der", "die", "das", "und", "ist", "von", "mit", "zu", "den"),
    "fr" -> Seq("le", "la", "de", "et", "les", "des", "un", "une", "est"),
    "zh" -> Seq("的", "是", "了", "在", "我", "有", "和", "就"),
  )

  /** Stopword-membership score per language. */
  def langScore(text: Column, lang: String): Column = {
    val words = stopwords.toMap.apply(lang)
    size(filter(tokens(text), w => w.isInCollection(words)))
  }

  /** Language-ID: argmax of per-language stopword counts with a fixed
   * tie-break order (list order above). */
  def langId(text: Column): Column = {
    val scores = stopwords.map { case (l, _) => l -> langScore(text, l) }
    val best = greatest(scores.map(_._2): _*)
    scores.foldRight(lit("und")) { case ((l, s), acc) =>
      when(s === best && s > 0, lit(l)).otherwise(acc)
    }
    // foldRight gives earlier languages precedence on ties
  }

  /** Quality-signal columns: token count, mean word length, uppercase
   * ratio, punctuation ratio, stopword ratio, and a weighted score. */
  def qualityColumns(text: Column): Seq[(String, Column)] = {
    val w = tokens(text)
    // zero denominators (empty text) yield null ratios, as SQL's 0/0
    // does — ANSI mode would otherwise raise
    def div(a: Column, b: Column): Column = a / nullif(b, lit(0.0))
    val nWords = size(w).cast("double")
    val nChars = length(text).cast("double")
    val meanWordLen = div(nChars - nWords + lit(1.0), nWords)
    val punct = div(length(regexp_replace(text, "[a-zA-Z0-9 ]", "")).cast("double"), nChars)
    val stop = div(langScore(text, "en").cast("double"), nWords)
    val score = lit(0.4) * stop +
      lit(0.3) * when(meanWordLen.between(3.0, 8.0), 1.0).otherwise(0.0) +
      lit(0.3) * (lit(1.0) - punct)
    Seq("n_words" -> nWords.cast("long"), "mean_word_len" -> meanWordLen,
      "punct_ratio" -> punct, "stopword_ratio" -> stop, "quality" -> score)
  }

  /**
   * Gopher-style document rule filter (Rae et al. 2021,
   * arXiv:2112.11446 §A1.1): the cheap per-document heuristics a
   * pre-training ingest applies before any model-based scoring —
   * word-count bounds, mean-word-length bounds, a minimum fraction of
   * words containing an alphabetic character, and a minimum stopword
   * hit count. One codegen'd pass over a let-bound token array; no
   * shuffle, scan-bound at any corpus size.
   *
   * Every ratio is emitted as an integer micro-unit derived by
   * truncating integral division of non-negative longs (`a·10⁶ div
   * n`) — bit-identical on any engine, no `round(double)` at the emit
   * edge — and the keep flag compares only integers.
   *
   * Defaults are the paper's §A1.1 bounds: 50–100,000 words, mean
   * word length 3–10 characters, ≥80% of words containing an
   * alphabetic character, ≥2 stopword hits.
   */
  def gopherRules(text: Column,
      minWords: Long = 50, maxWords: Long = 100000,
      minMeanWordLenMicro: Long = 3000000L,
      maxMeanWordLenMicro: Long = 10000000L,
      minAlphaWordFracMicro: Long = 800000L,
      minStopHits: Long = 2): Seq[(String, Column)] = {
    import graft.functions.ldiv
    val enStops = stopwords.toMap.apply("en")
    val w = tokens(text)
    // size(null array) is -1 in non-ANSI Spark; SQL's len(NULL) is
    // NULL — gate on the text itself so null docs emit null signals
    // (and a coalesced-false keep) on both engines
    def sz(c: Column): Column = when(text.isNotNull, size(c)).cast("long")
    val nWords = sz(w)
    val sumChars = aggregate(w, lit(0L), (acc, x) => acc + length(x))
    val alphaWords = sz(filter(w, x => x.rlike("[a-zA-Z]")))
    val stopHits = sz(filter(w, x => x.isInCollection(enStops)))
    val den = nullif(nWords, lit(0L))
    val mwlMicro = ldiv(sumChars * lit(1000000L), den)
    val alphaMicro = ldiv(alphaWords * lit(1000000L), den)
    Seq(
      "n_words" -> nWords,
      "sum_word_chars" -> sumChars,
      "mean_word_len_micro" -> mwlMicro,
      "alpha_word_frac_micro" -> alphaMicro,
      "stop_hits" -> stopHits,
      "gopher_keep" -> coalesce(
        nWords.between(minWords, maxWords) &&
          mwlMicro.between(minMeanWordLenMicro, maxMeanWordLenMicro) &&
          alphaMicro >= minAlphaWordFracMicro &&
          stopHits >= minStopHits,
        lit(false)))
  }

  /**
   * Script/charset composition per document — the writing-system
   * profile a multilingual ingest reads next to [[langId]] (stopword
   * language-ID is useless on non-Latin text; script counts are the
   * cheap first router, and mixed-script docs are a spam/injection
   * signal). Counts characters in explicit Unicode ranges — Latin
   * letters, ASCII digits, CJK Unified (U+4E00–9FFF), Cyrillic
   * (U+0400–04FF), Arabic (U+0600–06FF) — by the
   * length-minus-replaced construction, which any regex engine
   * reproduces exactly for literal character-class ranges (no \\p{}
   * property names, whose tables differ between engines). `script` is
   * the dominant non-digit script by a fixed >= comparison chain
   * (latin ≻ cjk ≻ cyrillic ≻ arabic on ties), `none` when no scripted
   * character appears, null on null text. One codegen'd scan pass, no
   * shuffle.
   */
  /** Common multi-label public suffixes — a bounded, embedded subset
   * of the public suffix list covering the registrars a crawl corpus
   * actually hits in volume. Deliberately static (like [[stopwords]]):
   * the operator shape — label arithmetic against a suffix set — is
   * what matters; callers needing the full PSL pass their own seq. */
  val MultiLabelSuffixes: Seq[String] = Seq(
    "co.uk", "org.uk", "ac.uk", "gov.uk", "me.uk", "net.uk",
    "co.jp", "ne.jp", "or.jp", "ac.jp", "go.jp",
    "com.au", "net.au", "org.au", "edu.au", "gov.au",
    "co.nz", "org.nz", "net.nz",
    "com.br", "net.br", "org.br", "gov.br",
    "co.in", "net.in", "org.in", "ac.in", "gov.in",
    "com.cn", "net.cn", "org.cn", "gov.cn",
    "com.mx", "com.ar", "com.tr", "co.kr", "or.kr", "com.sg",
    "com.hk", "co.za", "org.za", "com.tw", "com.my", "com.sa")

  /**
   * URL decomposition + canonicalization — the crawl-curation key
   * derivation every per-domain operation needs ([[Sampling.groupCap]]
   * caps, [[CorpusStats.dataCard]] per-domain rollups, host-level
   * dedup). Emits `scheme`, `host` (lowercased, userinfo/port
   * stripped), `registered_domain` (host cut to the registrable label
   * pair, or triple when the trailing pair is a known multi-label
   * public suffix; IP hosts pass through whole), `path`, `path_depth`,
   * `n_params`, and `url_canon` (lowercased scheme+host, trailing
   * slashes trimmed, fragment dropped, tracking params — `utm_*`,
   * `fbclid`, `gclid`, `msclkid` — removed). Strings that do not parse
   * as absolute URLs emit all-null parts.
   *
   * Everything is regex/array `functions._` composition — codegen'd,
   * no UDFs, and every regex uses only literal classes/anchors so any
   * engine's regex dialect (the DuckDB oracle's included) reproduces
   * it exactly. One scan pass, no shuffle.
   */
  def urlParts(url: Column,
      multiSuffixes: Seq[String] = MultiLabelSuffixes): Seq[(String, Column)] = {
    def ne(c: Column): Column = nullif(c, lit(""))
    // every intermediate (host, path, query, label array) is
    // LET-BOUND so it appears ONCE in the expression tree: the naive
    // inline form re-expands the regex chain at every reference
    // (~100 regexp nodes after CollapseProject), which blows up the
    // generated code — at that point codegen COMPILATION, not row
    // evaluation, dominates any query using these columns. The seven
    // emitted columns are fields of one struct, so physical common-
    // subexpression elimination evaluates the whole chain once per row.
    val parts = let(url) { u =>
      let(lower(regexp_replace(regexp_replace(
          ne(regexp_extract(u, "^[a-zA-Z][a-zA-Z0-9+.-]*://([^/?#]*)", 1)),
          "^[^@]*@", ""), ":[0-9]+$", ""))) { host =>
        let(lower(ne(regexp_extract(u, "^([a-zA-Z][a-zA-Z0-9+.-]*)://", 1)))) { scheme =>
          let(regexp_extract(u, "^[a-zA-Z][a-zA-Z0-9+.-]*://[^/?#]*([^?#]*)", 1)) { path =>
            let(ne(regexp_extract(u, "\\?([^#]*)", 1))) { query =>
              let(split(host, "\\.")) { labels =>
                val last1 = element_at(labels, -1)
                val last2 = concat_ws(".", element_at(labels, -2), last1)
                val last3 = concat_ws(".", element_at(labels, -3),
                  element_at(labels, -2), last1)
                val regDomain = when(host.rlike("^[0-9.]+$"), host)
                  .when(size(labels) >= 3 &&
                    last2.isInCollection(multiSuffixes), last3)
                  .when(size(labels) >= 2, last2)
                  .otherwise(host)
                val keptParams = array_join(filter(split(query, "&"),
                  s => !s.rlike("^(utm_[a-zA-Z]+|fbclid|gclid|msclkid)=")), "&")
                when(scheme.isNotNull && host.isNotNull, struct(
                  scheme.as("scheme"),
                  host.as("host"),
                  regDomain.as("registered_domain"),
                  path.as("path"),
                  size(filter(split(path, "/"), s => s =!= ""))
                    .cast(LongType).as("path_depth"),
                  when(query.isNull, lit(0))
                    .otherwise(size(filter(split(query, "&"), s => s =!= "")))
                    .cast(LongType).as("n_params"),
                  concat(scheme, lit("://"), host,
                    regexp_replace(path, "/+$", ""),
                    when(query.isNotNull && length(keptParams) > 0,
                      concat(lit("?"), keptParams)).otherwise(lit("")))
                    .as("url_canon")))
              }
            }
          }
        }
      }
    }
    Seq("scheme", "host", "registered_domain", "path", "path_depth",
      "n_params", "url_canon").map(n => n -> parts.getField(n))
  }

  def scriptProfile(text: Column): Seq[(String, Column)] = {
    def cnt(cls: String): Column = when(text.isNotNull,
      length(text) - length(regexp_replace(text, cls, ""))).cast("long")
    val latin = cnt("[A-Za-z]")
    val digit = cnt("[0-9]")
    val cjk = cnt("[一-鿿]")
    val cyr = cnt("[Ѐ-ӿ]")
    val ar = cnt("[؀-ۿ]")
    val dominant = when(text.isNull, lit(null).cast("string"))
      .when(latin === 0 && cjk === 0 && cyr === 0 && ar === 0, lit("none"))
      .when(latin >= cjk && latin >= cyr && latin >= ar, lit("latin"))
      .when(cjk >= cyr && cjk >= ar, lit("cjk"))
      .when(cyr >= ar, lit("cyrillic"))
      .otherwise(lit("arabic"))
    Seq("n_chars" -> when(text.isNotNull, length(text)).cast("long"),
      "latin_chars" -> latin, "digit_chars" -> digit,
      "cjk_chars" -> cjk, "cyrillic_chars" -> cyr, "arabic_chars" -> ar,
      "script" -> dominant)
  }

  // Whitespace as an EXPLICIT class: Java's \s includes vertical tab
  // (\x0B) while RE2 (DuckDB) excludes it — spelled out, both engines
  // agree byte for byte.
  private val WsClass = " \\t\\n\\x0B\\f\\r"

  /** Token counting: whitespace tokens and a BPE-ish regex token count
   * (letter runs, digit runs, and single other non-space chars). */
  def tokenCounts(text: Column): Seq[(String, Column)] = Seq(
    "ws_tokens" -> size(tokens(text)).cast("long"),
    "bpe_tokens" -> regexp_count(text,
      lit(s"[a-zA-Z]+|[0-9]+|[^a-zA-Z0-9$WsClass]")).cast("long"),
  )

  /** Document fingerprint: md5 of whitespace-normalized, lowercased
   * text — the portable exact-dedup key. Caveat: lowercasing of
   * non-ASCII depends on the engine's unicode tables (JVM full case
   * mapping vs utf8proc simple mapping — e.g. 'İ'), so cross-engine
   * fingerprints are guaranteed only for ASCII text. */
  def fingerprint(text: Column): Column =
    md5(normalize(text))

  /** The canonical text form behind [[fingerprint]], exposed as its
   * own operator — whitespace runs collapsed to one space, trimmed,
   * lowercased. The normalization every exact-dedup/cache key in the
   * engine keys on, available to callers that want to MATERIALIZE the
   * cleaned text (export, display, downstream tokenization) rather
   * than just hash it. Pure codegen'd projection; same non-ASCII
   * lowercasing caveat as the fingerprint. */
  def normalize(text: Column): Column =
    lower(trim(regexp_replace(text, s"[$WsClass]+", " ")))

  /**
   * Repetition signals (the Gopher/C4 quality-filter family): per
   * document, the fraction of all word n-gram occurrences taken by
   * the single most frequent n-gram (`top_ngram_frac`) and the
   * fraction that are duplicate occurrences (`dup_ngram_frac` =
   * 1 − distinct/total). Boilerplate and looping generations score
   * high on both. Docs with fewer than n words get null metrics.
   *
   * Shuffle shape: explode → (doc, gram) count → per-doc rollup,
   * both partial-aggregated map-side and keyed by doc id — linear in
   * corpus token count, no doc ever compares against another.
   */
  def repetition(df: DataFrame, id: Column, text: Column,
      n: Int = 2): DataFrame = {
    val base = df.select(id.as("doc_id"), text.as("__text"))
    val counts = base
      .select(col("doc_id"), explode(ngrams(col("__text"), n)).as("gram"))
      .groupBy(col("doc_id"), col("gram")).agg(count(lit(1)).as("c"))
    val agg = counts.groupBy(col("doc_id")).agg(
      sum(col("c")).as("total"), max(col("c")).as("maxc"),
      count(lit(1)).as("dct"))
    base.select(col("doc_id")).join(agg, Seq("doc_id"), "left")
      .select(col("doc_id"),
        (col("maxc").cast("double") / col("total")).as("top_ngram_frac"),
        (lit(1.0) - col("dct").cast("double") / col("total")).as("dup_ngram_frac"))
  }

  /**
   * Corpus-level n-gram NOVELTY: what fraction of each document's
   * distinct `k`-word substrings appear in NO other document. The
   * inverse view of [[Dedup.sharedSubstrings]] — that operator flags
   * docs containing boilerplate; this one scores how much of a doc is
   * original, the per-doc signal dataset builders threshold to prefer
   * content-bearing pages over template farms. `novelty = n_unique /
   * n_grams` (6 dp; null for docs too short to form any gram).
   *
   * Same scale shape as sharedSubstrings: grams deduplicate inside
   * each row before the explode, travel as 60-bit hashes (8 bytes
   * through the shuffle), and the gram-frequency group-by partial-
   * aggregates map-side; per-doc ratios come back via one count-join.
   */
  def novelty(df: DataFrame, id: Column, text: Column,
      k: Int = 12): DataFrame = {
    val grams = df.select(id.as("doc_id"),
        explode(array_distinct(ngrams(text, k))).as("gram"))
      .select(col("doc_id"), hash60(col("gram")).as("gh"))
    val freq = grams.groupBy(col("gh"))
      .agg(count(lit(1)).as("nd")) // grams are distinct per doc
    val per = grams.join(freq, "gh")
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_grams"),
        sum(when(col("nd") === 1, 1L).otherwise(0L)).as("n_unique"))
    df.select(id.as("doc_id")).join(per, Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("n_grams"), lit(0L)).as("n_grams"),
        coalesce(col("n_unique"), lit(0L)).as("n_unique"),
        // explicit null for gram-less docs: double 0/0 would be NaN.
        // Integer-ratio emit (functions.ratio6): int ratios sit on
        // the 5e-7 ties where engines' round(double, 6) diverge
        when(coalesce(col("n_grams"), lit(0L)) > 0,
          graft.functions.ratio6(col("n_unique"), col("n_grams")))
          .as("novelty"))
  }

  /**
   * Benchmark decontamination: flag corpus documents sharing any
   * word n-gram with an evaluation set (the standard n-gram-overlap
   * contamination check run before training). `hits` counts the
   * DISTINCT shared n-grams per document.
   *
   * Scale shape: the benchmark side is tiny next to the corpus, so
   * its distinct grams stay a broadcast; the corpus side is one scan
   * + explode + broadcast-semi join + doc-keyed count — the corpus
   * never shuffles its text, only (doc_id, matched-gram) pairs.
   */
  def decontaminate(docs: DataFrame, id: Column, text: Column,
      bench: DataFrame, benchText: Column, n: Int = 8): DataFrame = {
    val bg = broadcast(
      bench.select(explode(ngrams(benchText, n)).as("gram")).distinct())
    val hits = docs
      // one hit per distinct gram, not per occurrence: deduplicated
      // INSIDE each row before the explode — a (doc_id, gram)
      // `.distinct()` here would shuffle the corpus's whole gram
      // stream for a result the per-doc array_distinct already gives
      .select(id.as("doc_id"),
        explode(array_distinct(ngrams(text, n))).as("gram"))
      .join(bg, "gram")
      .groupBy(col("doc_id")).agg(count(lit(1)).as("hits"))
    docs.select(id.as("doc_id")).join(hits, Seq("doc_id"), "left")
      .select(col("doc_id"), coalesce(col("hits"), lit(0L)).as("hits"),
        (coalesce(col("hits"), lit(0L)) > 0).as("contaminated"))
  }

  /**
   * Per-group contamination dashboard: [[decontaminate]] rolled up by
   * a grouping column (source, domain, shard…) — the report a curation
   * run reads before deciding which sources need re-crawling. Emits
   * doc counts, contaminated counts, and the contamination rate as
   * integer parts-per-million (`n_contaminated·10⁶ div n_docs`; a
   * truncating integral divide of non-negative longs, identical on
   * every engine). Scale shape: the decontaminate probe (broadcast
   * bench gram set, per-doc dedup before the explode) followed by one
   * map-side-combined rollup to |groups| rows.
   */
  def contaminationReport(docs: DataFrame, id: Column, text: Column,
      group: Column, bench: DataFrame, benchText: Column,
      n: Int = 8): DataFrame = {
    val flags = decontaminate(docs, id, text, bench, benchText, n)
    docs.select(id.as("doc_id"), group.as("grp"))
      .join(flags, "doc_id")
      .groupBy(col("grp"))
      .agg(count(lit(1)).as("n_docs"),
        sum(when(col("contaminated"), 1L).otherwise(0L)).as("n_contaminated"))
      .withColumn("contam_ppm",
        graft.functions.ldiv(col("n_contaminated") * lit(1000000L),
          col("n_docs")))
  }

  /**
   * Passage chunking for retrieval/embedding pipelines: cut each
   * document into fixed-size character windows with overlap
   * (`stride` < `size` overlaps adjacent chunks so no passage is
   * split mid-thought at every boundary). Chunk i covers
   * `[i·stride, i·stride + size)`; the last chunk may be short;
   * empty docs produce no chunks. Pure per-row explode — scan-bound,
   * no shuffle, the [[Multimodal.sampleFrames]] shape for text.
   */
  def chunk(df: DataFrame, id: Column, text: Column,
      size: Int, stride: Int): DataFrame = {
    require(size > 0 && stride > 0 && stride <= size,
      "need 0 < stride <= size")
    val len = length(text)
    val n = when(len === 0, lit(0))
      .when(len <= size, lit(1))
      .otherwise(lit(1) + ceil((len - size).cast("double") / stride).cast("int"))
    df.select(id.as("doc_id"), text.as("__t"), n.as("__n"))
      .filter(col("__n") > 0)
      .withColumn("chunk_idx", explode(sequence(lit(0), col("__n") - 1)))
      .select(col("doc_id"), col("chunk_idx"),
        col("__t").substr(col("chunk_idx") * stride + 1, lit(size)).as("chunk"))
  }

  /**
   * Bloom-prefiltered decontamination — the 100 TB shape of
   * [[decontaminate]] for when the eval set itself is large (a full
   * eval-suite union easily carries 10⁸ distinct grams; as strings
   * that broadcast is GBs, as an 8-bits-per-key Bloom it is ~100 MB).
   *
   * Three stages, exact end to end:
   *
   *  1. BUILD — distributed: per-partition Blooms over the eval
   *     grams' 60-bit hashes, tree-merged to the driver
   *     (`stat.bloomFilter`); only the bitset ever leaves executors.
   *  2. PROBE — a codegen'd [[graft.functions.BloomContainsExpr]]
   *     filter on the corpus gram stream, applied BEFORE any join or
   *     shuffle: the overwhelmingly-clean corpus drops here at scan
   *     speed, with false positives at `fpp`.
   *  3. CONFIRM — the surviving sliver joins the exact gram set, so
   *     Bloom false positives are discarded and the output equals
   *     [[decontaminate]] bit for bit (the gate runs both against the
   *     same oracle).
   *
   * The confirm join's left side is ~`fpp`·|corpus grams| + true
   * hits — small enough that the exact gram set's broadcast (or a
   * shuffled join at extreme eval sizes) touches almost no corpus
   * data.
   */
  def decontaminateBloom(docs: DataFrame, id: Column, text: Column,
      bench: DataFrame, benchText: Column, n: Int = 8,
      fpp: Double = 0.01): DataFrame =
    decontaminateFromGrams(docs, id, text,
      evalGrams(bench, benchText, n), n, fpp)

  /** The eval set's distinct word-n-gram frame (`(gram)`) — the
   * PERSISTABLE decontamination artifact: distinct-union is an exact
   * set homomorphism, so per-batch artifacts merge into exactly the
   * from-scratch build ([[graft.streaming.SeriesStream
   * .evalGramStream]] maintains one as benchmark sets evolve). */
  def evalGrams(bench: DataFrame, benchText: Column, n: Int = 8): DataFrame =
    bench.select(explode(ngrams(benchText, n)).as("gram")).distinct()

  /** [[decontaminateBloom]] against a prebuilt [[evalGrams]] frame —
   * identical output, none of the eval-side gram scan (the
   * standing-artifact scoring path). */
  def decontaminateFromGrams(docs: DataFrame, id: Column, text: Column,
      grams: DataFrame, n: Int = 8, fpp: Double = 0.01): DataFrame = {
    val bg = grams.select(col("gram"))
    val hashed = bg.select(hash60(col("gram")).as("gh"))
    // sizing aggregate: one count over the (small) eval side — the
    // same metadata-scale job stat.bloomFilter itself runs next
    val items = math.max(hashed.count(), 1L)
    val bloom = hashed.stat.bloomFilter("gh", items, fpp)
    val hits = docs
      .select(id.as("doc_id"),
        explode(array_distinct(ngrams(text, n))).as("gram"))
      .filter(graft.functions.BloomContainsExpr.contains(
        bloom, hash60(col("gram"))))
      .join(broadcast(bg), "gram")
      .groupBy(col("doc_id")).agg(count(lit(1)).as("hits"))
    docs.select(id.as("doc_id")).join(hits, Seq("doc_id"), "left")
      .select(col("doc_id"), coalesce(col("hits"), lit(0L)).as("hits"),
        (coalesce(col("hits"), lit(0L)) > 0).as("contaminated"))
  }

  /**
   * Passage-level decontamination via winnowing fingerprints: where
   * [[decontaminate]]'s exact word-8-grams miss lightly edited reuse
   * (tokenization drift, punctuation changes), shared winnow minima
   * survive small edits — the MOSS property. `shared_fps` counts the
   * distinct fingerprints a doc shares with the eval set. Same scale
   * shape as [[decontaminate]]: benchmark fingerprints broadcast,
   * corpus side scan + explode + broadcast join + doc-keyed count.
   */
  def decontaminateByFingerprint(docs: DataFrame, id: Column, text: Column,
      bench: DataFrame, benchText: Column,
      k: Int = 8, w: Int = 4): DataFrame = {
    val bf = broadcast(
      bench.select(explode(winnowFingerprints(benchText, k, w)).as("fp")).distinct())
    val hits = docs
      // winnow output is already distinct within a doc — no dedup step
      .select(id.as("doc_id"), explode(winnowFingerprints(text, k, w)).as("fp"))
      .join(bf, "fp")
      .groupBy(col("doc_id")).agg(count(lit(1)).as("shared_fps"))
    docs.select(id.as("doc_id")).join(hits, Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("shared_fps"), lit(0L)).as("shared_fps"),
        (coalesce(col("shared_fps"), lit(0L)) > 0).as("contaminated"))
  }

  // PII patterns, written to the RE2 ∩ Java-regex dialect (no \b, no
  // backrefs) so the DuckDB oracle matches byte for byte; the oracle
  // SQL interpolates these SAME constants so they cannot drift
  private[graft] val EmailRe = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  private[graft] val Ipv4Re = "([0-9]{1,3}\\.){3}[0-9]{1,3}"
  private[graft] val PhoneRe = "\\+[0-9][0-9 ()-]{6,}[0-9]"

  /** PII redaction columns: emails, IPv4 addresses, and +prefixed
   * phone-like digit runs replaced by typed placeholders, with
   * per-category counts. Pure regexp codegen — scan-bound. Ordering
   * matters: emails first (they contain dots and digits), then IPs,
   * then phones; no placeholder re-triggers a later pattern. */
  def redactPii(text: Column): Seq[(String, Column)] = Seq(
    "n_emails" -> regexp_count(text, lit(EmailRe)).cast("long"),
    "n_ips" -> regexp_count(text, lit(Ipv4Re)).cast("long"),
    "n_phones" -> regexp_count(text, lit(PhoneRe)).cast("long"),
    "redacted" -> regexp_replace(
      regexp_replace(
        regexp_replace(text, EmailRe, "<EMAIL>"),
        Ipv4Re, "<IP>"),
      PhoneRe, "<PHONE>"),
  )

  // ---- PII v2: checked identifiers + secret literals --------------------
  // Same dialect discipline as v1 (RE2 ∩ Java, no \b, no backrefs;
  // oracle SQL interpolates these SAME constants). Candidate regexes
  // deliberately over-match; the CHECK (Luhn, IBAN mod-97, entropy
  // floor) decides counts and redaction — pattern-only card/IBAN
  // detectors flag every 16-digit run, which is useless on crawl text.
  /** 13-19 digits with optional single space/hyphen separators. */
  private[graft] val CardRe = "[0-9]([ -]?[0-9]){12,18}"
  /** Uncompressed-form IPv6: 5-8 hex groups (≥4 colons keeps
   * clock-like `12:30:45` strings out; `::`-compressed forms are out
   * of scope and documented so). */
  private[graft] val Ipv6Re = "([0-9A-Fa-f]{1,4}:){4,7}[0-9A-Fa-f]{1,4}"
  /** IBAN shape: country code + 2 check digits + 11-30 alphanumerics
   * (shortest real IBAN is 15 chars, longest 33). */
  private[graft] val IbanRe = "[A-Z]{2}[0-9]{2}[A-Z0-9]{11,30}"
  /** API-key/secret candidate: a 32+-char run over the base64/url
   * token alphabet. */
  private[graft] val SecretRe = "[A-Za-z0-9+/=_-]{32,}"

  /** Luhn checksum over a card CANDIDATE (separators stripped):
   * from the right, double every second digit (−9 when > 9); valid
   * iff the sum ≡ 0 (mod 10). Pure integer fold over the reversed
   * digit string — codegen'd, engine-portable. */
  private[graft] def luhnValid(cand: Column): Column =
    let(reverse(regexp_replace(cand, "[ -]", ""))) { d =>
      pmod(aggregate(sequence(lit(1), length(d)), lit(0), (acc, i) =>
        acc + let(ascii(d.substr(i, lit(1))) - lit(48)) { v =>
          when(pmod(i, lit(2)) === 0,
            when(v * 2 > 9, v * 2 - 9).otherwise(v * 2)).otherwise(v)
        }), lit(10)) === 0
    }

  /** ISO 13616 IBAN check: move the first 4 chars to the end, map
   * letters to 10..35, and fold the resulting digit string mod 97
   * per character (digits shift one decimal place, letters two) —
   * valid iff the remainder is 1. The per-char running mod keeps the
   * fold in Long range regardless of IBAN length. */
  private[graft] def ibanValid(cand: Column): Column =
    let(concat(cand.substr(lit(5), length(cand) - 4),
        cand.substr(lit(1), lit(4)))) { r =>
      aggregate(sequence(lit(1), length(r)), lit(0L), (acc, i) =>
        let(ascii(r.substr(i, lit(1))).cast("long")) { a =>
          when(a.between(48, 57), pmod(acc * 10 + a - 48, lit(97L)))
            .otherwise(pmod(acc * 100 + a - 55, lit(97L)))
        }) === 1L
    }

  /** Entropy floor for a secret CANDIDATE, integer-exact by design:
   * ≥ 16 distinct characters (≥ 4 bits of max-entropy — a float
   * Shannon estimate would gate-hash-drift at the threshold) AND all
   * three of lower/upper/digit present (kills `aaaa…` runs and long
   * hex dumps of one case). The standard detect-secrets heuristic,
   * made engine-portable. */
  private[graft] def secretLike(cand: Column): Column =
    // the empty-delimiter split's empty-string artifacts differ by
    // engine — drop them before counting distinct symbols
    size(array_distinct(filter(split(cand, ""), x => length(x) > 0))) >= 16 &&
      regexp_count(cand, lit("[a-z]")) > 0 &&
      regexp_count(cand, lit("[A-Z]")) > 0 &&
      regexp_count(cand, lit("[0-9]")) > 0

  /** Literal-fold redaction: replace every CHECKED candidate (the
   * `valid`-filtered matches of `re`) with `tag` — regexp_replace
   * cannot condition on a checksum, so the replace is a fold of
   * literal `replace()` calls over the validated match list. */
  private def redactChecked(text: Column, re: String, tag: String,
      valid: Column => Column): Column =
    aggregate(filter(regexp_extract_all(text, lit(re), lit(0)), valid),
      text, (acc, c) => replace(acc, c, lit(tag)))

  /**
   * [[redactPii]] v2 — the crawl-curation breadth a 100-TB corpus
   * ships with: v1's email/IPv4/phone plus CHECKED credit cards
   * (Luhn), CHECKED IBANs (mod-97), uncompressed IPv6, and
   * high-entropy secret literals ([[secretLike]]). Counts are
   * per-class over the ORIGINAL text; `redacted` applies checked
   * literal folds first (longest classes first: secrets, cards,
   * IBANs — their candidates can embed shorter patterns), then the
   * regex classes in v1 order with IPv6 before IPv4. Pure
   * regexp/fold codegen — scan-bound, no shuffle, no UDF. Candidates
   * failing their check stay unredacted by design (a 16-digit run
   * that fails Luhn is a phone-ish number, not a card). */
  def redactPiiV2(text: Column): Seq[(String, Column)] = Seq(
    "n_emails" -> regexp_count(text, lit(EmailRe)).cast("long"),
    "n_ips" -> regexp_count(text, lit(Ipv4Re)).cast("long"),
    "n_phones" -> regexp_count(text, lit(PhoneRe)).cast("long"),
    "n_cards" -> size(filter(regexp_extract_all(text, lit(CardRe), lit(0)),
      luhnValid(_))).cast("long"),
    "n_ipv6" -> regexp_count(text, lit(Ipv6Re)).cast("long"),
    "n_ibans" -> size(filter(regexp_extract_all(text, lit(IbanRe), lit(0)),
      ibanValid(_))).cast("long"),
    "n_secrets" -> size(filter(regexp_extract_all(text, lit(SecretRe), lit(0)),
      secretLike(_))).cast("long"),
    "redacted" -> regexp_replace(
      regexp_replace(
        regexp_replace(
          regexp_replace(
            redactChecked(
              redactChecked(
                redactChecked(text, SecretRe, "<SECRET>", secretLike),
                CardRe, "<CARD>", luhnValid),
              IbanRe, "<IBAN>", ibanValid),
            EmailRe, "<EMAIL>"),
          Ipv6Re, "<IPV6>"),
        Ipv4Re, "<IP>"),
      PhoneRe, "<PHONE>"),
  )

  /** Total v2 PII hits per doc — the scalar [[graft.operators
   * .Pipeline.cleanCorpus]]'s optional `maxPiiHits` stage thresholds
   * on. One expression over the scan, no extra pass. */
  def piiHits(text: Column): Column =
    redactPiiV2(text).collect { case (n, c) if n.startsWith("n_") => c }
      .reduce(_ + _)

  /** Single-evaluation let-binding: evaluates `c` once and passes the
   * result to `f` via a one-element array + lambda, so expressions
   * that need their input twice (e.g. size + slice) don't recompute
   * an expensive child. */
  private def let(c: Column)(f: Column => Column): Column =
    element_at(transform(array(c), f), 1)

  /** Rolling k-char-gram hashes of `text` (position order): one
   * portable 60-bit hash per overlapping k-gram. */
  def gramHashes(text: Column, k: Int = 8): Column =
    // NB: sequence(0, n) with n < 0 counts DOWN in Spark — guard short
    // docs explicitly instead of relying on an empty sequence
    when(length(text) >= k,
      transform(sequence(lit(0), length(text) - k),
        i => hash60(text.substr(i + lit(1), lit(k)))))
      .otherwise(array().cast("array<long>"))

  /** Winnowing document fingerprint (Schleimer et al., MOSS): hash
   * every overlapping k-char gram, take the minimum hash of each
   * w-wide window, keep the distinct sorted minima. Robust to small
   * edits — shared fingerprints ⇒ shared passages. Requires
   * `length(text) >= k + w - 1`; shorter docs yield an empty array. */
  def winnowFingerprints(text: Column, k: Int = 8, w: Int = 4): Column =
    let(gramHashes(text, k)) { h =>
      when(size(h) >= w,
        array_sort(array_distinct(
          transform(sequence(lit(0), size(h) - w),
            j => array_min(slice(h, j + lit(1), lit(w)))))))
        .otherwise(array().cast("array<long>"))
    }
}
