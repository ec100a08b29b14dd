package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/**
 * Similarity search over an embedding column (`array<float>`).
 *
 * Two tiers, as a 100 TB pipeline needs:
 *  - [[cosineTopK]]: brute-force exact top-k for a SMALL query set —
 *    the query side is broadcast, the corpus scan stays partitioned,
 *    ranking is a per-query window. Cost O(|Q|·N), the right tool when
 *    |Q| is tens-to-thousands.
 *  - [[hyperplaneTopK]]: random-hyperplane LSH (sign sketches): corpus
 *    and queries hash to bucket keys; only same-bucket pairs score.
 *    Approximate, with multi-probe via several independent tables.
 *    This is the scale path when |Q| is large.
 */
object Similarity {

  /** Sequential-order dot product of two equal-length float arrays in
   * double precision (element-wise promote, left-to-right sum — the
   * deterministic order any sequential engine reproduces). Native
   * expression: one primitive loop, no intermediate array. */
  def dot(a: Column, b: Column): Column = graft.functions.VectorOps.dot(a, b)

  def l2norm(a: Column): Column = sqrt(dot(a, a))

  def cosine(a: Column, b: Column): Column = dot(a, b) / (l2norm(a) * l2norm(b))

  /**
   * Exact cosine top-k: for each query vector, the k nearest corpus
   * vectors (self-match excluded). The query set is broadcast — no
   * shuffle of the corpus; the heavy scan is embarrassingly parallel.
   */
  def cosineTopK(corpus: DataFrame, queries: DataFrame, k: Int): DataFrame = {
    val c = corpus.select(col("vec_id").as("vec_id"), col("embedding").as("v"))
      .withColumn("vn", l2norm(col("v")))
      .filter(col("vn") > 0) // cosine is undefined for zero vectors
    val q = queries.select(col("vec_id").as("query_id"), col("embedding").as("qv"))
      .withColumn("qn", l2norm(col("qv")))
      .filter(col("qn") > 0)
    // the ranking window shuffles N·|Q| rows — project down to the
    // three output columns first so the exchange never carries the
    // embeddings themselves (they've done their job in the dot)
    val scored = c.join(broadcast(q), col("vec_id") =!= col("query_id"))
      .withColumn("sim", dot(col("v"), col("qv")) / (col("vn") * col("qn")))
      .select(col("query_id"), col("vec_id"), col("sim"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("sim").desc, col("vec_id"))
    scored.withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("vec_id"), col("sim"), col("rank"))
      .orderBy(col("query_id"), col("rank"))
  }

  /** Deterministic pseudo-random hyperplane for (table, plane): ±1
   * components derived from the portable 60-bit md5 hash of
   * "table:plane:dim" — any SQL engine reproduces the same planes
   * (the oracle does, term for term). Precomputed driver-side and
   * shipped as an array literal: the alternative (a hash expression
   * per dimension per row) costs tables·planes·dims hashes per
   * vector. Planes are sized for up-to-[[MaxDims]] vectors; the dot
   * iterates over the vector's own length, so longer plane literals
   * are harmless. */
  val MaxDims = 1024
  private def planeSigns(table: Int, plane: Int): Array[Double] = {
    val md = java.security.MessageDigest.getInstance("MD5")
    Array.tabulate(MaxDims) { i =>
      val h = graft.functions.SimHash60.hash60(md, s"$table:$plane:$i".getBytes("UTF-8"))
      if (h % 2 == 1) 1.0 else -1.0
    }
  }

  /** Sign-sketch bucket key: `planes` sign bits of dot(v, r_p) per
   * hash table. Rademacher (±1) hyperplanes, deterministic. Vectors
   * beyond [[MaxDims]] would silently truncate against the fixed-size
   * plane literals, so they raise instead. */
  def sketchKey(v: Column, table: Int, planes: Int): Column = {
    val guard = when(size(v) > MaxDims,
      raise_error(concat(lit(s"sketchKey supports at most $MaxDims dims, got "),
        size(v).cast("string")))).otherwise(lit(""))
    concat_ws("", guard +: (0 until planes).map { p =>
      // size guard keeps the empty-vector bit '0' on both engines
      // (SQL's list_sum over an empty list is NULL, not 0.0)
      when(size(v) > 0 && dot(v, typedLit(planeSigns(table, p))) >= 0,
        lit("1")).otherwise(lit("0"))
    }: _*)
  }

  /**
   * Approximate cosine top-k via random-hyperplane LSH: `tables`
   * independent sketch tables of `planes` bits; same-bucket pairs are
   * scored exactly and ranked. Recall grows with tables, candidate
   * count shrinks with planes.
   */
  def hyperplaneTopK(corpus: DataFrame, queries: DataFrame, k: Int,
      tables: Int = 4, planes: Int = 8): DataFrame = {
    // Bucket frames drop the vectors after hashing: the multi-table
    // candidate dedup below shuffles (query_id, vec_id) pairs only.
    // Vectors rejoin once, against the (much smaller) deduped pair
    // set, instead of riding through the distinct exchange `tables`×.
    def bucketed(df: DataFrame, idName: String): DataFrame =
      df.select(col("vec_id").as(idName), col("embedding").as(s"${idName}_v"))
        .withColumn("tk", explode(array((0 until tables).map(t =>
          concat_ws("#", lit(t), sketchKey(col(s"${idName}_v"), t, planes))): _*)))
        .select(col(idName), col("tk"))
    val c = bucketed(corpus, "vec_id")
    val q = bucketed(queries, "query_id")
    val cand = c.join(q, Seq("tk")).filter(col("vec_id") =!= col("query_id"))
      .select(col("query_id"), col("vec_id"))
      .distinct()
    val scored = cand
      .join(corpus.select(col("vec_id"), col("embedding").as("vec_id_v")), Seq("vec_id"))
      .join(queries.select(col("vec_id").as("query_id"),
        col("embedding").as("query_id_v")), Seq("query_id"))
      .withColumn("sim", cosine(col("vec_id_v"), col("query_id_v")))
      .select(col("query_id"), col("vec_id"), col("sim")) // slim the window exchange
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("sim").desc, col("vec_id"))
    scored.withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("vec_id"), col("sim"), col("rank"))
      .orderBy(col("query_id"), col("rank"))
  }

  /**
   * IVF (inverted-file) approximate top-k: the scale path between
   * brute force and LSH. Centroids are broadcast; one corpus scan
   * assigns each vector to its nearest centroid (the inverted lists);
   * each query probes its `nprobe` nearest centroids and scores only
   * those lists. At cluster scale the probe join is keyed on
   * centroid id, so candidate scoring is co-partitioned and the
   * corpus never re-shuffles per query.
   *
   * Centroids are caller-supplied (`(vec_id, embedding)`-shaped):
   * real pipelines train them offline (k-means); the deterministic
   * choice here keeps the operator reproducible in plain SQL.
   */
  def ivfTopK(corpus: DataFrame, queries: DataFrame, centroids: DataFrame,
      k: Int, nprobe: Int = 2): DataFrame = {
    val cents = centsOf(centroids)
    probeLists(assignedOf(corpus, cents)
        .join(corpus.select(col("vec_id"), col("embedding").as("vec_id_v")),
          Seq("vec_id")),
      queries, cents, k, nprobe)
  }

  /**
   * RADIUS (range) search — every corpus vector with cosine
   * similarity ≥ `minSim` to each query, the recall-complete
   * retrieval mode top-k can't express (semantic-dedup thresholding,
   * "everything near this centroid" audits, near-neighbor graph
   * construction all want the FULL ball, not the first k). Exact
   * brute-force tier: queries broadcast, the corpus scan stays
   * partitioned, and because the radius predicate replaces the
   * ranking window there is NO exchange at all — the filter is the
   * output, a strictly better scale shape than [[cosineTopK]].
   * Output volume is the true ball size; pick `minSim` accordingly.
   */
  def rangeSearch(corpus: DataFrame, queries: DataFrame,
      minSim: Double): DataFrame = {
    val c = corpus.select(col("vec_id"), col("embedding").as("v"))
      .withColumn("vn", l2norm(col("v")))
      .filter(col("vn") > 0) // cosine is undefined for zero vectors
    val q = queries.select(col("vec_id").as("query_id"),
        col("embedding").as("qv"))
      .withColumn("qn", l2norm(col("qv")))
      .filter(col("qn") > 0)
    c.join(broadcast(q), col("vec_id") =!= col("query_id"))
      .withColumn("sim", dot(col("v"), col("qv")) / (col("vn") * col("qn")))
      .filter(col("sim") >= minSim)
      .select(col("query_id"), col("vec_id"), col("sim"))
  }

  /**
   * [[rangeSearch]] through IVF lists — the scale tier: each query
   * scores only its `nprobe` nearest centroids' inverted lists
   * (probe-list construction shared with [[ivfTopK]]), so the
   * per-query cost is the probed-list volume, not N. Same recall
   * contract as every IVF read: a ball member whose list wasn't
   * probed is missed — measure with [[ivfRecallAudit]]'s pattern
   * and raise `nprobe` if the measured recall isn't enough.
   */
  def ivfRangeSearch(corpus: DataFrame, queries: DataFrame,
      centroids: DataFrame, minSim: Double, nprobe: Int = 2): DataFrame = {
    val cents = centsOf(centroids)
    probeBall(assignedOf(corpus, cents)
        .join(corpus.select(col("vec_id"), col("embedding").as("vec_id_v")),
          Seq("vec_id")),
      queries, cents, minSim, nprobe)
  }

  /**
   * [[ivfRangeSearch]] against a PREBUILT [[ivfIndex]] — bit-identical
   * ball, none of the N·C assignment cost (the [[ivfTopKIndexed]]
   * relationship, with the same params/centroid-set integrity
   * guards).
   */
  def ivfRangeSearchIndexed(index: DataFrame, corpus: DataFrame,
      queries: DataFrame, centroids: DataFrame, minSim: Double,
      nprobe: Int = 2): DataFrame = {
    val cents = centsOf(centroids)
    probeBall(guardedIndex(index, cents)
        .join(corpus.select(col("vec_id"), col("embedding").as("vec_id_v")),
          Seq("vec_id")),
      queries, cents, minSim, nprobe)
  }

  /** The probed-lists radius scan ([[probeLists]] without the ranking
   * window — the filter is the output). */
  private def probeBall(lists: DataFrame, queries: DataFrame,
      cents: DataFrame, minSim: Double, nprobe: Int): DataFrame = {
    val wProbe = Window.partitionBy(col("query_id"))
      .orderBy(col("__csim").desc, col("cent_id"))
    val probes = scoredAgainst(cents, queries, "query_id")
      .withColumn("__rn", row_number().over(wProbe))
      .filter(col("__rn") <= nprobe)
      .select(col("query_id"), col("query_id_v"), col("cent_id"))
    lists.join(probes, Seq("cent_id"))
      .filter(col("vec_id") =!= col("query_id"))
      .withColumn("sim", cosine(col("vec_id_v"), col("query_id_v")))
      .filter(col("sim") >= minSim)
      .select(col("query_id"), col("vec_id"), col("sim"))
  }

  /**
   * The persistable IVF artifact: the corpus→centroid ASSIGNMENT frame
   * `(vec_id, cent_id, idx_params)` — the output of the N·C assignment
   * scan, which dominates every [[ivfTopK]] call on a standing corpus.
   * Save it (parquet / the store) next to the centroid table and probe
   * with [[ivfTopKIndexed]]: per query batch the corpus then costs one
   * skinny index join instead of re-scoring N·C. Same pattern as
   * [[Dedup.corpusIndex]] / [[Dedup.incrementalIndexed]]. `idx_params`
   * tags the artifact version so a probe against a foreign frame fails
   * loudly rather than silently mis-bucketing.
   */
  def ivfIndex(corpus: DataFrame, centroids: DataFrame): DataFrame =
    assignedOf(corpus, centsOf(centroids))
      .withColumn("idx_params", lit(ivfParams))

  /**
   * [[ivfTopK]] against a PREBUILT [[ivfIndex]] — bit-identical output
   * (the assignment is the same frame, persisted), none of the
   * assignment cost. The centroid table must be the one the index was
   * built with: every index row's `cent_id` is scan-checked against
   * the broadcast centroid set, so a swapped/retrained centroid table
   * fails loudly instead of probing the wrong lists.
   */
  def ivfTopKIndexed(index: DataFrame, corpus: DataFrame,
      queries: DataFrame, centroids: DataFrame,
      k: Int, nprobe: Int = 2): DataFrame = {
    val cents = centsOf(centroids)
    probeLists(guardedIndex(index, cents).join(
        corpus.select(col("vec_id"), col("embedding").as("vec_id_v")),
        Seq("vec_id")),
      queries, cents, k, nprobe)
  }

  /** The [[ivfTopKIndexed]] integrity guards, shared with the radius
   * read: params-version scan-check plus centroid-set membership
   * riding the broadcast join (no driver action) — a swapped or
   * retrained centroid table fails loudly instead of probing the
   * wrong lists. */
  private def guardedIndex(index: DataFrame, cents: DataFrame): DataFrame = {
    val idx0 =
      if (index.columns.contains("idx_params"))
        index.where(assert_true(col("idx_params") === lit(ivfParams),
          concat(lit("ivfIndex built as "), col("idx_params"),
            lit(s", probed as $ivfParams"))).isNull)
      else index
    idx0.select(col("vec_id"), col("cent_id"))
      .join(broadcast(cents.select(col("cent_id"),
        lit(1).as("__cent_ok"))), Seq("cent_id"), "left")
      .where(assert_true(col("__cent_ok").isNotNull,
        concat(lit("ivfIndex references centroid "), col("cent_id"),
          lit(" absent from the supplied centroid table"))).isNull)
      .select(col("vec_id"), col("cent_id"))
  }

  /**
   * Incremental [[ivfIndex]] maintenance: assign ONLY the new batch
   * (batch·C work, never the standing corpus) and upsert it into the
   * stored index — batch vec_ids replace their existing rows, so
   * re-ingested vectors re-assign cleanly. The admission-pipeline
   * complement of [[Dedup.incrementalIndexed]]: a standing ANN corpus
   * pays per batch what the batch costs. Same params guard as
   * [[ivfTopKIndexed]].
   */
  def ivfIndexUpsert(index: DataFrame, batch: DataFrame,
      centroids: DataFrame): DataFrame = {
    val guarded =
      if (index.columns.contains("idx_params"))
        index.where(assert_true(col("idx_params") === lit(ivfParams),
          concat(lit("ivfIndex built as "), col("idx_params"),
            lit(s", upserted as $ivfParams"))).isNull)
      else index.withColumn("idx_params", lit(ivfParams))
    val fresh = ivfIndex(batch, centroids)
    // anti-join on the RAW batch's vec_ids, not fresh's: assignedOf
    // drops zero-norm embeddings, so a re-ingested vector whose new
    // embedding is zero-norm must still RETIRE its stale index row
    // (a from-scratch rebuild would not index it at all)
    guarded.select("vec_id", "cent_id", "idx_params")
      .join(batch.select(col("vec_id")).distinct(), Seq("vec_id"), "left_anti")
      .unionByName(fresh)
  }

  /**
   * TAKEDOWN propagation for the IVF index: retire the listed
   * vec_ids. Assignment is per-vector local (nearest centroid reads
   * nothing outside the row), so the anti-join is the exact delete:
   * post-delete ≡ from-scratch [[ivfIndex]] over corpus ∖ ids
   * (spec-pinned). Centroids are NOT retrained — the standing-index
   * contract everywhere in this family (a retrain is a new index).
   */
  def ivfIndexDelete(index: DataFrame, ids: DataFrame,
      id: Column): DataFrame =
    index.join(ids.select(id.as("vec_id")).distinct(),
      Seq("vec_id"), "left_anti")

  /**
   * Product-quantization encode (Jégou et al. 2011, "Product
   * Quantization for Nearest Neighbor Search", TPAMI 33(1)): each
   * d-dim vector compresses to `m` small codes — subspace `s` keeps
   * only the index of its nearest codeword over dims
   * `[s·d/m, (s+1)·d/m)`. At 100 TB this is THE memory step between
   * IVF and brute force: a 64-dim float vector (256 B) becomes m
   * bytes, so the scoring scan touches 1-2% of the raw volume.
   *
   * `codebook` rows are FULL-WIDTH `(vec_id, embedding)` vectors
   * (subspace s of codeword i = the i-th row's dims in subspace s) —
   * the deterministic caller-supplied shape [[ivfTopK]] uses; train
   * real per-subspace codebooks with [[pqTrain]]. Codewords get dense
   * indexes by ascending `vec_id` (one bounded row_number over the
   * broadcast-sized codebook). Distances are micro-quantized longs
   * (`round(d2·10⁶)`, the kmeans-gate construction), so argmin and
   * every downstream ADC sum are integer-exact and engine-portable.
   * `d` must be divisible by `m` (trailing dims are ignored
   * otherwise). Plan shape: one broadcast crossJoin scored map-side
   * (N·K rows exploded to N·K·m SKINNY rows, no vectors), a
   * map-side-combined argmin, one N-row collect_list — the corpus
   * never shuffles its vectors.
   */
  def pqEncode(corpus: DataFrame, codebook: DataFrame, m: Int): DataFrame = {
    require(m >= 1, "m must be >= 1")
    // m argmins ride ONE groupBy(vec_id) with map-side partial combine
    // — the IVF-assignment shape. (A per-(vector, subspace) explode
    // would shuffle N·K·m skinny rows; at 100× that exchange, not the
    // arithmetic, dominated the whole encode by ~10×.) Per-side
    // self-dots are precomputed once per row/codeword instead of once
    // per (row, codeword) — same doubles, 1/3 the dot work.
    val cb = rankedCodebook(codebook)
      .withColumn("cva", selfSubDots(col("cv"), m))
    val withD = corpus.select(col("vec_id"), col("embedding").as("v"))
      .withColumn("va", selfSubDots(col("v"), m))
      .crossJoin(cb)
      .select(col("vec_id") +: col("code_ix") +:
        (0 until m).map(s => crossSubD2Micro(col("v"), col("cv"),
          col("va"), col("cva"), lit(s), m).as(s"__d$s")): _*)
    val aggs = (0 until m).map(s =>
      min(struct(col(s"__d$s").as("d"), col("code_ix").as("c"))).as(s"__m$s"))
    withD.groupBy(col("vec_id")).agg(aggs.head, aggs.tail: _*)
      .select(col("vec_id"),
        array((0 until m).map(s => col(s"__m$s.c")): _*).as("codes"))
  }

  /**
   * Asymmetric-distance (ADC) top-k over PQ codes: each query builds
   * its m×K subspace-distance lookup table against the codebook
   * (broadcast — #queries·K tiny rows), and every corpus CODE row
   * scores as the integer sum of m table lookups. The corpus scan
   * reads codes only — never embeddings — which is the whole point:
   * at 100 TB the exact vectors stay cold while the m-byte codes
   * stream through one projection. Approximate by construction
   * (quantization error); re-rank the top candidates against exact
   * vectors downstream when recall matters. Ties and ranking are
   * integer-exact (`adc_d2` is the single IEEE division micro/10⁶).
   */
  def pqTopK(codes: DataFrame, queries: DataFrame, codebook: DataFrame,
      m: Int, k: Int): DataFrame = {
    require(m >= 1 && k >= 1, "m and k must be >= 1")
    val lut = queries
      .select(col("vec_id").as("query_id"), col("embedding").as("qv"))
      .crossJoin(rankedCodebook(codebook))
      .select(col("query_id"), col("code_ix"),
        posexplode(transform(sequence(lit(0), lit(m - 1)),
          s => subD2Micro(col("qv"), col("cv"), s, m))))
      .toDF("query_id", "code_ix", "s", "d2u")
      .groupBy(col("query_id"))
      .agg(transform(array_sort(collect_list(
          struct(col("s"), col("code_ix"), col("d2u")))),
        x => x.getField("d2u")).as("lut")) // ordered by (s, code_ix)
      // K rides the LUT itself (|lut| = m·K): no per-call
      // codebook.count() driver action, so composed probes (rerank =
      // pqTopK + join) launch one fewer job per query batch
      .withColumn("kc", (size(col("lut")) / lit(m)).cast("int"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("d2u").asc, col("vec_id"))
    codes.crossJoin(broadcast(lut))
      .filter(col("vec_id") =!= col("query_id"))
      .withColumn("d2u", aggregate(sequence(lit(0), lit(m - 1)), lit(0L),
        (acc, s) => acc + element_at(col("lut"),
          s * col("kc") + element_at(col("codes"), s + 1) + 1)))
      .select(col("query_id"), col("vec_id"), col("d2u"))
      .withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("vec_id"),
        (col("d2u").cast("double") / lit(1000000.0)).as("adc_d2"),
        col("rank"))
      .orderBy(col("query_id"), col("rank"))
  }

  /**
   * IVF-PQ top-k — the production composition (the FAISS `IVFx,PQy`
   * shape): queries probe their `nprobe` nearest IVF lists
   * ([[ivfIndex]]'s persisted assignment), and ONLY in-list vectors
   * score, by PQ asymmetric distance over their m-byte codes
   * ([[pqEncode]]'s persisted artifact). Neither corpus artifact is
   * recomputed and corpus EMBEDDINGS are never read — the scan cost
   * is (lists probed) × (codes per list) integer lookups. Candidate
   * scoring joins on centroid id, so it is co-partitioned with the
   * code lists; re-rank survivors against exact vectors downstream
   * when recall matters.
   */
  def ivfPqTopK(index: DataFrame, codes: DataFrame, queries: DataFrame,
      centroids: DataFrame, codebook: DataFrame, m: Int, k: Int,
      nprobe: Int = 2): DataFrame = {
    require(m >= 1 && k >= 1, "m and k must be >= 1")
    val cents = centsOf(centroids)
    val lut = queries
      .select(col("vec_id").as("query_id"), col("embedding").as("qv"))
      .crossJoin(rankedCodebook(codebook))
      .select(col("query_id"), col("code_ix"),
        posexplode(transform(sequence(lit(0), lit(m - 1)),
          s => subD2Micro(col("qv"), col("cv"), s, m))))
      .toDF("query_id", "code_ix", "s", "d2u")
      .groupBy(col("query_id"))
      .agg(transform(array_sort(collect_list(
          struct(col("s"), col("code_ix"), col("d2u")))),
        x => x.getField("d2u")).as("lut"))
      // |lut| = m·K — same no-driver-action K derivation as pqTopK
      .withColumn("kc", (size(col("lut")) / lit(m)).cast("int"))
    val wProbe = Window.partitionBy(col("query_id"))
      .orderBy(col("__csim").desc, col("cent_id"))
    val probes = scoredAgainst(cents, queries, "query_id")
      .withColumn("__rn", row_number().over(wProbe))
      .filter(col("__rn") <= nprobe)
      .select(col("query_id"), col("cent_id"))
      .join(lut, "query_id")
    val listCodes = index.select(col("vec_id"), col("cent_id"))
      .join(codes, Seq("vec_id"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("d2u").asc, col("vec_id"))
    listCodes.join(broadcast(probes), Seq("cent_id"))
      .filter(col("vec_id") =!= col("query_id"))
      .withColumn("d2u", aggregate(sequence(lit(0), lit(m - 1)), lit(0L),
        (acc, s) => acc + element_at(col("lut"),
          s * col("kc") + element_at(col("codes"), s + 1) + 1)))
      .select(col("query_id"), col("vec_id"), col("d2u"))
      .withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("vec_id"),
        (col("d2u").cast("double") / lit(1000000.0)).as("adc_d2"),
        col("rank"))
      .orderBy(col("query_id"), col("rank"))
  }

  /**
   * PQ with exact re-ranking — the standard recall-recovery step: ADC
   * over the codes produces a `shortlist`-sized candidate set per
   * query (cheap, embeddings never read), and ONLY those candidates
   * re-score exactly (cosine) against the true vectors. The exact
   * pass touches `#queries · shortlist` embeddings — a semi-join
   * sliver of the corpus — so recall approaches exact search at a
   * fraction of brute-force cost. Output is [[cosineTopK]]-shaped
   * (`sim`, ranked desc).
   */
  def pqTopKRerank(codes: DataFrame, corpus: DataFrame, queries: DataFrame,
      codebook: DataFrame, m: Int, k: Int, shortlist: Int): DataFrame = {
    require(shortlist >= k, "shortlist must be >= k")
    val cand = pqTopK(codes, queries, codebook, m, shortlist)
      .select(col("query_id"), col("vec_id"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("sim").desc, col("vec_id"))
    cand
      .join(corpus.select(col("vec_id"), col("embedding").as("v")), Seq("vec_id"))
      .join(broadcast(queries.select(col("vec_id").as("query_id"),
        col("embedding").as("qv"))), Seq("query_id"))
      .withColumn("sim", cosine(col("v"), col("qv")))
      .select(col("query_id"), col("vec_id"), col("sim"))
      .withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("vec_id"), col("sim"), col("rank"))
      .orderBy(col("query_id"), col("rank"))
  }

  /**
   * Per-vector IVF residuals `r = x − centroid(x)` over a prebuilt
   * [[ivfIndex]] assignment — the vectors residual PQ quantizes
   * (Jégou et al. 2011 §IV: encoding the residual instead of the raw
   * vector concentrates the quantizer's dynamic range on the
   * within-list displacement, the accuracy step that makes IVF-PQ
   * production-grade in FAISS). Double-precision elementwise
   * subtraction (engine-exact), centroids ride the broadcast.
   * Zero-norm vectors have no assignment and emit no residual,
   * matching every IVF probe's contract.
   */
  def ivfResiduals(corpus: DataFrame, index: DataFrame,
      centroids: DataFrame): DataFrame =
    corpus.select(col("vec_id"), col("embedding").as("__x"))
      .join(index.select(col("vec_id"), col("cent_id")), Seq("vec_id"))
      .join(centsOf(centroids).select(col("cent_id"), col("cv")),
        Seq("cent_id"))
      .select(col("vec_id"), col("cent_id"),
        zip_with(col("__x"), col("cv"),
          (a, b) => a.cast("double") - b.cast("double")).as("embedding"))

  /** [[pqEncode]] over IVF residuals: the codes store each vector's
   * within-list displacement. `codebook` must be residual-space
   * (e.g. a deterministic subset of [[ivfResiduals]], or
   * [[pqTrain]] over them). */
  def pqEncodeResidual(corpus: DataFrame, index: DataFrame,
      centroids: DataFrame, codebook: DataFrame, m: Int): DataFrame =
    pqEncode(ivfResiduals(corpus, index, centroids)
      .select(col("vec_id"), col("embedding")), codebook, m)

  /**
   * Residual IVF-PQ top-k — the full FAISS composition: queries probe
   * their `nprobe` lists, and within each probed list the query's OWN
   * residual against THAT centroid builds the ADC lookup table, so
   * candidate distances approximate ‖(q−c) − (x−c)‖² = ‖q−x‖² with
   * the quantizer spending its codes on the small residual vectors
   * rather than the raw space. Costs one LUT per (query, probed
   * list) — #queries·nprobe·K·m bounded rows, broadcast — while the
   * corpus still contributes only its m-byte codes. Integer micro
   * distances end to end, like [[pqTopK]].
   */
  def ivfPqTopKResidual(index: DataFrame, codes: DataFrame,
      queries: DataFrame, centroids: DataFrame, codebook: DataFrame,
      m: Int, k: Int, nprobe: Int = 2): DataFrame = {
    require(m >= 1 && k >= 1, "m and k must be >= 1")
    val cents = centsOf(centroids)
    val wProbe = Window.partitionBy(col("query_id"))
      .orderBy(col("__csim").desc, col("cent_id"))
    val probes = scoredAgainst(cents, queries, "query_id")
      .withColumn("__rn", row_number().over(wProbe))
      .filter(col("__rn") <= nprobe)
      .select(col("query_id"), col("cent_id"),
        zip_with(col("query_id_v"), col("cv"),
          (a, b) => a.cast("double") - b.cast("double")).as("qrv"))
    val lut = probes
      .crossJoin(rankedCodebook(codebook))
      .select(col("query_id"), col("cent_id"), col("code_ix"),
        posexplode(transform(sequence(lit(0), lit(m - 1)),
          s => subD2Micro(col("qrv"), col("cv"), s, m))))
      .toDF("query_id", "cent_id", "code_ix", "s", "d2u")
      .groupBy(col("query_id"), col("cent_id"))
      .agg(transform(array_sort(collect_list(
          struct(col("s"), col("code_ix"), col("d2u")))),
        x => x.getField("d2u")).as("lut"))
      .withColumn("kc", (size(col("lut")) / lit(m)).cast("int"))
    val listCodes = index.select(col("vec_id"), col("cent_id"))
      .join(codes, Seq("vec_id"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("d2u").asc, col("vec_id"))
    listCodes.join(broadcast(lut), Seq("cent_id"))
      .filter(col("vec_id") =!= col("query_id"))
      .withColumn("d2u", aggregate(sequence(lit(0), lit(m - 1)), lit(0L),
        (acc, s) => acc + element_at(col("lut"),
          s * col("kc") + element_at(col("codes"), s + 1) + 1)))
      .select(col("query_id"), col("vec_id"), col("d2u"))
      .withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("vec_id"),
        (col("d2u").cast("double") / lit(1000000.0)).as("adc_d2"),
        col("rank"))
      .orderBy(col("query_id"), col("rank"))
  }

  /**
   * Incremental PQ code maintenance — [[ivfIndexUpsert]]'s complement
   * for the code artifact: encode ONLY the new batch (batch·K·m work,
   * never the standing corpus) and upsert into the stored code frame;
   * every raw-batch vec_id replaces (or re-creates) its prior row, so
   * re-ingested vectors re-encode cleanly. Equal to a from-scratch
   * [[pqEncode]] of the merged corpus (the gate's contract) because
   * encoding is per-row deterministic in the codebook.
   */
  def pqUpsert(codes: DataFrame, batch: DataFrame, codebook: DataFrame,
      m: Int): DataFrame = {
    require(m >= 1, "m must be >= 1")
    val fresh = pqEncode(batch, codebook, m)
    codes.join(batch.select(col("vec_id")).distinct(), Seq("vec_id"),
        "left_anti")
      .unionByName(fresh)
  }

  /**
   * TAKEDOWN propagation for the PQ code artifact: retire the listed
   * vec_ids — encoding is per-row deterministic in the codebook, so
   * the anti-join is the exact delete: post-delete ≡ from-scratch
   * [[pqEncode]] over corpus ∖ ids (spec-pinned). The codebook is NOT
   * retrained, same contract as [[ivfIndexDelete]].
   */
  def pqDelete(codes: DataFrame, ids: DataFrame, id: Column): DataFrame =
    codes.join(ids.select(id.as("vec_id")).distinct(),
      Seq("vec_id"), "left_anti")

  /**
   * Measured PQ recall — [[graft.operators.Dedup.lshRecallAudit]]'s
   * ANN counterpart, so the m/K presets ship with a NUMBER: ADC top-k
   * over the codes vs exact cosine top-k over the true vectors, on
   * the caller's (deterministic) query sample. `recall_micro` =
   * found∩truth / |truth| in ppm. Truth excludes zero-norm corpus
   * vectors (cosine undefined — [[cosineTopK]]'s filter); extra ADC
   * rows outside the truth set only lower recall, never error. The
   * exact pass costs one broadcast scan over the sample — audit-
   * sized, not corpus-pair-sized.
   */
  def pqRecallAudit(codes: DataFrame, corpus: DataFrame,
      queries: DataFrame, codebook: DataFrame, m: Int, k: Int): DataFrame =
    recallOf(cosineTopK(corpus, queries, k),
      pqTopK(codes, queries, codebook, m, k))

  /** [[pqRecallAudit]] for the PLAIN IVF probe (exact vectors, list
   * restriction only): isolates the recall cost of `nprobe` alone,
   * so the list-count/nprobe preset ships with its own number before
   * PQ quantization enters. */
  def ivfRecallAudit(index: DataFrame, corpus: DataFrame,
      queries: DataFrame, centroids: DataFrame, k: Int,
      nprobe: Int = 2): DataFrame =
    recallOf(cosineTopK(corpus, queries, k),
      ivfTopKIndexed(index, corpus, queries, centroids, k, nprobe))

  /** [[ivfPqRecallAudit]] for the RESIDUAL composition — the number
   * that justifies the residual encode (same codes budget, higher
   * recall, per Jégou §IV). */
  def ivfPqResidualRecallAudit(index: DataFrame, codes: DataFrame,
      corpus: DataFrame, queries: DataFrame, centroids: DataFrame,
      codebook: DataFrame, m: Int, k: Int, nprobe: Int = 2): DataFrame =
    recallOf(cosineTopK(corpus, queries, k),
      ivfPqTopKResidual(index, codes, queries, centroids, codebook, m, k,
        nprobe))

  /** [[pqRecallAudit]] for the composed IVF-PQ probe: how much recall
   * the list restriction + code quantization cost TOGETHER vs exact
   * cosine — the number that picks `nprobe`. */
  def ivfPqRecallAudit(index: DataFrame, codes: DataFrame,
      corpus: DataFrame, queries: DataFrame, centroids: DataFrame,
      codebook: DataFrame, m: Int, k: Int, nprobe: Int = 2): DataFrame =
    recallOf(cosineTopK(corpus, queries, k),
      ivfPqTopK(index, codes, queries, centroids, codebook, m, k, nprobe))

  /**
   * Semantic admission screen against a STANDING PQ index: each batch
   * vector ADC-probes the persisted codes ([[pqTopK]], k=1) and is
   * admitted iff its nearest standing neighbor sits FURTHER than
   * `maxD2Micro` (micro-quantized squared L2 — the integer domain
   * every PQ artifact already uses). Batch-scaled work on a
   * corpus-scale standing set: the corpus contributes its m-byte
   * codes to one broadcast-LUT scan, embeddings never read — the
   * [[graft.operators.Dedup.incremental]] shape for the semantic
   * tier. Batch vectors with no scoreable neighbor (empty standing
   * set) admit. A batch vec_id colliding with a standing vec_id is
   * screened against the OTHER standing vectors only (the probe's
   * self-exclusion), matching re-ingest semantics.
   */
  def admitSemantic(batch: DataFrame, codes: DataFrame,
      codebook: DataFrame, m: Int, maxD2Micro: Long): DataFrame = {
    require(maxD2Micro >= 0, "maxD2Micro must be >= 0")
    val nn = pqTopK(codes, batch, codebook, m, k = 1)
      .select(col("query_id").as("vec_id"),
        col("vec_id").as("nearest_id"),
        round(col("adc_d2") * lit(1000000.0)).cast("long").as("d2_micro"))
    batch.select(col("vec_id")).distinct()
      .join(nn, Seq("vec_id"), "left")
      .withColumn("admit",
        coalesce(col("d2_micro") > maxD2Micro, lit(true)))
  }

  private def recallOf(truth: DataFrame, found: DataFrame): DataFrame =
    truth.select(col("query_id"), col("vec_id"))
      .join(found.select(col("query_id"), col("vec_id"),
        lit(1L).as("__f")), Seq("query_id", "vec_id"), "left")
      .agg(count(lit(1)).as("true_pairs"),
        coalesce(sum(coalesce(col("__f"), lit(0L))), lit(0L))
          .as("found_pairs"))
      .withColumn("missed_pairs", col("true_pairs") - col("found_pairs"))
      .withColumn("recall_micro", when(col("true_pairs") > 0,
        graft.functions.ldiv(col("found_pairs") * lit(1000000L),
          col("true_pairs"))))

  /**
   * Real PQ codebook training: `m` INDEPENDENT per-subspace k-means
   * runs ([[Embeddings.kmeansRun]] on each dim slice), re-assembled
   * into [[pqEncode]]'s full-width `(vec_id, embedding)` artifact —
   * full-width code i concatenates every subspace's i-th centroid, so
   * slicing it back out recovers exactly the per-subspace codewords.
   * Deterministic (hash seeding, rank-ordered assembly); the m·iters
   * driver loop touches only centroid frames.
   */
  def pqTrain(corpus: DataFrame, m: Int, k: Int,
      maxIters: Int = 10): DataFrame = {
    require(m >= 1 && k >= 1, "m and k must be >= 1")
    val subCents: Seq[DataFrame] = (0 until m).map { s =>
      val sub = corpus.select(col("vec_id"),
        slice(col("embedding"), lit(s).cast("int") * subW(col("embedding"), m)
          + 1, subW(col("embedding"), m)).as("emb"))
      val labeled = Embeddings.kmeansRun(sub, col("vec_id"), col("emb"), k,
        maxIters)
      Embeddings.centroids(
        sub.join(labeled.select(col("vec_id"), col("label")), "vec_id"),
        col("emb"), col("label"))
        .select(col("lbl").cast("long").as("code_id"),
          col("cv").as(s"cv$s"))
    }
    // assemble: one row per code id, subspace centroids concatenated
    // in subspace order (a missing label in one subspace — an empty
    // cluster — drops that code id entirely, keeping widths uniform)
    subCents.reduce((a, b) => a.join(b, "code_id"))
      .select(col("code_id").as("vec_id"),
        concat((0 until m).map(s => col(s"cv$s")): _*)
          .cast("array<float>").as("embedding"))
  }

  private def subW(v: Column, m: Int): Column =
    floor(size(v) / lit(m)).cast("int")

  /** Codebook with dense `code_ix` by ascending codeword id — one
   * bounded row_number over the broadcast-sized artifact. */
  private def rankedCodebook(codebook: DataFrame): DataFrame =
    broadcast(codebook
      .select(col("vec_id").as("code_id"), col("embedding").as("cv"))
      .withColumn("code_ix", (row_number().over(
        Window.orderBy(col("code_id"))) - 1).cast("int"))
      .drop("code_id"))

  /** Micro-quantized squared L2 between subspace `s` slices of `v`
   * and `cv` — the kmeans-gate construction (`x·x − 2x·y + y·y` on
   * native dots, one round to integer micro), so comparisons and sums
   * downstream are integer-exact on any engine. */
  private def subD2Micro(v: Column, cv: Column, s: Column, m: Int): Column = {
    val w = subW(v, m)
    val a = slice(v, s * w + 1, w)
    val b = slice(cv, s * w + 1, w)
    round((dot(a, a) - lit(2.0) * dot(a, b) + dot(b, b)) * lit(1000000.0))
      .cast("long")
  }

  /** Per-subspace self dot products `a_s·a_s`, computed once per side
   * of [[pqEncode]]'s cross join. */
  private def selfSubDots(v: Column, m: Int): Column =
    transform(sequence(lit(0), lit(m - 1)), s => {
      val w = subW(v, m)
      val a = slice(v, s * w + 1, w)
      dot(a, a)
    })

  /** [[subD2Micro]] with both self terms read from precomputed
   * arrays — bit-identical doubles (the dots evaluate the same),
   * evaluated N+K times instead of N·K. */
  private def crossSubD2Micro(v: Column, cv: Column, va: Column,
      cva: Column, s: Column, m: Int): Column = {
    val w = subW(v, m)
    val a = slice(v, s * w + 1, w)
    val b = slice(cv, s * w + 1, w)
    round((element_at(va, s + 1) - lit(2.0) * dot(a, b) +
      element_at(cva, s + 1)) * lit(1000000.0)).cast("long")
  }

  private val ivfParams = "ivf:v1:argmax-cosine:tie-min-cent"

  private def centsOf(centroids: DataFrame): DataFrame =
    broadcast(centroids
      .select(col("vec_id").as("cent_id"), col("embedding").as("cv"))
      .withColumn("cn", l2norm(col("cv")))
      .filter(col("cn") > 0)) // a zero centroid has no direction

  private def scoredAgainst(cents: DataFrame, df: DataFrame,
      idName: String): DataFrame =
    df.select(col("vec_id").as(idName), col("embedding").as(s"${idName}_v"))
      .withColumn("__n", l2norm(col(s"${idName}_v")))
      .filter(col("__n") > 0) // cosine is undefined for zero vectors
      .crossJoin(cents)
      .withColumn("__csim",
        dot(col(s"${idName}_v"), col("cv")) / (col("__n") * col("cn")))

  // corpus assignment keeps ONE centroid per vector, so it lowers to
  // an aggregate with map-side partial combine: the broadcast-join
  // stage reduces N·C scored rows to N before any exchange. (A
  // row_number window here would shuffle the whole N·C cross
  // product — the difference between IVF build being scan-bound and
  // being the job's dominant exchange at corpus scale.) The struct
  // max replicates the window's tie-break exactly: highest __csim,
  // then LOWEST cent_id via the negated id. The N·C scored stream
  // carries only (id, cent_id, sim) — dragging the vector itself
  // through the cross product writes C copies of every embedding
  // into the stage's rows (a ~10× memory-bandwidth tax at 64 dims ×
  // C=256); the vector instead rejoins the N-row assignment by id.
  private def assignedOf(corpus: DataFrame, cents: DataFrame): DataFrame =
    scoredAgainst(cents, corpus, "vec_id")
      .select(col("vec_id"), col("cent_id"), col("__csim"))
      .groupBy(col("vec_id"))
      .agg(max(struct(col("__csim").as("s"),
        (-col("cent_id")).as("negid"))).as("m"))
      .select(col("vec_id"), (-col("m.negid")).as("cent_id"))

  // queries probe nprobe > 1 lists and the query set is small by
  // construction — the window shuffle is over #queries · C rows
  private def probeLists(lists: DataFrame, queries: DataFrame,
      cents: DataFrame, k: Int, nprobe: Int): DataFrame = {
    val wProbe = Window.partitionBy(col("query_id"))
      .orderBy(col("__csim").desc, col("cent_id"))
    val probes = scoredAgainst(cents, queries, "query_id")
      .withColumn("__rn", row_number().over(wProbe))
      .filter(col("__rn") <= nprobe)
      .select(col("query_id"), col("query_id_v"), col("cent_id"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("sim").desc, col("vec_id"))
    lists.join(probes, Seq("cent_id"))
      .filter(col("vec_id") =!= col("query_id"))
      .withColumn("sim", cosine(col("vec_id_v"), col("query_id_v")))
      .select(col("query_id"), col("vec_id"), col("sim")) // slim the window exchange
      .withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("vec_id"), col("sim"), col("rank"))
      .orderBy(col("query_id"), col("rank"))
  }

  /**
   * Contrastive hard-negative mining: for each anchor (query) vector,
   * the `k` corpus vectors MOST similar to it among those with a
   * DIFFERENT label — the negatives that sit closest to the decision
   * boundary, which is what contrastive / metric-learning training
   * wants sampled far above random negatives. Same execution shape as
   * [[cosineTopK]] (anchors broadcast, corpus scan stays partitioned,
   * per-anchor window ranks) with the label-mismatch predicate fused
   * into the broadcast join, so excluded same-label rows never score.
   * For anchor sets too large to broadcast, bucket with
   * [[hyperplaneTopK]]'s sketches first and apply the same label
   * filter on the candidate pairs.
   */
  def hardNegatives(corpus: DataFrame, queries: DataFrame, k: Int): DataFrame = {
    val c = corpus.select(col("vec_id"), col("embedding").as("v"),
        col("label").as("neg_label"))
      .withColumn("vn", l2norm(col("v")))
      .filter(col("vn") > 0) // cosine is undefined for zero vectors
    val q = queries.select(col("vec_id").as("query_id"),
        col("embedding").as("qv"), col("label").as("query_label"))
      .withColumn("qn", l2norm(col("qv")))
      .filter(col("qn") > 0)
    val scored = c.join(broadcast(q), col("neg_label") =!= col("query_label"))
      .withColumn("sim", dot(col("v"), col("qv")) / (col("vn") * col("qn")))
      .select(col("query_id"), col("query_label"), col("vec_id"),
        col("neg_label"), col("sim")) // slim the window exchange
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("sim").desc, col("vec_id"))
    scored.withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("query_label"), col("vec_id"),
        col("neg_label"), col("sim"), col("rank"))
      .orderBy(col("query_id"), col("rank"))
  }

  /**
   * Cross-corpus cosine pairs — align TWO large embedding tables
   * (snapshot-vs-snapshot drift pairs, caption↔image retrieval in a
   * shared space, translation mining) where NEITHER side fits a
   * broadcast: both sides hash into the same hyperplane-LSH buckets,
   * only same-bucket (left, right) pairs score, and the exact cosine
   * verifies ≥ `threshold`. The two-table analog of
   * [[cosineNearDupPairs]] — [[cosineTopK]]/[[hardNegatives]] cover
   * the small-query-side case; this is the both-sides-corpus-scale
   * shape (one bucket-keyed equi-join, candidate ids shuffle bare,
   * vectors rejoin only the deduped candidate set).
   */
  def crossCosinePairs(left: DataFrame, right: DataFrame, threshold: Double,
      tables: Int = 4, planes: Int = 8): DataFrame =
    crossCosinePairs(left, right, threshold, tables, planes,
      maxBucket = Int.MaxValue)

  /** Smallest b in [0, maxExt] with m ≤ 2^b, as a pure-integer CASE
   * ladder (no floating log2 — any SQL engine mirrors it exactly). */
  private def refineBitsCol(m: Column, maxExt: Int): Column =
    (maxExt - 1 to 0 by -1).foldLeft(lit(maxExt)) {
      (acc, b) => when(m <= lit(1L << b), lit(b)).otherwise(acc)
    }

  /** One row per (vector, hash table): id/vector/norm, the table id
   * `__t`, and the base `planes`-bit bucket key `tk`. Only the base
   * bits are hashed here — the [[RefineBits]]-deep sketch is computed
   * lazily in [[extendKeys]], and only for rows whose bucket turned
   * out oversized (on a healthy corpus that's nobody, so the bounded
   * overloads cost one count aggregate over the base path). Zero-norm
   * rows are dropped — they can never pass a cosine threshold. */
  private def explodedBuckets(df: DataFrame, idName: String, tables: Int,
      planes: Int): DataFrame =
    df.select(col("vec_id").as(idName), col("embedding").as(s"${idName}_v"))
      .withColumn(s"${idName}_n", l2norm(col(s"${idName}_v")))
      .filter(col(s"${idName}_n") > 0)
      .withColumn("__t", explode(array((0 until tables).map(lit): _*)))
      .withColumn("tk", (0 until tables).foldLeft(lit("")) { (acc, t) =>
        when(col("__t") === t, concat_ws("#", lit(t),
          sketchKey(col(s"${idName}_v"), t, planes))).otherwise(acc)
      })

  /** Extend each bucket row's key by enough further sketch bits to
   * re-bound the bucket at ~`maxBucket` rows: `sizes(tk, count)` →
   * bits = smallest b with ceil(count/maxBucket) ≤ 2^b (capped at the
   * sketch length), key2 = tk | next-b-bits. The size table is
   * broadcast — there are at most tables·2^planes base buckets — and
   * the deep sketch evaluates per row only under the bits > 0 branch,
   * i.e. only inside genuinely oversized buckets. */
  private def extendKeys(buckets: DataFrame, v: Column, sizes: DataFrame,
      tables: Int, planes: Int, maxBucket: Int): DataFrame = {
    val m = floor((col("count") + lit(maxBucket.toLong) - 1L) /
      lit(maxBucket.toDouble)).cast("long")
    val bz = sizes.select(col("tk"),
      refineBitsCol(m, RefineBits - planes).as("__bits"))
    val deepExt = (0 until tables).foldLeft(lit("")) { (acc, t) =>
      when(col("__t") === t, sketchKey(v, t, RefineBits)
        .substr(lit(planes + 1), col("__bits"))).otherwise(acc)
    }
    buckets.join(broadcast(bz), Seq("tk"))
      .withColumn("k2", concat(col("tk"), lit("|"),
        when(col("__bits") > 0, deepExt).otherwise(lit(""))))
      .drop("__bits")
  }

  /**
   * [[crossCosinePairs]] with a BOUNDED bucket size, the same
   * discipline as [[semanticNearDupPairs]]'s `maxBucket`: any sketch
   * bucket holding more than `maxBucket` rows (both sides counted —
   * the join does left·right work in it) is deepened by further bits
   * of the SAME table's sketch until ceil(size/maxBucket) ≤ 2^bits.
   * On a replica-heavy corpus the hot buckets are near-duplicate
   * cliques whose members agree on every sign bit, so true pairs ride
   * the deepened key together; what the refinement sheds is the
   * dissimilar bulk that happened to share a short prefix — exactly
   * the candidates an exact verify would reject anyway. Recall loss
   * is confined to oversized buckets and to pairs that disagree on an
   * extension bit (the lower-cosine tail). `maxBucket` = ∞ is the
   * exact LSH candidate set.
   *
   * In-bucket verify (the discipline the MinHash family uses): the
   * vectors ride THROUGH the bucket join and the exact cosine is
   * scored inline in the join stage, so the candidate flood never
   * hits an exchange — only pairs that already pass the threshold
   * reach the cross-table distinct. The alternative (dedup bare id
   * pairs first, rejoin vectors after) shuffles every candidate
   * twice and re-attaches both vectors with two more shuffle joins;
   * on replica-heavy corpora (where most of a bucket IS one clique)
   * that candidate exchange is the job. Norms are computed once per
   * row before the table explode, so the per-pair work is one
   * codegen'd dot. The result set is bit-identical either way —
   * scoring is deterministic, so the multi-table duplicates the
   * distinct collapses carry equal sims.
   */
  def crossCosinePairs(left: DataFrame, right: DataFrame, threshold: Double,
      tables: Int, planes: Int, maxBucket: Int): DataFrame = {
    require(maxBucket > 0, "maxBucket must be positive")
    val joined =
      if (maxBucket == Int.MaxValue) {
        // unbounded: skip the sizing pass and the 16-bit sketch carry
        def bucketed(df: DataFrame, idName: String): DataFrame =
          df.select(col("vec_id").as(idName),
              col("embedding").as(s"${idName}_v"))
            .withColumn(s"${idName}_n", l2norm(col(s"${idName}_v")))
            .filter(col(s"${idName}_n") > 0)
            .withColumn("tk", explode(array((0 until tables).map(t =>
              concat_ws("#", lit(t),
                sketchKey(col(s"${idName}_v"), t, planes))): _*)))
        bucketed(left, "id1").join(bucketed(right, "id2"), Seq("tk"))
      } else {
        val l = explodedBuckets(left, "id1", tables, planes)
        val r = explodedBuckets(right, "id2", tables, planes)
        val sizes = l.select(col("tk")).unionAll(r.select(col("tk")))
          .groupBy(col("tk")).count()
        // With no oversized bucket the refinement is the IDENTITY
        // (every __bits is 0, k2 = tk + "|"), so the extend-keys
        // machinery — two broadcast sizing joins plus the deep-sketch
        // carry — buys nothing; join on the base keys directly. The
        // check is one aggregate action over the base bucket keys
        // (already needed for the refinement) and keeps the healthy-
        // corpus cost at the unbounded path's; only a corpus that
        // actually HAS a hot bucket pays for the bounding. Output is
        // bit-identical either way, so the oracle (which mirrors the
        // refinement term for term) agrees in both branches.
        if (sizes.filter(col("count") > maxBucket).isEmpty)
          l.join(r, Seq("tk"))
        else
          extendKeys(l, col("id1_v"), sizes, tables, planes, maxBucket)
            .join(extendKeys(r, col("id2_v"), sizes, tables, planes,
              maxBucket), Seq("k2"))
      }
    joined
      .withColumn("sim",
        dot(col("id1_v"), col("id2_v")) / (col("id1_n") * col("id2_n")))
      .filter(col("sim") >= threshold)
      .select(col("id1"), col("id2"), col("sim"))
      .distinct()
  }

  /**
   * SemDeDup-style semantic near-duplicate pairs (cf. Abbas et al.
   * 2023, "SemDeDup: Data-efficient learning at web-scale through
   * semantic deduplication", arXiv:2303.09540): bound the pair search
   * with a CLUSTERING of the embedding space — only pairs sharing a
   * cluster are scored. The complement of [[cosineNearDupPairs]]'s
   * random LSH buckets: k-means clusters follow the data's own
   * density, so semantically-tight groups that hyperplane sketches
   * split across buckets stay together, and recall within a cluster
   * is exact (every same-cluster pair is scored, no multi-table
   * probing).
   *
   * `assign` is a `(vec_id, cluster)` frame — in production
   * [[Embeddings.kmeansRun]]'s labels with k ≈ √N, so the mean
   * cluster holds √N vectors and the per-cluster self-join does
   * O(N·√N) total work instead of O(N²); the one-iteration
   * [[Embeddings.kmeansIter]] assignment is enough for the oracle
   * gate. Execution: one shuffle of (id, vector) per side keyed on
   * the cluster id, quadratic only within a cluster. The same
   * discipline as MinHash applies at 100 TB: collapse exact
   * duplicates first and size k so clusters stay bounded; a skewed
   * giant cluster is a mis-sized k, not a shuffle pathology.
   */
  def semanticNearDupPairs(corpus: DataFrame, assign: DataFrame,
      threshold: Double): DataFrame =
    semanticNearDupPairs(corpus, assign, threshold, maxBucket = Int.MaxValue)

  /** Maximum sketch-bit refinement depth for [[semanticNearDupPairs]]:
   * a cluster is never split into more than 2^16 sub-buckets. */
  val RefineBits = 16

  /**
   * [[semanticNearDupPairs]] with a BOUNDED per-bucket pair search:
   * any cluster larger than `maxBucket` is refined by hyperplane
   * sketch bits — the smallest b with ceil(|cluster|/maxBucket) ≤ 2^b
   * leading bits of a per-vector 16-bit sign sketch — and only pairs
   * agreeing on those bits score. This is how a fixed-k clustering
   * survives corpus growth: with k frozen, clusters grow as N/k and
   * the in-cluster self-join is quadratic in that; the refinement
   * re-imposes the ≈`maxBucket` bound the k ≈ √N sizing would have
   * given, trading recall ONLY inside oversized clusters (pairs that
   * disagree on a sign bit are the obtuse-ish ones — exactly the
   * pairs least likely to pass a high cosine threshold; replicas and
   * tight paraphrase groups share sketch prefixes and stay together).
   * With `maxBucket` = ∞ (the 3-arg overload) no cluster refines and
   * the output is the exact within-cluster pair set.
   *
   * The bits count is computed INTEGER-exactly (a CASE ladder on
   * ceil-div, no floating log2), so any SQL engine reproduces the
   * same refinement deterministically — the oracle mirrors it term
   * for term. Cluster sizes come from one count aggregate broadcast
   * back onto the scan (at k ≈ √N the size table is √N rows).
   */
  def semanticNearDupPairs(corpus: DataFrame, assign: DataFrame,
      threshold: Double, maxBucket: Int): DataFrame = {
    require(maxBucket > 0, "maxBucket must be positive")
    // checkpointed: the assignment is often an upstream COMPUTATION
    // (a k-means pass), and the joined frame feeds the size decision
    // plus both self-join sides — one materialization instead of
    // three re-evaluations (the shingled-sets discipline the MinHash
    // family uses, Dedup.minhashPairs)
    val e0 = corpus.select(col("vec_id"), col("embedding"))
      .filter(l2norm(col("embedding")) > 0) // cosine undefined at 0
      .join(assign.select(col("vec_id"), col("cluster")), Seq("vec_id"))
      .localCheckpoint()
    // ceil(count/maxBucket) compared against successive powers of two:
    // integer arithmetic end to end (the ceil-div sum stays far below
    // 2^53, so the double floor is exact), so the engine's floating
    // log2 has no say in the bits count — any SQL mirror agrees.
    val m = floor((col("count") + lit(maxBucket.toLong) - 1L) /
      lit(maxBucket.toDouble)).cast("long")
    val bits = (RefineBits - 1 to 0 by -1).foldLeft(lit(RefineBits)) {
      (acc, b) => when(m <= lit(1L << b), lit(b)).otherwise(acc)
    }
    // With every cluster within maxBucket the refinement is the
    // identity (__bits = 0 everywhere, sub-key = cluster alone) — the
    // plain cluster equi-join is the same pair set without the sizing
    // broadcast or the 16-bit sketch eval. One aggregate action over
    // the checkpointed frame decides; only a corpus whose clusters
    // actually outgrew maxBucket pays for the bounding. Output is
    // identical in both branches, as is the oracle's term-for-term
    // mirror of the refinement.
    val e =
      if (maxBucket == Int.MaxValue ||
          e0.groupBy(col("cluster")).count()
            .filter(col("count") > maxBucket).isEmpty)
        // concat (not concat_ws): a NULL cluster must null the sub-key
        // so the pair join drops it — the same null-never-matches
        // semantics the plain cluster equi-join has
        e0.withColumn("__sub",
          concat(col("cluster").cast("string"), lit("@")))
      else {
        // bits derive from e0's TRUE in-join counts, not the
        // assignment's upper bound — the oracle mirrors these
        val sizes = e0.groupBy(col("cluster")).count()
          .select(col("cluster"), bits.as("__bits"))
        // the sketch evaluates only under the __bits > 0 branch —
        // right-sized clusters never pay for the 16 hyperplane dots
        e0.join(broadcast(sizes), Seq("cluster"))
          .withColumn("__sub", concat(col("cluster").cast("string"),
            lit("@"),
            when(col("__bits") > 0,
              sketchKey(col("embedding"), table = 0, planes = RefineBits)
                .substr(lit(1), col("__bits"))).otherwise(lit(""))))
      }
    val l = e.select(col("__sub"), col("cluster"), col("vec_id").as("id1"),
      col("embedding").as("v1"))
    val r = e.select(col("__sub"), col("vec_id").as("id2"),
      col("embedding").as("v2"))
    l.join(r, Seq("__sub"))
      .filter(col("id1") < col("id2"))
      .withColumn("sim", cosine(col("v1"), col("v2")))
      .filter(col("sim") >= threshold)
      .select(col("cluster"), col("id1"), col("id2"), col("sim"))
  }

  /** Embedding-cosine near-duplicate pairs over one corpus: LSH-
   * bucketed self-join, exact cosine verify ≥ threshold. */
  def cosineNearDupPairs(corpus: DataFrame, threshold: Double,
      tables: Int = 4, planes: Int = 8): DataFrame =
    cosineNearDupPairs(corpus, threshold, tables, planes,
      maxBucket = Int.MaxValue)

  /** [[cosineNearDupPairs]] with [[crossCosinePairs]]'s bounded
   * bucket size: sketch buckets beyond `maxBucket` rows deepen their
   * key by further bits of the same sketch. In-bucket verify, as in
   * [[crossCosinePairs]]: vectors ride the self-join, the exact
   * cosine scores inline, and only threshold survivors reach the
   * cross-table distinct — no bare-candidate exchange, no vector
   * rejoins. Norms precompute per row before the table explode. */
  def cosineNearDupPairs(corpus: DataFrame, threshold: Double,
      tables: Int, planes: Int, maxBucket: Int): DataFrame = {
    require(maxBucket > 0, "maxBucket must be positive")
    val b =
      if (maxBucket == Int.MaxValue)
        corpus.select(col("vec_id"), col("embedding"))
          .withColumn("vn", l2norm(col("embedding")))
          .filter(col("vn") > 0) // zero vectors can never pass the verify
          .withColumn("k2", explode(array((0 until tables).map(t =>
            concat_ws("#", lit(t),
              sketchKey(col("embedding"), t, planes))): _*)))
      else {
        val e = explodedBuckets(corpus, "vec_id", tables, planes)
          .withColumnRenamed("vec_id_v", "embedding")
          .withColumnRenamed("vec_id_n", "vn")
        val sizes = e.groupBy(col("tk")).count()
        // no oversized bucket → refinement is the identity; join on
        // the base keys and skip the sizing broadcast (see
        // crossCosinePairs — one aggregate action decides)
        if (sizes.filter(col("count") > maxBucket).isEmpty)
          e.withColumnRenamed("tk", "k2")
        else
          extendKeys(e, col("embedding"), sizes, tables, planes, maxBucket)
      }
    val l = b.select(col("vec_id").as("id1"), col("embedding").as("v1"),
      col("vn").as("n1"), col("k2"))
    val r = b.select(col("vec_id").as("id2"), col("embedding").as("v2"),
      col("vn").as("n2"), col("k2"))
    l.join(r, Seq("k2")).filter(col("id1") < col("id2"))
      .withColumn("sim", dot(col("v1"), col("v2")) / (col("n1") * col("n2")))
      .filter(col("sim") >= threshold)
      .select(col("id1"), col("id2"), col("sim"))
      .distinct()
  }

  /**
   * Semantic (embedding-level) benchmark decontamination: for every
   * corpus vector, its maximum cosine against the EVAL-SET vectors and
   * a `contaminated` flag at `threshold` — the embedding-space
   * complement of [[graft.operators.TextOps.decontaminate]]'s n-gram
   * overlap (which misses paraphrased leakage; cf. Yang et al. 2023,
   * "Rethinking Benchmark and Contamination for Language Models with
   * Rephrased Samples", arXiv:2311.04850 — rephrased eval items evade
   * string matching but stay close in embedding space).
   *
   * Execution shape: eval sets are small by nature (10³–10⁵ rows), so
   * the eval side is BROADCAST and the corpus scan stays partitioned —
   * same discipline as [[cosineTopK]]. The per-corpus-row best match
   * is a `max(struct(sim, -eval_id))` groupBy, which partial-aggregates
   * map-side: since each corpus row sits in one partition, the
   * post-combine exchange carries exactly one row per corpus vector —
   * never the |corpus|·|eval| scored pairs. Zero-norm corpus vectors
   * (cosine undefined) are re-emitted by a second pruned scan branch
   * with null sim, never flagged — a union, not a corpus×corpus
   * join-back.
   *
   * Every corpus row appears in the output exactly once: dropping
   * below-threshold rows is the CALLER's policy (`filter(contaminated)`
   * for the report, anti-join for the clean corpus) — the max-sim
   * profile itself is what threshold tuning needs.
   */
  def decontaminateSemantic(corpus: DataFrame, evalSet: DataFrame,
      threshold: Double): DataFrame = {
    val e = evalSet.select(col("vec_id").as("eval_id"), col("embedding").as("ev"))
      .withColumn("en", l2norm(col("ev")))
      .filter(col("en") > 0) // cosine undefined for zero vectors
    // an empty (or all-zero) eval set would drop every scoreable corpus
    // row from the cross join — fail loudly instead of emitting a frame
    // that silently claims nothing is contaminated. The check is one
    // action on the (small, broadcast-bound) eval side.
    require(!e.isEmpty,
      "decontaminateSemantic: eval set has no nonzero vectors")
    val c = corpus.select(col("vec_id"), col("embedding").as("v"))
      .withColumn("vn", l2norm(col("v")))
    val best = c.filter(col("vn") > 0).crossJoin(broadcast(e))
      .withColumn("sim", dot(col("v"), col("ev")) / (col("vn") * col("en")))
      .groupBy(col("vec_id"))
      // struct max: highest sim, then (via the negated id) the SMALLEST
      // eval_id on ties — deterministic in any engine
      .agg(max(struct(col("sim"), (-col("eval_id")).as("nid"))).as("m"))
      .select(col("vec_id"), (-col("m.nid")).as("eval_id"),
        col("m.sim").as("max_sim"))
    // isNull: a NULL embedding has null vn, which fails BOTH `vn > 0`
    // and `!(vn > 0)` — without it such rows would vanish from the
    // output, breaking the exactly-once contract
    val zeroNorm = c.filter(col("vn").isNull || !(col("vn") > 0))
      .select(col("vec_id"), lit(null).cast("long").as("eval_id"),
        lit(null).cast("double").as("max_sim"))
    best.unionByName(zeroNorm)
      .withColumn("contaminated", coalesce(col("max_sim") >= threshold, lit(false)))
  }
}
