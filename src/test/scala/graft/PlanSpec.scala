package graft

import graft.operators.{Sampling, Similarity, TextOps}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/**
 * Physical-plan regression guard: the scale properties the README
 * claims — pushdown, pruning, no stray exchanges, bounded windows,
 * broadcast sides — asserted against the actual executed plans so a
 * refactor that silently reintroduces a shuffle or un-pushes a
 * filter fails here, not in a 100 TB run.
 */
class PlanSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"
  private def available = new java.io.File(dir).isDirectory

  private def planOf(df: DataFrame): String = {
    df.collect() // materialize so AQE settles on the final plan
    df.queryExecution.executedPlan.toString
  }

  test("time-range predicates reach the parquet scan (PushedFilters)") {
    assume(available)
    val df = SparkEntry.queries("q_all_range_limit")(spark, dir)
    val p = planOf(df)
    assert(p.contains("PushedFilters:") &&
      p.contains("GreaterThanOrEqual(ts") && p.contains("LessThan(ts"),
      s"range not pushed:\n$p")
  }

  test("column pruning: q1 scans only the columns it aggregates") {
    assume(available)
    val p = planOf(SparkEntry.queries("q1_agg")(spark, dir))
    assert(p.contains("ReadSchema"))
    assert(!p.contains("l_comment") && !p.contains("l_partkey"),
      s"unneeded lineitem columns read:\n$p")
    // partial + final aggregation pair around one exchange
    assert("HashAggregate".r.findAllIn(p).size >= 2)
  }

  test("deterministic sampling is a pure scan filter: zero exchanges") {
    assume(available)
    val docs = spark.read.parquet(s"$dir/documents.parquet")
    val p = planOf(Sampling.uniform(docs, col("doc_id"), 0.3))
    assert(!p.contains("Exchange"), s"sampling plan shuffles:\n$p")
    val p2 = planOf(Sampling.split(docs, col("doc_id"),
      Seq("train" -> 0.8, "val" -> 0.2)))
    assert(!p2.contains("Exchange"), s"split plan shuffles:\n$p2")
  }

  test("IVF assignment aggregates map-side: exactly one window (probes)") {
    assume(available)
    val emb = spark.read.parquet(s"$dir/embeddings.parquet")
    val df = Similarity.ivfTopK(emb, emb.filter(col("vec_id") < 4),
      centroids = emb.filter(pmod(col("vec_id"), lit(16)) === 0),
      k = 5, nprobe = 2)
    val p = planOf(df)
    // windows may partition only by query_id (probe + final ranking);
    // a window partitioned by the corpus's vec_id means the N·C
    // assignment cross product is being shuffled again
    assert(!p.contains("windowspecdefinition(vec_id"),
      s"corpus assignment regressed to a window:\n$p")
    assert(p.contains("windowspecdefinition(query_id"),
      s"expected query-side ranking windows:\n$p")
    assert(p.contains("BroadcastExchange"), s"centroids not broadcast:\n$p")
  }

  test("decontamination broadcasts the benchmark gram side") {
    assume(available)
    val docs = spark.read.parquet(s"$dir/documents.parquet")
    val df = TextOps.decontaminate(docs, col("doc_id"), col("text"),
      docs.filter(pmod(col("doc_id"), lit(97)) === 0), col("text"))
    val p = planOf(df)
    assert(p.contains("BroadcastExchange"), s"benchmark side not broadcast:\n$p")
  }

  test("embedding pair joins verify in-bucket: no bare-candidate rejoin") {
    assume(available)
    val emb = spark.read.parquet(s"$dir/embeddings.parquet")
    // in-bucket verify: ONE equi-join on the sketch key (vectors ride
    // it), cosine scored inline, distinct on survivors. A plan with
    // more joins means the bare-candidate-dedup-then-rejoin shape is
    // back — the one that shuffles the full candidate flood twice
    val p = planOf(Similarity.crossCosinePairs(
      emb.filter(pmod(col("vec_id"), lit(2)) === 0),
      emb.filter(pmod(col("vec_id"), lit(2)) === 1),
      threshold = 0.4, tables = 4, planes = 4))
    assert("Join".r.findAllIn(p).size <= 2, // one logical join (SMJ/SHJ + AQE variants)
      s"crossCosinePairs rejoins vectors after candidate dedup:\n$p")
    val p2 = planOf(Similarity.cosineNearDupPairs(emb, threshold = 0.4,
      tables = 4, planes = 4))
    assert("Join".r.findAllIn(p2).size <= 2,
      s"cosineNearDupPairs rejoins vectors after candidate dedup:\n$p2")
  }

  test("semantic refinement broadcasts the cluster-size table") {
    assume(available)
    val emb = spark.read.parquet(s"$dir/embeddings.parquet")
    val assign = emb.select(col("vec_id"), col("label").as("cluster"))
    val p = planOf(Similarity.semanticNearDupPairs(emb, assign,
      threshold = 0.4, maxBucket = 4))
    // the per-cluster bits table must come back as a broadcast, never
    // a shuffle join keyed on cluster (that would re-exchange the
    // corpus a second time before the pair join)
    assert(p.contains("BroadcastExchange"),
      s"cluster sizes not broadcast:\n$p")
  }

  test("round-10 operators keep their claimed plan shapes") {
    assume(available)
    // AQE plan strings repeat the tree under "== Initial Plan ==" —
    // count exchanges in the FINAL section only
    def finalSection(p: String): String = p.split("== Initial Plan ==").head
    // text_script / text_gopher_quality: pure scan projections
    for (name <- Seq("text_script", "text_gopher_quality")) {
      val p = finalSection(planOf(SparkEntry.queries(name)(spark, dir)))
      // the gate adds a global orderBy (one exchange for the sort);
      // nothing else may shuffle
      assert("Exchange".r.findAllIn(p).size <= 1, s"$name shuffles:\n$p")
    }
    // hopping: two aggregation exchanges (fine buckets, windows) +
    // the gate's sort — the k-fold fan-out must not add more
    val ph = finalSection(planOf(SparkEntry.queries("q_series_hopping")(spark, dir)))
    assert("Exchange".r.findAllIn(ph).size <= 3,
      s"hopping has stray exchanges:\n$ph")
    // silhouette/drift/representatives: centroid frames come back
    // broadcast, the corpus never re-shuffles with its vectors
    for (name <- Seq("embed_silhouette", "embed_source_drift",
        "embed_representatives")) {
      val p = planOf(SparkEntry.queries(name)(spark, dir))
      assert(p.contains("BroadcastExchange") ||
        p.contains("BroadcastNestedLoopJoin"),
        s"$name centroids not broadcast:\n$p")
    }
  }

  test("round-11 operators keep their claimed plan shapes") {
    assume(available)
    def finalSection(p: String): String = p.split("== Initial Plan ==").head
    // text_url_parts: a pure let-bound projection — nothing but the
    // gate's sort may exchange, and the regex chain must not re-expand
    // into the plan (the pre-let form inlined ~100 regexp nodes and
    // codegen compile time dominated)
    val pu = finalSection(planOf(SparkEntry.queries("text_url_parts")(spark, dir)))
    assert("Exchange".r.findAllIn(pu).size <= 1, s"url_parts shuffles:\n$pu")
    // the plan STRING prints the let-chain once per emitted field (7
    // identical struct roots — runtime subexpression elimination
    // evaluates it once); the pre-let form re-expanded the chain at
    // every INTERNAL reference too (~100 regexp_replace nodes). Guard
    // the boundary between those regimes.
    assert("regexp_replace".r.findAllIn(pu).size <= 30,
      s"urlParts regex chain re-expanded (let-binding lost):\n$pu")
    // indexed IVF probe: centroids broadcast; NO window partitioned by
    // the corpus id (that would mean the N·C assignment is being
    // recomputed despite the index)
    val emb = spark.read.parquet(s"$dir/embeddings.parquet")
    val cents = emb.filter(pmod(col("vec_id"), lit(16)) === 0)
    val idx = Similarity.ivfIndex(emb, cents).localCheckpoint()
    val pi = planOf(Similarity.ivfTopKIndexed(idx, emb,
      emb.filter(col("vec_id") < 4), cents, k = 5, nprobe = 2))
    assert(!pi.contains("windowspecdefinition(vec_id"),
      s"indexed probe recomputes the assignment window:\n$pi")
    assert(pi.contains("BroadcastExchange"), s"centroids not broadcast:\n$pi")
    // the indexed probe must not contain the corpus×centroid cross
    // product at all — that is exactly what the index replaces
    assert(!pi.contains("CartesianProduct"),
      s"indexed probe re-crosses corpus with centroids:\n$pi")
  }

  test("round-12 operators keep their claimed plan shapes") {
    assume(available)
    def finalSection(p: String): String = p.split("== Initial Plan ==").head
    val emb = spark.read.parquet(s"$dir/embeddings.parquet")
    // covariance sketch: the corpus-side aggregation must be the
    // tiered LONG form — partition-local partials under a
    // (i, j, pid) hash aggregate, with DECIMAL sums only ABOVE it
    // (the straight decimal row-stream sum measured 5x the query) —
    // and the d²-cell artifact must never join the corpus again
    val psk = planOf(graft.operators.Embeddings.covarianceSketch(
      emb, col("embedding"), dim = 64,
      ckpt = graft.operators.CheckpointMode.Off))
    assert(psk.contains("SPARK_PARTITION_ID") ||
      psk.toLowerCase.contains("spark_partition_id"),
      s"tiered partial sums lost (no pid grouping):\n$psk")
    // the decimal merge reads partials: no sum over a generated
    // product column cast to decimal below the pid aggregate
    assert(!psk.contains("CartesianProduct"),
      s"covariance sketch crossed frames:\n$psk")
    // the trained classifier's gradient pass: ONE exchange per
    // iteration (the 4-cell partial aggregate), no window, no join —
    // the corpus never shuffles its rows for training
    val feats = graft.operators.CorpusStats.logregFeatFrame(
      spark.read.parquet(s"$dir/documents.parquet"),
      col("doc_id"), col("text"), col("source") === "src0")
    val gs = (0 until 4).map(j =>
      sum((col("r") * col(s"x$j")).cast("decimal(38,0)")).as(s"g$j"))
    val grad = feats
      .select((lit(1L)).as("r"), col("*"))
      .agg(gs.head, gs.tail: _*)
    val pg = finalSection(planOf(grad))
    assert("Exchange".r.findAllIn(pg).size == 1,
      s"logreg gradient pass is not one partial-agg exchange:\n$pg")
    assert(!pg.contains("Window") && !pg.contains("SortMergeJoin"),
      s"logreg gradient pass grew a window/join:\n$pg")
    // unigram encode: a pure projection over the scan plus the gate's
    // own distinct/sort — no join anywhere (the vocab rides the
    // broadcast HANDLE inside the expression, not a join)
    val pue = planOf(SparkEntry.queries("text_unigram_encode")(spark, dir))
    assert(!pue.contains("Join"), s"unigram encode joins:\n$pue")
    // correlation: joins over the d²-cell artifact only — broadcast,
    // no corpus-sized shuffle beyond the covariance build itself
    val pc = planOf(graft.operators.Embeddings.correlationPpm(
      graft.operators.Embeddings.covarianceMicro(emb, col("embedding"),
        dim = 64)))
    assert(pc.contains("BroadcastHashJoin") && !pc.contains("SortMergeJoin"),
      s"correlation joins are not broadcast:\n$pc")
  }

  test("round-13 operators keep their claimed plan shapes") {
    assume(available)
    val docs = spark.read.parquet(s"$dir/documents.parquet")
    // trigram LM scoring: a pure projection over the scan (all three
    // tables ride broadcast HANDLES inside the codegen'd expression,
    // never a join) — the corpus pays one pass, no shuffle beyond
    // the gate's own sort
    val pt = planOf(graft.operators.CorpusStats.trigramNll(
      docs, col("doc_id"), col("text"), vocabK = 32, bigramK = 64,
      trigramK = 64))
    assert(!pt.contains("Join"), s"trigram scoring joins:\n$pt")
    // perceptual near-dup: banded buckets only — no cartesian, no
    // non-broadcast join anywhere in the pair generation
    val pp = planOf(graft.operators.Multimodal.perceptualDupPairs(
      graft.operators.Multimodal.asMedia(docs, "doc_id", "text",
        "source"), maxDist = 3))
    assert(!pp.contains("CartesianProduct") &&
      !pp.contains("BroadcastNestedLoopJoin"),
      s"perceptual pairs degenerate to all-pairs:\n$pp")
    // one-pass vocab card: exactly ONE aggregate pair (partial+final
    // exchange) over the card explode — a second encode pass would
    // show as a second scan of the documents parquet
    val pv = planOf(graft.operators.CorpusStats.bpeVocabStats(
      docs, col("doc_id"), col("text"),
      graft.operators.CorpusStats.bpeTrain(docs.limit(50), col("text"),
        merges = 2), k = 10))
    assert("Scan parquet".r.findAllIn(pv).size <= 1,
      s"vocab card re-scans the corpus:\n$pv")
    // index upsert: the anti-join retires by batch ids (broadcast or
    // hash — never cartesian), and the fresh half is the corpusIndex
    // build alone
    val idx = graft.operators.Dedup.corpusIndex(
      docs.filter(col("doc_id") % 3 =!= 0), col("doc_id"), col("text"))
    val pu = planOf(graft.operators.Dedup.corpusIndexUpsert(idx,
      docs.filter(col("doc_id") % 3 === 0), col("doc_id"), col("text")))
    assert(!pu.contains("CartesianProduct"),
      s"index upsert crossed frames:\n$pu")
  }

  test("round-14 operators keep their claimed plan shapes") {
    assume(available)
    val docs = spark.read.parquet(s"$dir/documents.parquet")
    val emb = spark.read.parquet(s"$dir/embeddings.parquet")
    // exact-substring dedup: the hot-gram resolution is a map-side
    // combinable aggregate pair (hot boilerplate windows collapse
    // BEFORE the shuffle), every Window partitions by doc_id, and
    // nothing degenerates to all-pairs
    val pe = planOf(graft.operators.Dedup.exactSubstringDedup(
      docs, col("doc_id"), col("text"), l = 15))
    assert(!pe.contains("CartesianProduct"),
      s"exact-substring dedup crossed frames:\n$pe")
    assert("HashAggregate".r.findAllIn(pe).size >= 2,
      s"gram count lost its partial aggregate:\n$pe")
    // (window partitioning discipline is covered by the registry-wide
    // unpartitioned-window audit below — dedup_exact_substring is in
    // the registry)
    // radius search: the filter IS the output — no window, no shuffle
    val pr = planOf(graft.operators.Similarity.rangeSearch(
      emb, emb.filter(col("vec_id") < 4), minSim = 0.2))
    assert(!pr.contains("Window") && !pr.contains("hashpartitioning"),
      s"rangeSearch grew a window/shuffle:\n$pr")
    // cluster split: the pair chain stays banded (no all-pairs) and
    // the final assignment is a projection over one left join
    val ps = planOf(graft.operators.Dedup.clusterSplit(
      docs, col("doc_id"), col("text"),
      splits = Seq(("train", 900000L), ("test", 100000L))))
    assert(!ps.contains("CartesianProduct"),
      s"clusterSplit degenerated to all-pairs:\n$ps")
  }

  test("round-15 operators keep their claimed plan shapes") {
    assume(available)
    val docs = spark.read.parquet(s"$dir/documents.parquet")
    import spark.implicits._
    // pretok BPE encode: a pure codegen'd projection — no UDF, no
    // shuffle, no join (the merge table rides the broadcast handle)
    val bc = spark.sparkContext.broadcast(
      Array(Array(" ", "t"), Array(" t", "h")))
    val pp = planOf(docs.select(
      graft.functions.BpeEncodeExpr.bpeText(col("text"), bc,
        pretok = true).as("e")))
    assert(!pp.contains("Exchange") && !pp.contains("Join") &&
      !pp.contains("BatchEvalPython"),
      s"pretok encode grew a shuffle/join:\n$pp")
    // epochShuffle: the rank window partitions by shard (never a
    // single global partition) and nothing joins
    val wins = (0L until 100L).map(Tuple1(_)).toDF("seq")
    val ps = planOf(graft.operators.Export.epochShuffle(
      wins, col("seq"), seed = 3L, n = 8))
    assert(ps.contains("Window") &&
      "Exchange hashpartitioning\\(shard".r.findAllIn(ps).nonEmpty,
      s"epochShuffle window lost its shard partitioning:\n$ps")
    assert(!ps.contains("CartesianProduct"), s"epochShuffle crossed:\n$ps")
    // doc-span materialization: the SAME single stream shuffle as the
    // spans-free form — spans ride the existing per-window sort, no
    // second exchange keyed on seq
    val packed = graft.operators.Packing.packSequences(
      docs.withColumn("toks", split(col("text"), " ")),
      col("doc_id"), size(col("toks")).cast("long"), 64L)
    def seqExchanges(p: String): Int =
      "Exchange hashpartitioning\\(seq".r.findAllIn(p).size
    val plain = planOf(graft.operators.Packing.materializeWindows(
      packed, col("toks"), 64L))
    val spans = planOf(graft.operators.Packing.materializeWindows(
      packed, col("doc_id"), col("toks"), 64L))
    assert(seqExchanges(spans) == seqExchanges(plain),
      s"doc_spans added a window-keyed exchange:\n$spans")
    // gramIndexDelete: the re-min is semi/anti joins + one aggregate —
    // never a cartesian
    val idx = graft.operators.Dedup.gramIndex(
      docs, col("doc_id"), col("text"), l = 15)
    val pd = planOf(graft.operators.Dedup.gramIndexDelete(
      idx, Seq(1L).toDF("id"), col("id"),
      docs.filter(col("doc_id") =!= 1L), col("doc_id"), col("text"),
      l = 15))
    assert(!pd.contains("CartesianProduct"),
      s"gramIndexDelete crossed frames:\n$pd")
  }

  test("round-16 operators keep their claimed plan shapes") {
    assume(available)
    val docs = spark.read.parquet(s"$dir/documents.parquet")
    import spark.implicits._
    // windowsTakedown: spans explode + two joins, nothing crosses and
    // no window — the token payloads never shuffle (only (seq, did))
    val packed = graft.operators.Packing.packSequences(
      docs.withColumn("toks", split(col("text"), " ")),
      col("doc_id"), size(col("toks")).cast("long"), 64L)
    val wins = graft.operators.Packing.materializeWindows(
      packed, col("doc_id"), col("toks"), 64L)
    val pt = planOf(graft.operators.Packing.windowsTakedown(
      wins, Seq(1L).toDF("doc_id"), col("doc_id")))
    assert(!pt.contains("CartesianProduct") && !pt.contains("Window,"),
      s"windowsTakedown grew a cross/window:\n$pt")
    // token-level exact-substring: the same map-side-combinable gram
    // aggregate shape as the word path (partial_min/partial_count
    // before the exchange), no frame crossing
    val toks = docs.withColumn("tk",
      transform(split(col("text"), " "), w => xxhash64(w)))
    val ptk = planOf(graft.operators.Dedup.exactSubstringDedupTokens(
      toks, col("doc_id"), col("tk"), l = 15))
    assert(ptk.contains("partial_min") || ptk.contains("partial_count"),
      s"token gram agg lost its map-side combine:\n$ptk")
    assert(!ptk.contains("CartesianProduct"),
      s"token exact-substring crossed frames:\n$ptk")
    // bounded minhash: both tiers are joins/aggregates — no cartesian,
    // and no unpartitioned window anywhere in the chain
    val pb = planOf(graft.operators.Dedup.minhashPairsBounded(
      docs, col("doc_id"), col("text"), threshold = 0.8, bands = 8,
      maxBucket = 64))
    assert(!pb.contains("CartesianProduct"),
      s"minhashPairsBounded crossed frames:\n$pb")
  }

  test("PQ plans: encode is one map-side argmin exchange; ADC scan never joins vectors") {
    assume(available)
    val emb = spark.read.parquet(s"$dir/embeddings.parquet")
    val cb = emb.filter(pmod(col("vec_id"), lit(64)) === 0)
    val enc = Similarity.pqEncode(emb, cb, m = 4)
    val pe = planOf(enc)
    // the m per-subspace argmins ride ONE aggregation pair around one
    // exchange; a per-(vector, subspace) explode shape would show a
    // second shuffle (it read 77s vs 3.2s at 100×)
    assert("Exchange hashpartitioning".r.findAllIn(
      pe.split("== Initial Plan ==").head).size <= 1,
      s"pqEncode shuffles more than the argmin exchange:\n$pe")
    assert(pe.contains("BroadcastExchange") ||
      pe.contains("BroadcastNestedLoopJoin"),
      s"codebook not broadcast:\n$pe")
    // ADC scoring: the codes scan joins the broadcast LUT only —
    // corpus EMBEDDINGS must not appear in the probe plan
    val pt = planOf(Similarity.pqTopK(enc.localCheckpoint(),
      emb.filter(col("vec_id") < 4), cb, m = 4, k = 5))
    assert(!pt.contains("embedding#") ||
      !pt.split("BroadcastExchange").head.contains("Scan parquet"),
      s"ADC scan reads embeddings:\n$pt")
  }

  test("manifest pruning keeps time-bounded store reads file-bounded") {
    val store = new graft.sources.SeriesStore(spark,
      java.nio.file.Files.createTempDirectory("graft-plan-prune").toString)
    store.create("db")
    import spark.implicits._
    (0 until 4).foreach { d =>
      val t0 = (1704067200L + d * 86400L) * 1000000000L
      store.storeBatch("db",
        (0 until 10).map(i => (t0 + i * 1000000000L, s"""{"v": $i}"""))
          .toDF("ts", "doc"))
    }
    val from = (1704067200L + 2 * 86400L) * 1000000000L
    val to = from + 86400L * 1000000000L
    val p = planOf(store.frame("db", Some(from), Some(to)))
    // exactly ONE of the four commit files may appear in the scan
    assert("\\.parquet".r.findAllIn(p).size <= 1 ||
      "InMemoryFileIndex\\(1 paths\\)".r.findAllIn(p).nonEmpty,
      s"pruned read lists more than the in-range file:\n$p")
  }

  test("every unpartitioned window in the registry rides a bounded frame") {
    assume(available)
    import org.apache.spark.sql.catalyst.plans.logical
    // An ordered window with NO partition spec funnels its whole input
    // through one task — acceptable ONLY on frames bounded by
    // construction. Two bounded classes exist in this codebase:
    //   (a) the frame sits on an Aggregate (value histograms, score
    //       buckets, per-period rollups, 4096-bucket prefix tables) —
    //       cardinality-bounded by the group keys' domain, never rows;
    //   (b) the broadcast-sized codebook row_number (rankedCodebook),
    //       which has no aggregate beneath but is a bounded artifact
    //       by contract — whitelisted BY QUERY NAME below.
    // Anything else is a new unbounded single-task shuffle: fail until
    // it is either re-shaped or deliberately whitelisted here.
    val codebookOk = Set("ann_pq_topk", "ann_pq_rerank", "ann_ivfpq_topk",
      "ann_pq_upsert", "ann_pq_recall_audit", "ann_ivfpq_residual")
    val offenders = SparkEntry.queries.keys.toSeq.sorted.flatMap { name =>
      val lp = SparkEntry.queries(name)(spark, dir)
        .queryExecution.optimizedPlan
      val unbounded = lp.collect {
        case w: logical.Window if w.partitionSpec.isEmpty =>
          w.child.collectFirst {
            case _: logical.Aggregate => ()
            case _: logical.LocalRelation => ()
          }.isEmpty
      }.count(identity)
      if (unbounded > 0 && !codebookOk.contains(name))
        Some(s"$name($unbounded)")
      else None
    }
    assert(offenders.isEmpty,
      s"unpartitioned windows on non-aggregate frames in: $offenders")
  }

  test("no registry query degenerates to a non-broadcast cartesian product") {
    assume(available)
    // BroadcastNestedLoopJoin with a bounded broadcast side is a
    // legitimate plan (ANN query fan-out, IVF centroid scoring); a
    // CartesianProduct of two unbounded sides is never intended and
    // would be a 100 TB catastrophe regardless of sf0.001 timings
    val offenders = SparkEntry.queries.keys.toSeq.sorted.flatMap { name =>
      val df = SparkEntry.queries(name)(spark, dir)
      df.collect()
      val p = df.queryExecution.executedPlan.toString
      if (p.contains("CartesianProduct")) Some(name) else None
    }
    assert(offenders.isEmpty, s"cartesian plans in: $offenders")
  }

  test("compacted store reads are plain scans; dirty reads add one dedup agg") {
    val store = new graft.sources.SeriesStore(spark,
      java.nio.file.Files.createTempDirectory("graft-plan").toString)
    store.create("db")
    store.store("db", Some("2012-08-28T21:24:00Z"), """{"v": 1}""")
    store.compact("db")
    val clean = planOf(store.frame("db"))
    assert(!clean.contains("Exchange") && !clean.contains("Aggregate"),
      s"clean read not a plain scan:\n$clean")
    store.store("db", Some("2012-08-28T21:24:01Z"), """{"v": 2}""")
    val dirty = planOf(store.frame("db"))
    // max_by lowers to a sort/object aggregate — any Aggregate node
    // keyed on ts is the last-write-wins dedup
    assert(dirty.contains("Aggregate"), s"dirty read skips dedup:\n$dirty")
  }
}
