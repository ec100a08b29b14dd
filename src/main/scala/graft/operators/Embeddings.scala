package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * Embedding-column maintenance operators for training pipelines:
 * storage quantization and centroid training — the steps that turn a
 * raw `array<float>` column into the compact/indexed forms the
 * similarity operators ([[Similarity]]) consume at scale.
 *
 * Both are scan-shaped: [[quantize]] is a pure projection (no
 * shuffle, plan-asserted); [[kmeansIter]]'s only corpus-sized
 * exchange is one map-side-combined aggregate (the per-(label, dim)
 * centroid sums), with assignment a broadcast join over the tiny
 * centroid frame — the IVF-build shape (`Similarity.ivfTopK`) reused
 * for training.
 */
object Embeddings {

  import Similarity.dot

  /**
   * Symmetric per-vector int8 quantization: `scale = max|x| / 127`,
   * `q_i = round(x_i / scale)` ∈ [−127, 127], plus the max absolute
   * reconstruction error `max|x_i − q_i·scale|` — 4× smaller storage
   * for ANN candidate generation, with the error column driving
   * re-rank decisions. A zero vector quantizes to all-zero with
   * scale 0.
   *
   * All arithmetic is in double with round-half-away-from-zero, so
   * any engine reproduces the identical int grid (the oracle does).
   * One codegen'd projection over the scan; the higher-order
   * functions here are per-element loops with no shuffle — at 100 TB
   * this op is I/O-bound, not CPU-bound.
   */
  def quantize(df: DataFrame, id: Column, vec: Column): DataFrame =
    df.filter(vec.isNotNull && size(vec) > 0)
      .select(id.as("vec_id"), vec.as("__v"))
      .withColumn("scale",
        array_max(transform(col("__v"), x => abs(x.cast("double")))) / lit(127.0))
      .withColumn("q", transform(col("__v"), x =>
        when(col("scale") === 0.0, lit(0))
          .otherwise(round(x.cast("double") / col("scale")).cast("int"))))
      .withColumn("max_err", array_max(zip_with(col("__v"), col("q"),
        (x, qq) => abs(x.cast("double") - qq.cast("double") * col("scale")))))
      .drop("__v")

  /**
   * Per-label elementwise mean vectors — the centroid-update half of
   * a Lloyd iteration. Sums run in DECIMAL(38,12) so the mean is
   * independent of partition/summation order (bit-exact across
   * engines and cluster layouts), then return to double via the
   * tiered-scale emit (`functions.decToDouble`) — identical to the
   * plain cast below a 9·10⁶ per-(label, dim) sum, and still
   * correctly-rounded-everywhere past the 2⁶⁴ unscaled-cast cliff a
   * billion-row cluster can reach (SURVEY §7.5).
   *
   * Scale shape: the dim-explode multiplies rows ×dims, but the
   * (label, dim) group-by partial-aggregates map-side, so the
   * exchange carries |labels|·dims tiny rows — never the corpus.
   */
  def centroids(df: DataFrame, vec: Column, label: Column): DataFrame =
    df.filter(vec.isNotNull && size(vec) > 0)
      .select(label.as("lbl"), posexplode(vec))
      .toDF("lbl", "pos", "xv")
      .groupBy(col("lbl"), col("pos"))
      .agg((graft.functions.decToDouble(
        sum(col("xv").cast("double").cast("decimal(38,12)"))) /
        count(lit(1))).as("cv"))
      .groupBy(col("lbl"))
      .agg(transform(array_sort(collect_list(struct(col("pos"), col("cv")))),
        s => s.getField("cv")).as("cv"))

  /**
   * Label-outlier mining — the mislabeled/atypical-example detector
   * of a curated-dataset pipeline (the geometric core of
   * confident-learning-style cleaning): each vector's squared
   * distance to ITS OWN label's centroid, z-scored against that
   * label's distance distribution. A high `z` means the example sits
   * far outside its class's cluster — a labeling error, an outlier,
   * or a hard example, all of which deserve review before training.
   * Emits (vec_id, label, d2, z, is_outlier = z > threshold); labels
   * whose distance spread is 0 never flag.
   *
   * Portability and scale both reuse proven constructions:
   * [[centroids]]' DECIMAL means broadcast back (the [[kmeansIter]]
   * join shape — the corpus never shuffles with its vectors), `d2`
   * is the same `‖x‖² − 2·x·c + ‖c‖²` sequential-dot expansion, and
   * the per-label stats use [[SeriesStats.anomaly]]'s integer
   * micro-unit discipline (`quantizeMicro`): `d2` is a DERIVED
   * non-integral double, so it quantizes to `round(d2·10⁶)` LONGs
   * and the z derives from EXACT integer Σvi/Σvi² — a direct
   * double→DECIMAL(38,12) cast of a derived double rounds the 12th
   * decimal in an engine-private way (the events_seasonal defect).
   * One scan, two broadcast-sized frames.
   */
  def labelOutliers(df: DataFrame, id: Column, vec: Column, label: Column,
      threshold: Double = 2.0): DataFrame = {
    require(threshold > 0, "threshold must be positive")
    val cents = broadcast(centroids(df, vec, label)
      .select(col("lbl"), col("cv"))
      .withColumn("__cc", dot(col("cv"), col("cv"))))
    val scored = df.filter(vec.isNotNull && size(vec) > 0)
      .select(id.as("vec_id"), label.as("lbl"), vec.as("__v"))
      .join(cents, "lbl")
      .withColumn("d2",
        dot(col("__v"), col("__v")) - lit(2.0) * dot(col("__v"), col("cv")) +
          col("__cc"))
      .select(col("vec_id"), col("lbl").as("label"), col("d2"))
    val vi = round(col("d2") * lit(1000000.0)).cast("long")
    val stats = scored.groupBy(col("label"))
      .agg(sum(vi.cast("decimal(38,0)")).cast("double").as("__s"),
        sum(vi.cast("decimal(19,0)") * vi.cast("decimal(19,0)"))
          .cast("double").as("__ss"),
        count(col("d2")).as("__n"))
      .select(col("label"), (col("__s") / col("__n")).as("__m"),
        (col("__ss") / col("__n") -
          (col("__s") / col("__n")) * (col("__s") / col("__n"))).as("__var"))
    scored.join(broadcast(stats), "label")
      // scale-0 quantization (the anomaly micro-z discipline): both
      // engines round the SAME scaled double; round(x, 6) is
      // engine-private at 5e-7 ties of derived rationals
      .withColumn("z", round(when(col("__var") > 0,
        (vi.cast("double") - col("__m")) / sqrt(col("__var"))) *
        lit(1000000.0)) / lit(1000000.0))
      .withColumn("is_outlier", coalesce(col("z") > threshold, lit(false)))
      .select(col("vec_id"), col("label"),
        (round(col("d2") * lit(1000000.0)) / lit(1000000.0)).as("d2"),
        col("z"), col("is_outlier"))
  }

  /**
   * Centroid-based (simplified) silhouette of a labeling — the
   * cluster-quality score of a label assignment, per vector
   * (Hruschka et al.'s simplified silhouette: distances to CLUSTER
   * CENTROIDS instead of all-pairs mean distances, which turns the
   * O(N²) classic definition into one broadcast pass — the only form
   * that exists at corpus scale). For each vector: `a_dist` = the
   * euclidean distance to its OWN label's centroid, `b_dist` = the
   * distance to the NEAREST OTHER label's centroid, and
   * `sil = (b − a) / max(a, b)` ∈ [−1, 1] — negative means the
   * vector sits closer to another cluster than its own (a mislabel
   * signal that complements [[labelOutliers]]' within-class z), near
   * +1 means tight-and-separated. Degenerate cases pinned: a
   * single-label corpus has no "other" centroid → `b_dist`/`sil`
   * null; a vector exactly on both centroids (max = 0) → sil 0.
   *
   * Portability: distances are `sqrt(max(‖x‖² − 2·x·c + ‖c‖², 0))` of
   * [[centroids]]' DECIMAL-exact means — both engines take the same
   * correctly-rounded sqrt of the same double (the clamp kills the
   * −1e−17 FP residue a vector-on-centroid produces); emits are
   * scale-0 micro-quantized (`round(x·10⁶)/10⁶`), never
   * `round(double, 6)`. Scale: centroid frame broadcast, the corpus
   * never shuffles with its vectors; the per-(vector, label) distance
   * rows collapse in a map-side-combined aggregate to one row per
   * vector.
   */
  def silhouette(df: DataFrame, id: Column, vec: Column,
      label: Column): DataFrame = {
    val base = df.filter(vec.isNotNull && size(vec) > 0 && label.isNotNull)
      .select(id.as("vec_id"), label.as("label"), vec.as("__v"))
    val cents = broadcast(centroids(
        df.filter(label.isNotNull), vec, label)
      .select(col("lbl").as("__cl"), col("cv"))
      .withColumn("__cc", dot(col("cv"), col("cv"))))
    def q6(c: Column): Column = round(c * lit(1000000.0)) / lit(1000000.0)
    val g = base.crossJoin(cents)
      .withColumn("__dist", sqrt(greatest(
        dot(col("__v"), col("__v")) - lit(2.0) * dot(col("__v"), col("cv")) +
          col("__cc"), lit(0.0))))
      .groupBy(col("vec_id"), col("label"))
      .agg(max(when(col("__cl") === col("label"), col("__dist"))).as("__a"),
        min(when(col("__cl") =!= col("label"), col("__dist"))).as("__b"))
    g.select(col("vec_id"), col("label"),
      q6(col("__a")).as("a_dist"), q6(col("__b")).as("b_dist"),
      when(col("__a").isNull || col("__b").isNull,
        lit(null).cast("double"))
        .otherwise(when(greatest(col("__a"), col("__b")) > 0,
          q6((col("__b") - col("__a")) / greatest(col("__a"), col("__b"))))
          .otherwise(lit(0.0))).as("sil"))
  }

  /**
   * Per-group embedding drift — how far each group's (source's,
   * shard's, day's) centroid sits from the GLOBAL centroid, the
   * embedding-space counterpart of `CorpusStats.vocabDivergence`/
   * `psi`: a source whose centroid wanders is shipping different
   * content than the corpus at large (crawl change, spam influx,
   * encoding bug) before any token-level signal moves. Emits
   * (grp, n_vecs, drift_dist) with the euclidean centroid distance
   * scale-0 micro-quantized.
   *
   * Portability: both centroids are [[centroids]]' DECIMAL-exact
   * means; the distance is a sequential-order dot of the elementwise
   * difference (both engines fold the same doubles in the same
   * order). Scale: two map-side-combined aggregates over one scan
   * (per-group and global sums), then |groups| rows cross-joined with
   * one broadcast global row — nothing corpus-sized moves.
   */
  def groupDrift(df: DataFrame, vec: Column, group: Column): DataFrame = {
    val perGroup = centroids(df.filter(group.isNotNull), vec, group)
      .select(col("lbl").as("grp"), col("cv"))
    val global = broadcast(
      centroids(df.filter(group.isNotNull), vec, lit(1)).select(col("cv").as("__gcv")))
    val counts = df.filter(group.isNotNull)
      .filter(vec.isNotNull && size(vec) > 0)
      .groupBy(group.as("grp")).agg(count(lit(1)).as("n_vecs"))
    val diff = zip_with(col("cv"), col("__gcv"), (a, b) => a - b)
    perGroup.join(counts, "grp")
      .crossJoin(global)
      .select(col("grp"), col("n_vecs"),
        (round(sqrt(greatest(dot(diff, diff), lit(0.0))) * lit(1000000.0))
          / lit(1000000.0)).as("drift_dist"))
  }

  /**
   * Per-cluster representative selection: the k vectors CLOSEST to
   * their own label's centroid — the "keep one exemplar per semantic
   * cluster" step of SemDeDup-style curation and the medoid picker
   * for cluster inspection/labeling UIs (k=1 ⇒ the approximate
   * medoid). Output: (label, vec_id, d2_micro, rank 1..k), smallest
   * distance first.
   *
   * Determinism is integer-first: candidates order by the
   * MICRO-QUANTIZED distance `round(d2·10⁶)` with `vec_id` as the
   * tie-break, so rank boundaries can never depend on an
   * engine-private double comparison at representation ties. Scale:
   * [[centroids]] broadcast back (corpus never shuffles with its
   * vectors); the per-label top-k rides the `row_number ≤ k` shape
   * the optimizer lowers to a PARTIAL WindowGroupLimit — each
   * partition ships at most k rows per label.
   */
  def representatives(df: DataFrame, id: Column, vec: Column,
      label: Column, k: Int = 1): DataFrame = {
    require(k >= 1, "k must be >= 1")
    val cents = broadcast(centroids(df.filter(label.isNotNull), vec, label)
      .select(col("lbl").as("label"), col("cv"))
      .withColumn("__cc", dot(col("cv"), col("cv"))))
    val scored = df.filter(vec.isNotNull && size(vec) > 0 && label.isNotNull)
      .select(id.as("vec_id"), label.as("label"), vec.as("__v"))
      .join(cents, "label")
      .withColumn("d2_micro", round((dot(col("__v"), col("__v"))
        - lit(2.0) * dot(col("__v"), col("cv")) + col("__cc"))
        * lit(1000000.0)).cast("long"))
      .select(col("label"), col("vec_id"), col("d2_micro"))
    TopK.perGroup(scored, col("label"),
      struct(col("d2_micro"), col("vec_id")).asc, col("vec_id"), k)
  }

  /**
   * One Lloyd (k-means) iteration: recompute centroids from the
   * current `label` assignment ([[centroids]]), then re-assign every
   * vector to its nearest centroid by squared euclidean distance
   * (`‖x‖² − 2·x·c + ‖c‖²`, sequential-order dots). Ties break to the
   * lowest centroid id. Output: (vec_id, old_label, new_label, d2).
   *
   * Assignment mirrors the IVF-build shape: centroids broadcast, the
   * corpus never shuffles with its vectors — the argmin lowers to an
   * aggregate with map-side combine (a struct min), so the only
   * exchange after the broadcast join carries one row per vector.
   * Iterating to convergence is a driver loop over this function;
   * each pass is one scan + one tiny exchange.
   */
  /**
   * Lloyd's algorithm to convergence: iterate [[kmeansIter]] from a
   * deterministic seeding (`hash60(id) mod k` — engine-reproducible,
   * no RNG state) until no vector changes cluster or `maxIters` runs
   * out. Each round is one scan + one tiny exchange; labels
   * materialize per round so the loop's lineage stays flat (the
   * [[Dedup.clusters]] discipline — `localCheckpoint` by default,
   * [[CheckpointMode.Reliable]] for executor-loss durability), and
   * the moved-count rides the already-materialized frame. Returns the final
   * (vec_id, label, d2) assignment; callers wanting the centroid
   * table feed it back through [[centroids]].
   */
  def kmeansRun(df: DataFrame, id: Column, vec: Column, k: Int,
      maxIters: Int = 20,
      ckpt: CheckpointMode = CheckpointMode.Local): DataFrame = {
    require(k >= 1 && maxIters >= 1, "k and maxIters must be >= 1")
    val base = ckpt(df.filter(vec.isNotNull && size(vec) > 0)
      .select(id.as("vec_id"), vec.as("emb"))
      ) // the loop re-scans this frame every round
    var labels = ckpt(base.select(col("vec_id"),
        pmod(graft.functions.Hash60Expr.hash60(col("vec_id").cast("string")),
          lit(k.toLong)).as("label")))
    var moved = 1L
    var iters = 0
    // in-loop steps: LAZY local checkpoint under the default eager
    // mode — the moved-count scan right below materializes the blocks
    // inside its own job (one job per round instead of two; the
    // Dedup.clustersLabelProp r18 note has the full safety argument)
    val stepCkpt: CheckpointMode =
      if (ckpt == CheckpointMode.Local) CheckpointMode.Lazy else ckpt
    while (moved > 0 && iters < maxIters) {
      val step = stepCkpt(kmeansIter(base.join(labels, "vec_id"),
          col("vec_id"), col("emb"), col("label"))
        .select(col("vec_id"), col("old_label"),
          col("new_label").as("label"), col("d2")))
      moved = step.filter(col("label") =!= col("old_label")).count()
      labels = step.select(col("vec_id"), col("label"), col("d2"))
      iters += 1
    }
    labels
  }

  /**
   * Johnson–Lindenstrauss random projection with a ±1 sign matrix
   * (Achlioptas, 2003: database-friendly random projections — ±1
   * entries preserve pairwise distances like Gaussian ones): project
   * `inDim`-dim vectors to `outDim` dims as `proj_k = ⟨v, s_k⟩`,
   * `s_k ∈ {−1,+1}^inDim`. The cheap dimensionality cut in front of
   * ANN/clustering when 64–1024 dims are too wide to shuffle.
   *
   * The sign matrix is derived from md5 of `(seed, k, j)` — no RNG
   * state, so ANY engine (and any re-run, any partition layout)
   * builds the identical matrix; [[signMatrix]] is public so oracle
   * generators embed the same literals. Each component is one
   * codegen'd sequential dot against a literal array: a pure
   * projection over the scan, no shuffle, `outDim` fused multiplies
   * per row — I/O-bound at 100 TB like [[quantize]].
   *
   * `inDim` must equal the stored vector length (the dot truncates to
   * the shorter operand, so a mismatch silently projects a prefix).
   */
  def randomProjection(df: DataFrame, id: Column, vec: Column,
      outDim: Int, inDim: Int, seed: String = "jl"): DataFrame = {
    require(outDim >= 1 && inDim >= 1, "dims must be >= 1")
    val signs = signMatrix(outDim, inDim, seed)
    df.filter(vec.isNotNull && size(vec) > 0)
      .select(id.as("vec_id"),
        array(signs.toIndexedSeq.map(s => dot(vec, typedLit(s))): _*).as("proj"))
  }

  /** The ±1 projection matrix, row per output dim — deterministic in
   * `(seed, k, j)` alone (first md5 nibble < 8 ⇒ +1). */
  def signMatrix(outDim: Int, inDim: Int, seed: String): Array[Array[Double]] =
    Array.tabulate(outDim) { k =>
      Array.tabulate(inDim) { j =>
        val d = java.security.MessageDigest.getInstance("MD5")
          .digest(s"$seed:$k:$j".getBytes(java.nio.charset.StandardCharsets.UTF_8))
        if (((d(0) >> 4) & 0xF) < 8) 1.0 else -1.0
      }
    }

  def kmeansIter(df: DataFrame, id: Column, vec: Column, label: Column): DataFrame = {
    val cents = broadcast(centroids(df, vec, label)
      .select(col("lbl").as("cent_id"), col("cv"))
      .withColumn("cc", dot(col("cv"), col("cv"))))
    df.filter(vec.isNotNull && size(vec) > 0)
      .select(id.as("vec_id"), label.as("old_label"), vec.as("v"))
      .withColumn("xx", dot(col("v"), col("v")))
      .crossJoin(cents)
      .withColumn("d2",
        col("xx") - lit(2.0) * dot(col("v"), col("cv")) + col("cc"))
      .groupBy(col("vec_id"))
      .agg(first(col("old_label")).as("old_label"),
        min(struct(col("d2"), col("cent_id"))).as("m"))
      .select(col("vec_id"), col("old_label"),
        col("m.cent_id").as("new_label"), col("m.d2").as("d2"))
  }

  /** Fixed-grid component quantization shared by the covariance/PCA
   * family: `q_i = round(x_i · 2^scaleBits)` — a power-of-two grid,
   * so the float→double widening and the scale multiply are both
   * EXACT and every engine lands on the identical integer. Kept as
   * integral DOUBLES (exact below 2⁵³) so [[Similarity.dot]] consumes
   * the grid directly; covariance casts to long for the integer
   * aggregates. */
  private def qGrid(vec: Column, scaleBits: Int): Column =
    transform(vec, x =>
      round(x.cast("double") * lit(math.pow(2.0, scaleBits))))


  /**
   * Exact mean-centered covariance of an embedding column on the
   * 2^`scaleBits` integer grid — the matrix PCA/whitening/drift
   * detection read. Emits one row per (i, j) cell:
   * `cov_micro = round_half_away(10⁶ · (n·S_ij − M_i·M_j) / (n²·2^(2·scaleBits)))`
   * where `S_ij = Σ q_i·q_j` and `M_i = Σ q_i` over grid-quantized
   * components — covariance·10⁶ in the ORIGINAL units, n-normalized
   * (population form). Every step is integer/DECIMAL(38,0) with the
   * [[graft.functions.ratio6]] half-away division, so any engine
   * reproduces the cells bit-for-bit — no double ever forms.
   *
   * Scale shape: the double dim-explode generates N·d² product rows,
   * but they partial-aggregate map-side into ≤ d² cells per task —
   * the exchange carries d² tiny rows (the [[centroids]] argument,
   * squared). The d²-cell result is a BOUNDED artifact: corpus size
   * never reaches the driver or the shuffle. Exact covariance is
   * inherently O(N·d²) multiply-adds; for d ≫ 10³ cut with
   * [[randomProjection]] first.
   */
  def covarianceMicro(df: DataFrame, vec: Column, dim: Int,
      scaleBits: Int = 20,
      ckpt: CheckpointMode = CheckpointMode.Local): DataFrame =
    covarianceFinalize(covarianceSketch(df, vec, dim, scaleBits, ckpt),
      scaleBits)

  /**
   * The PERSISTABLE second-moment sketch behind [[covarianceMicro]]:
   * `(stat, i, j, v)` rows holding the exact DECIMAL(38,0) sums —
   * upper-triangle `Σ q_i·q_j` cells (`stat 's'`), per-dimension
   * `Σ q_i` moments (`'m'`, j = −1) and the row count (`'n'`,
   * i = j = −1). All three are plain sums, so [[covarianceMerge]] is
   * an EXACT homomorphism: part/day/stream sketches add up to
   * precisely the union's sketch, and [[covarianceFinalize]] of the
   * merged artifact is bit-identical to a from-scratch build — the
   * [[graft.operators.CorpusStats.kmvSketch]] discipline for the
   * covariance/PCA family (standing stream:
   * [[graft.streaming.SeriesStream.covarianceSketchStream]]).
   *
   * Tiered exact summation: the N·d² product rows sum as LONGs within
   * each input partition (primitive codegen — a straight DECIMAL sum
   * here measured 5× the whole query), and only the d²·P partition
   * partials merge in DECIMAL(38,0). Exact while a partition's
   * Σ|q_i·q_j| stays under 2⁶³: at scaleBits=20 and |x| ≤ 1 that is
   * ~8M rows per input partition — set
   * spark.sql.files.maxPartitionBytes accordingly for wider inputs.
   * Symmetry: only the upper triangle is generated (slice the tail of
   * the vector at each i), halving the dominant agg's input;
   * [[covarianceFinalize]] mirrors the cells after the merge.
   */
  def covarianceSketch(df: DataFrame, vec: Column, dim: Int,
      scaleBits: Int = 20,
      ckpt: CheckpointMode = CheckpointMode.Local): DataFrame =
    covarianceSketchImpl(df, vec, None, dim, scaleBits, ckpt)

  /** [[covarianceSketch]] for SEVERAL disjoint splits in ONE corpus
   * pass: `part` keys the split, and for every non-empty split the
   * `(stat, i, j, v)` rows under its `part` value are exactly
   * `covarianceSketch(df.filter(part === p))`'s (spec-pinned) — so
   * [[covarianceMerge]] over this output (part column projected away)
   * is bit-identical to merging separately-built per-split sketches,
   * at ONE corpus scan instead of one per split (guide §6). The one
   * divergence: an EMPTY split emits no rows here, where the separate
   * build emits its `('n', −1, −1, 0)` row — immaterial to any merge
   * (sums of zero), stated for the record. */
  def covarianceSketchBy(df: DataFrame, vec: Column, part: Column,
      dim: Int, scaleBits: Int = 20,
      ckpt: CheckpointMode = CheckpointMode.Local): DataFrame =
    covarianceSketchImpl(df, vec, Some(part), dim, scaleBits, ckpt)

  private def covarianceSketchImpl(df: DataFrame, vec: Column,
      part: Option[Column], dim: Int, scaleBits: Int,
      ckpt: CheckpointMode): DataFrame = {
    require(dim >= 1 && scaleBits >= 0 && scaleBits <= 25,
      "dim >= 1 and 0 <= scaleBits <= 25 required")
    val pDef = part.map(p => p.as("__part")).toSeq
    val pKey = part.map(_ => col("__part")).toSeq
    val q = df.filter(vec.isNotNull && size(vec) === dim)
      .select(pDef :+
        transform(qGrid(vec, scaleBits), x => x.cast("long")).as("q"): _*)
    // ONE corpus pass (r18, guide §1.2/§6 — the pre-r18 shape ran the
    // N·d² explode twice, products then moments, with an eager
    // checkpoint barrier between): each (row, i) tail-product explode
    // carries a SENTINEL 1 appended past the slice, whose "product"
    // qi·1 is the first moment and whose count is the row count — so
    // moments and n ride the same aggregation as the second-moment
    // cells. The sentinel lands at dj = dim − i, i.e. j = dim —
    // outside every product cell's j ∈ [i, dim).
    val terms = q
      .select(pKey ++ Seq(posexplode(col("q")).as(Seq("i", "qi")),
        col("q")): _*)
      .select(pKey ++ Seq(col("i"), col("qi"),
        posexplode(concat(slice(col("q"), col("i") + lit(1), lit(dim)),
          array(lit(1L)))).as(Seq("dj", "qj")),
        spark_partition_id().as("pid")): _*)
    // tiered exact summation, bound unchanged (see scaladoc): LONG
    // within each input partition, DECIMAL(38,0) across the partials;
    // the sentinel group's per-partition |Σ q_i·1| sits under the
    // product bound. Materialized HERE — ≤ d(d+1)/2 + d cells (per
    // part) — so the three emitted shapes below and every finalize
    // consumer derive from the checkpointed cells, never re-running
    // the corpus pass.
    val partials = ckpt(terms
      .groupBy(pKey ++ Seq(col("i"), (col("i") + col("dj")).as("j"),
        col("pid")): _*)
      .agg(sum(col("qi") * col("qj")).as("sl"), count(lit(1)).as("cl"))
      .groupBy(pKey ++ Seq(col("i"), col("j")): _*)
      .agg(sum(col("sl").cast("decimal(38,0)")).as("v"),
        sum(col("cl")).as("cnt")))
    val upper = partials.filter(col("j") < lit(dim))
      .select(pKey ++ Seq(lit("s").as("stat"),
        col("i").cast("long").as("i"), col("j").cast("long").as("j"),
        col("v")): _*)
    val mRows = partials.filter(col("j") === lit(dim))
      .select(pKey ++ Seq(lit("m").as("stat"),
        col("i").cast("long").as("i"), lit(-1L).as("j"), col("v")): _*)
    // n = the sentinel count at any i (every valid row carries every
    // i) — max over i, exactly the old per-i count's max. The
    // unsplit form keeps the GLOBAL agg so an empty corpus still
    // emits its ('n', 0) row (the bit-for-bit empty-build contract,
    // covarianceDelete); the split form groups by part, so empty
    // splits emit nothing (documented at [[covarianceSketchBy]]).
    val nRow = part match {
      case None => partials.filter(col("j") === lit(dim))
        .agg(coalesce(max(col("cnt")), lit(0L)).cast("decimal(38,0)")
          .as("v"))
        .select(lit("n").as("stat"), lit(-1L).as("i"), lit(-1L).as("j"),
          col("v"))
      case Some(_) => partials.filter(col("j") === lit(dim))
        .groupBy(col("__part"))
        .agg(max(col("cnt")).cast("decimal(38,0)").as("v"))
        .select(col("__part"), lit("n").as("stat"), lit(-1L).as("i"),
          lit(-1L).as("j"), col("v"))
    }
    val out = upper.unionByName(mRows).unionByName(nRow)
    if (part.isDefined) out.withColumnRenamed("__part", "part") else out
  }

  /** Merge [[covarianceSketch]] frames: per-(stat, i, j) DECIMAL sums
   * — associative, commutative, exact. */
  def covarianceMerge(sketches: DataFrame): DataFrame =
    sketches.groupBy(col("stat"), col("i"), col("j"))
      .agg(sum(col("v")).cast("decimal(38,0)").as("v"))

  /** TAKEDOWN propagation for the covariance sketch — the moment
   * sums are plain additions, so the delete is exactly invertible
   * (the [[graft.operators.CorpusStats.countMinDelete]] turnstile
   * contract): sketch the deleted rows alone (same dim/scaleBits —
   * the caller's params contract, as in [[covarianceMerge]]) and
   * subtract cell-wise. If every ingested row is deleted (the "n"
   * count reaches zero) the FROM-SCRATCH EMPTY build returns (the
   * single ('n', −1, −1, 0) row an empty-corpus covarianceSketch
   * emits — not a zero-row frame, so the bit-for-bit contract holds
   * at the boundary too); otherwise post-delete ≡
   * [[covarianceSketch]] over corpus ∖ deleted, bit-for-bit
   * (spec-pinned) — standing PCA artifacts survive takedowns without
   * a corpus re-scan of the remaining embeddings. */
  def covarianceDelete(sketch: DataFrame, deleted: DataFrame, vec: Column,
      dim: Int, scaleBits: Int = 20): DataFrame = {
    val neg = covarianceSketch(deleted, vec, dim, scaleBits)
      .withColumn("v", negate(col("v")))
    val merged = covarianceMerge(sketch.unionByName(neg))
      .localCheckpoint() // read twice: the emptiness probe + the result
    val alive = merged.filter(col("stat") === "n")
      .agg(coalesce(sum(col("v")), lit(0L).cast("decimal(38,0)")))
      .head().getDecimal(0)
    if (alive.signum() < 0) throw new IllegalArgumentException(
      "covarianceDelete: row count went negative — the deleted rows " +
        "were not a subset of what this sketch ingested")
    if (alive.signum() == 0)
      covarianceSketch(deleted.limit(0), vec, dim, scaleBits)
    else merged
  }

  /** The ratio emit of [[covarianceMicro]], off a (possibly merged)
   * [[covarianceSketch]]: mirror the upper triangle, join moments,
   * half-away integer-ratio micro cells via
   * [[graft.functions.CovRatioMicroExpr]] — exact BigInteger
   * arithmetic per d²-bounded cell, so the emit has NO row-count
   * ceiling of its own (the pre-r14 DECIMAL(38,0) chain overflowed
   * at n ≈ 4.7e9 for scaleBits = 20). What remains is the SKETCH
   * sums' own DECIMAL(38,0) capacity: `s ≤ n·2^(2·sb)` must stay
   * under 10³⁸, i.e. n ≤ ~8.7e25 at sb = 20 — past any physical
   * corpus, but still scan-asserted so a silent sum overflow can
   * never reach the cells. */
  def covarianceFinalize(sketch: DataFrame, scaleBits: Int): DataFrame = {
    val upper = sketch.filter(col("stat") === "s")
      .select(col("i"), col("j"), col("v").as("s"))
    val cells = upper.unionByName(upper.filter(col("i") < col("j"))
      .select(col("j").as("i"), col("i").as("j"), col("s")))
    val moments = sketch.filter(col("stat") === "m")
      .select(col("i"), col("v").as("m"))
    val nLim = (BigInt(10).pow(38) - 1) / (BigInt(1) << (2 * scaleBits))
    val n = sketch.filter(col("stat") === "n")
      .agg(coalesce(sum(col("v")), lit(0L).cast("decimal(38,0)")).as("n"))
      .where(assert_true(
        col("n") <= lit(nLim.toString).cast("decimal(38,0)"),
        concat(lit("covarianceFinalize: n="), col("n"),
          lit(s" exceeds the sketch-sum decimal(38,0) capacity $nLim at " +
            s"scaleBits=$scaleBits — second-moment sums would have " +
            "overflowed; lower scaleBits or reduce dimensionality first")))
        .isNull)
    cells
      .join(broadcast(moments.select(col("i"), col("m").as("mi"))), "i")
      .join(broadcast(moments.select(col("i").as("j"), col("m").as("mj"))),
        "j")
      .crossJoin(broadcast(n))
      .select(col("i"), col("j"),
        graft.functions.CovRatioMicroExpr.covRatioMicro(col("n"), col("s"),
          col("mi"), col("mj"), scaleBits).as("cov_micro"))
  }

  /**
   * Signed squared correlation off a [[covarianceMicro]] frame:
   * `r2_ppm = sign(cov_ij) · ⌈cov_ij²·10⁶ / (cov_ii·cov_jj)⌉_half` —
   * the dimension-redundancy matrix (which embedding coordinates
   * carry the same signal) WITHOUT the square root that would break
   * integer exactness: |r| = √(|r²|), and ranking/thresholding on r²
   * is order-equivalent. Zero-variance dimensions emit null. Pure
   * joins over the d²-cell artifact — no corpus access.
   */
  def correlationPpm(cov: DataFrame): DataFrame = {
    import graft.functions.ldiv
    val diag = cov.filter(col("i") === col("j"))
      .select(col("i").as("d"), col("cov_micro").as("vr"))
    val num = (col("cov_micro").cast("decimal(38,0)") *
      col("cov_micro").cast("decimal(38,0)") * lit(1000000L))
      .cast("decimal(38,0)")
    val den = (col("vi").cast("decimal(38,0)") *
      col("vj").cast("decimal(38,0)")).cast("decimal(38,0)")
    cov
      .join(broadcast(diag.select(col("d").as("i"), col("vr").as("vi"))),
        "i")
      .join(broadcast(diag.select(col("d").as("j"), col("vr").as("vj"))),
        "j")
      .select(col("i"), col("j"),
        when(col("vi") > 0 && col("vj") > 0,
          when(col("cov_micro") < 0, lit(-1L)).otherwise(lit(1L)) *
            ldiv(num * lit(2L) + den, den * lit(2L))
        ).cast("long").as("r2_ppm"))
  }

  /**
   * Dominant eigenvector of a [[covarianceMicro]] matrix by power
   * iteration with max-norm rescaling — every step INTEGER (BigInt
   * multiply-adds, half-away-from-zero integer-ratio rescale), so the
   * result is engine-reproducible with no float anywhere: an L2
   * rescale would need a sqrt no SQL engine evaluates exactly, while
   * `max|s|` is exact on all of them. The matrix is a d²-cell bounded
   * artifact, so the loop runs driver-side (the
   * [[graft.operators.CorpusStats.bpeTrain]] pattern); corpus size
   * never enters. Returns the micro-scaled component vector
   * (∞-norm = 10⁶; sign as the iteration converges — deterministic,
   * both engines land on the same one). A zero matrix returns the
   * all-10⁶ start vector unchanged.
   */
  def pcaPowerMicro(cov: DataFrame, dim: Int, iters: Int = 4): Array[Long] =
    pcaComponentsMicro(cov, dim, m = 1, iters).head

  /**
   * Top-`m` principal components by power iteration + INTEGER
   * Hotelling deflation: after each component converges, subtract its
   * Rayleigh-scaled outer product — `C ← C − ⌈λ·v vᵀ/(vᵀv)⌉_half`
   * with `λ = (vᵀCv)/(vᵀv)` — all in exact BigInt arithmetic with the
   * same half-away-from-zero integer-ratio rounding as the covariance
   * cells, so every engine lands on the identical deflated matrix and
   * the identical next component. Deflation at micro rounding keeps
   * components orthogonal to ~10⁻⁶, which is the grid's own
   * resolution. The whole loop is driver-side on the d²-cell bounded
   * artifact ([[pcaPowerMicro]]'s argument, m times over).
   */
  def pcaComponentsMicro(cov: DataFrame, dim: Int, m: Int,
      iters: Int = 4): Array[Array[Long]] =
    pcaVariancesMicro(cov, dim, m, iters).map(_._1)

  /** [[pcaComponentsMicro]] plus each component's Rayleigh eigenvalue
   * `λ_micro = ⌈vᵀCv / vᵀv⌉_half` (covariance micro units) — the
   * number the explained-variance report reads; exact integers, same
   * rounding as the cells. */
  def pcaVariancesMicro(cov: DataFrame, dim: Int, m: Int,
      iters: Int = 4): Array[(Array[Long], Long)] = {
    require(dim >= 1 && iters >= 1 && m >= 1 && m <= dim,
      "need dim >= 1, iters >= 1, 1 <= m <= dim")
    val cells = scala.collection.mutable.Map[(Int, Int), BigInt]()
    cov.select(col("i").cast("long"), col("j").cast("long"),
        col("cov_micro")).collect()
      .foreach(r => cells.update(
        (r.getLong(0).toInt, r.getLong(1).toInt), BigInt(r.getLong(2))))
    def halfAway(p: BigInt, d: BigInt): BigInt = {
      val mag = (p.abs * 2 + d) / (d * 2)
      if (p < 0) -mag else mag
    }
    (0 until m).map { _ =>
      var v = Array.fill(dim)(BigInt(1000000L))
      for (_ <- 1 to iters) {
        val s = Array.tabulate(dim) { i =>
          (0 until dim).map(j =>
            cells.getOrElse((i, j), BigInt(0)) * v(j)).sum
        }
        val mx = s.map(_.abs).max
        if (mx > 0)
          v = s.map(si =>
            (if (si < 0) -BigInt(1) else BigInt(1)) *
              ((si.abs * 2000000L + mx) / (mx * 2)))
      }
      // Hotelling deflation in the same exact integer discipline
      val num = (for (i <- 0 until dim; j <- 0 until dim)
        yield cells.getOrElse((i, j), BigInt(0)) * v(i) * v(j)).sum
      val den = v.map(x => x * x).sum
      val dd = den * den
      for (i <- 0 until dim; j <- 0 until dim) {
        val delta = halfAway(num * v(i) * v(j), dd)
        if (delta != 0)
          cells.update((i, j), cells.getOrElse((i, j), BigInt(0)) - delta)
      }
      (v.map(_.toLong), halfAway(num, den).toLong)
    }.toArray
  }

  /**
   * Projection of every vector onto a micro-scaled component (the
   * [[pcaPowerMicro]] artifact): `proj_pico = Σ v_j · q_j` on the
   * same 2^`scaleBits` grid. All addends are integers below 2⁵³, so
   * the codegen'd sequential dot is EXACT even in double — one
   * projection over the scan, no shuffle ([[randomProjection]]'s
   * shape). Scores are uncentered: centering shifts every projection
   * by the same constant, so ranking/thresholding semantics are
   * identical.
   */
  def pcaProject(df: DataFrame, id: Column, vec: Column, v: Array[Long],
      scaleBits: Int = 20): DataFrame = {
    val vlit = array(v.map(x => lit(x.toDouble)): _*)
    df.filter(vec.isNotNull && size(vec) === v.length)
      .select(id.as("vec_id"),
        dot(qGrid(vec, scaleBits), vlit).cast("long").as("proj_pico"))
  }

  /** The composed flagship: covariance → power iteration → per-vector
   * principal-component scores, end to end. */
  def pca(df: DataFrame, id: Column, vec: Column, dim: Int,
      iters: Int = 4, scaleBits: Int = 20): DataFrame =
    pcaProject(df, id, vec,
      pcaPowerMicro(covarianceMicro(df, vec, dim, scaleBits), dim, iters),
      scaleBits)

  /**
   * PCA-space outlier scores — the truncated-Mahalanobis anomaly
   * measure over the top `m` components: each vector's
   * `Σ_c (proj_c − μ_c)² / λ_c` (MEAN-CENTERED projection,
   * variance-normalized by its component's eigenvalue), the "how
   * unusual is this embedding along the directions that matter"
   * number a curation pipeline reviews next to [[labelOutliers]].
   * Centering matters HERE where it doesn't in [[pcaProject]]: a
   * constant shift preserves linear rankings but not squared ones —
   * on data with a nonzero mean (typical for real embeddings) an
   * uncentered square adds a per-vector cross-term that biases the
   * ranking toward vectors far from the ORIGIN rather than far from
   * the mean. Each component's projected mean
   * `μ_c = ⌈(Σ_i v_i·m_i) / n⌉_half` (pico units) comes EXACTLY from
   * the covariance sketch's own moment rows — one BigInt ratio
   * driver-side, embedded as a literal; its half-away rounding is
   * ≤ 0.5 pico, the grid's own resolution. Per-component
   * contributions are exact integer ratios
   * (`⌈(proj_pico − μ_c)² / (2^(2·scaleBits)·λ_micro)⌉_half`, micro
   * units) summed AFTER rounding — engine-reproducible like
   * everything else in the family; non-positive-λ components
   * contribute 0. One covariance build + one projection scan.
   */
  def pcaOutliers(df: DataFrame, id: Column, vec: Column, dim: Int,
      m: Int, iters: Int = 4, scaleBits: Int = 20): DataFrame = {
    import graft.functions.ldiv
    // one sketch build feeds BOTH the covariance cells (components)
    // and the moment rows (projection means) — covarianceSketch
    // materializes, so the second read is artifact-sized
    val sketch = covarianceSketch(df, vec, dim, scaleBits)
    val comps = pcaVariancesMicro(covarianceFinalize(sketch, scaleBits),
      dim, m, iters)
    val mo = Array.fill(dim)(BigInt(0))
    sketch.filter(col("stat") === "m").select(col("i"), col("v"))
      .collect()
      .foreach(r => mo(r.getLong(0).toInt) =
        BigInt(r.getDecimal(1).toBigInteger))
    val n = sketch.filter(col("stat") === "n").select(col("v"))
      .collect().headOption
      .map(r => BigInt(r.getDecimal(0).toBigInteger))
      .getOrElse(BigInt(0))
    def halfAway(p: BigInt, d: BigInt): BigInt = {
      val mag = (p.abs * 2 + d) / (d * 2)
      if (p < 0) -mag else mag
    }
    val g = qGrid(vec, scaleBits)
    val contribs = comps.zipWithIndex.map { case ((v, lam), c) =>
      val mu =
        if (n > 0)
          halfAway(v.zipWithIndex.map { case (vi, i) =>
            BigInt(vi) * mo(i) }.sum, n).toLong
        else 0L
      val cp = (dot(g, array(v.map(x => lit(x.toDouble)): _*))
        .cast("long") - lit(mu)).cast("decimal(38,0)")
      val den = java.math.BigDecimal.valueOf(lam)
        .multiply(new java.math.BigDecimal(
          java.math.BigInteger.ONE.shiftLeft(2 * scaleBits)))
      if (lam > 0)
        ldiv(cp * cp * lit(2L) + lit(den), lit(den) * lit(2L))
          .cast("long").as(s"m${c}_micro")
      else lit(0L).as(s"m${c}_micro")
    }
    df.filter(vec.isNotNull && size(vec) === dim)
      .select(id.as("vec_id") +: contribs: _*)
      .withColumn("score_micro",
        (0 until m).map(c => col(s"m${c}_micro")).reduce(_ + _))
  }

  /** [[pca]] for the top `m` components: one covariance build, m
   * deflation rounds, one projection scan emitting
   * `(vec_id, proj0_pico … proj{m-1}_pico)` — the m-wide reduced
   * representation a curation pipeline plots/buckets on. */
  def pcaTopM(df: DataFrame, id: Column, vec: Column, dim: Int, m: Int,
      iters: Int = 4, scaleBits: Int = 20): DataFrame = {
    val comps = pcaComponentsMicro(
      covarianceMicro(df, vec, dim, scaleBits), dim, m, iters)
    val g = qGrid(vec, scaleBits)
    df.filter(vec.isNotNull && size(vec) === dim)
      .select(id.as("vec_id") +: comps.zipWithIndex.map { case (v, c) =>
        dot(g, array(v.map(x => lit(x.toDouble)): _*))
          .cast("long").as(s"proj${c}_pico")
      }.toSeq: _*)
  }
}
