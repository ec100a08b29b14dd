package graft.tools

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/**
 * Perf-only scale-up generator: derives an approximately-`factor`×
 * dataset from a driver-provided SF directory, for benchmarking scan
 * parallelism, shuffle sizing, and join strategy at data sizes the
 * fixed testdata doesn't cover (its sf0.1 parquet is a single row
 * group, so every scan stage is one task and stage latency dominates —
 * BASELINE.md). Correctness gates do NOT use this data; the driver's
 * parquet stays the only oracle input.
 *
 * Scaling follows TPC-H's shape: region/nation stay fixed; the fact
 * and per-SF dimension tables replicate `factor`× with key offsets
 * that keep join fan-in/fan-out per replica identical to the source
 * (replica k's orders reference replica k's customers, and so on).
 * Events keep their timestamps (buckets get denser, as a busier series
 * would) with a +k ns nudge so replicas don't collide on a key.
 * Document text is perturbed with ~n/3 replica-unique tokens so
 * replicas land BELOW the near-dup Jaccard threshold — dedup workload
 * grows linearly, not as replica-clique pair blowup; embeddings get a
 * deterministic per-replica nudge for the same reason.
 *
 * Usage: `runMain graft.tools.ScaleGen <srcDir> <outDir> [factor=10] [files=32]`
 */
object ScaleGen {

  def main(args: Array[String]): Unit = {
    val src = args(0)
    val out = args(1)
    val factor = if (args.length > 2) args(2).toInt else 10
    val files = if (args.length > 3) args(3).toInt else 32
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    generate(spark, src, out, factor, files)
    spark.stop()
  }

  def generate(spark: SparkSession, src: String, out: String,
      factor: Int, files: Int): Unit = {
    def read(name: String): DataFrame = spark.read.parquet(s"$src/$name.parquet")
    def write(name: String, df: DataFrame): Unit =
      df.repartition(files).write.mode(SaveMode.Overwrite)
        .parquet(s"$out/$name.parquet")
    def maxOf(df: DataFrame, c: String): Long =
      df.agg(max(col(c))).head().getLong(0) + 1

    // fixed dims copy through untouched (multi-file is pointless there)
    Seq("region", "nation").foreach { n =>
      read(n).write.mode(SaveMode.Overwrite).parquet(s"$out/$n.parquet")
    }

    /** factor× replication: per replica k (kept as `__k` for further
     * perturbation), add `off(col) * k` to each listed key column. */
    def replicated(df: DataFrame, offsets: (String, Long)*): DataFrame = {
      val reps = explode(sequence(lit(0L), lit(factor - 1L))).as("__k")
      offsets.foldLeft(df.select(col("*"), reps)) { case (d, (c, off)) =>
        d.withColumn(c, col(c) + col("__k") * lit(off))
      }
    }
    def replicate(df: DataFrame, offsets: (String, Long)*): DataFrame =
      replicated(df, offsets: _*).drop("__k")

    val cust = read("customer"); val supp = read("supplier")
    val part = read("part"); val ord = read("orders")
    val (mc, ms, mp, mo) = (maxOf(cust, "c_custkey"), maxOf(supp, "s_suppkey"),
      maxOf(part, "p_partkey"), maxOf(ord, "o_orderkey"))
    write("customer", replicate(cust, "c_custkey" -> mc))
    write("supplier", replicate(supp, "s_suppkey" -> ms))
    write("part", replicate(part, "p_partkey" -> mp))
    write("orders", replicate(ord, "o_orderkey" -> mo, "o_custkey" -> mc))
    write("lineitem", replicate(read("lineitem"),
      "l_orderkey" -> mo, "l_suppkey" -> ms, "l_partkey" -> mp))

    val ev = read("events")
    val me = maxOf(ev, "event_id")
    // schema-adaptive nudge (the driver has shipped ts as both epoch-ns
    // BIGINT and TIMESTAMP(MICROS)): +k at the column's own resolution —
    // replicas stay distinct keys, buckets/windows unchanged. Output
    // keeps the INPUT schema so the engine's normalizer sees the same
    // shape the driver shipped.
    val tsNudge = ev.schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType => col("ts") + col("__k")
      case _ => expr("timestampadd(MICROSECOND, __k, ts)")
    }
    write("events", replicated(ev, "event_id" -> me)
      .withColumn("ts", tsNudge)
      .drop("__k"))

    val docs = read("documents")
    val md = maxOf(docs, "doc_id")
    write("documents", replicated(docs, "doc_id" -> md)
      .withColumn("text",
        when(col("__k") === 0, col("text")).otherwise(concat(col("text"), lit(" "),
          // ~n/3 replica-unique tokens: Jaccard vs the original ≈ 0.75,
          // below the 0.8 near-dup gate — replicas are similar, not dups
          // doc-scoped replica tokens: a suffix shared ACROSS docs
          // would give unrelated docs common shingles and degenerate
          // LSH buckets; keyed by (doc, k, i) nothing is shared
          concat_ws(" ", transform(
            sequence(lit(1),
              greatest((size(split(col("text"), " ")) / 3).cast("int"), lit(1))),
            i => concat(lit("r"), col("doc_id"), lit("x"), i))))))
      .drop("__k"))

    val emb = read("embeddings")
    val mv = maxOf(emb, "vec_id")
    write("embeddings", replicated(emb, "vec_id" -> mv)
      .withColumn("embedding", transform(col("embedding"),
        (x, i) => (x + (col("__k") % 7).cast("float") * lit(0.01f) *
          ((i % 5).cast("float") - lit(2.0f)))))
      .drop("__k"))
  }
}
