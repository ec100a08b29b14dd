package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.operators.Dedup

/** Ad-hoc sub-stage probe for [[Dedup.containmentPairs]] (r18,
 * VERDICT r17 task 4: the suite's #3 query anti-scaled 32→8 cores in
 * the driver's scaling block): times the hashed-set build, the
 * token/frequency pass, the prefix selection, the candidate join, and
 * the full query, at the core count in `$SPARK_GRAFT_CPUS` — so the
 * 32-core premium can be attributed to a stage instead of a query.
 *
 * Usage: runMain graft.tools.ProbeContainment <sfDir> [threshold]
 */
object ProbeContainment {
  def main(args: Array[String]): Unit = {
    val dir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val threshold = if (args.length > 1) args(1).toDouble else 0.85
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val docs = spark.read.parquet(s"$dir/documents.parquet")
      .select(col("doc_id"), col("text"))
    def time(name: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val n = f
      println(f"PROBE containment[$cpus] $name: " +
        f"${(System.nanoTime() - t0) / 1e9}%.2f s ($n rows)")
    }
    (1 to 3).foreach { r =>
      println(s"== round $r (cpus=$cpus) ==")
      time("hsets-ckpt") {
        Dedup.hashedShingleSets(docs, col("doc_id"), col("text"))
          .localCheckpoint().count()
      }
      val hs = Dedup.hashedShingleSets(docs, col("doc_id"), col("text"))
        .localCheckpoint()
      val hsets = hs.filter(size(col("hs")) > 0)
      val toks = hsets.select(col("doc_id"), size(col("hs")).as("sz"),
        explode(col("hs")).as("sh"))
      time("freq") {
        toks.groupBy(col("sh")).agg(count(lit(1)).as("c")).count()
      }
      val freq = toks.groupBy(col("sh")).agg(count(lit(1)).as("c"))
      val pre = toks.join(freq, Seq("sh"))
        .groupBy(col("doc_id"), col("sz"))
        .agg(array_sort(collect_list(struct(col("c"), col("sh")))).as("ord"))
        .withColumn("p", greatest(lit(1),
          (col("sz") - ceil(lit(threshold) * col("sz").cast("double") -
            lit(1e-9)) + 1).cast("int")))
        .select(col("doc_id"), col("sz"),
          explode(expr("slice(ord, 1, p)")).as("t"))
        .select(col("doc_id"), col("sz"), col("t.sh").as("sh"))
      time("pre") { pre.count() }
      val cands = pre.alias("l")
        .join(toks.select(col("doc_id"), col("sz"), col("sh")).alias("r"),
          col("l.sh") === col("r.sh") && col("l.doc_id") =!= col("r.doc_id") &&
            col("r.sz").cast("double") >=
              lit(threshold) * col("l.sz").cast("double") - lit(1e-9))
        .select(col("l.doc_id").as("id_in"), col("r.doc_id").as("id_out"))
        .distinct()
      time("cands") { cands.count() }
      time("full-query") {
        Dedup.containmentPairs(docs, col("doc_id"), col("text"), threshold)
          .count()
      }
    }
    spark.stop()
  }
}
