package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.operators.{CheckpointMode, Graphs}

/** Interleaved A/B of CheckpointMode.Local vs Lazy for the
 * fixed-iteration graph loops (pagerank / ppr / hits) on the bench
 * graph — measures what the per-round eager barrier costs and pins
 * output equality. Temporary probe, not library surface. */
object ProbeGraphCkpt {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    // the events_pagerank/hits gate edge construction
    val ev = graft.Queries.eventsNs(spark, sfDir).select(
      expr("ts div 1000").as("ts"), col("user_id"), col("event_id"),
      concat(col("event_type"), lit(":"),
        (abs(floor(col("value"))).cast("long") % 4).cast("string"))
        .as("node"))
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("ts"), col("event_id"))
    val edges = ev.withColumn("nxt", lead(col("node"), 1).over(w))
      .filter(col("nxt").isNotNull)
    def pr(m: CheckpointMode) =
      Graphs.pagerank(edges, col("node"), col("nxt"), iterations = 4,
        ckpt = m).orderBy(col("node"))
    def ppr(m: CheckpointMode) =
      Graphs.personalizedPagerank(edges, col("node"), col("nxt"),
        edges.select(col("node")).limit(3), iterations = 4, ckpt = m)
        .orderBy(col("node"))
    def hits(m: CheckpointMode) =
      Graphs.hits(edges, col("node"), col("nxt"), iterations = 3,
        ckpt = m).orderBy(col("node"))
    // output equality first
    def hashOf(df: org.apache.spark.sql.DataFrame): String =
      df.select(md5(concat_ws("|", df.columns.map(c =>
        coalesce(col(c).cast("string"), lit("null"))): _*)).as("h"))
        .agg(md5(concat_ws("", collect_list(col("h")))).as("hh"))
        .head().getString(0)
    Seq(("pagerank", pr _), ("ppr", ppr _), ("hits", hits _)).foreach {
      case (tag, f) =>
        val a = hashOf(f(CheckpointMode.Local))
        val b = hashOf(f(CheckpointMode.Lazy))
        println(s"PROBEGRAPH equal $tag: ${a == b} ($a)")
    }
    val variants = for {
      (tag, f) <- Seq(("pagerank", pr _), ("ppr", ppr _), ("hits", hits _))
      (mtag, m) <- Seq(("local", CheckpointMode.Local),
        ("lazy", CheckpointMode.Lazy))
    } yield (s"$tag-$mtag", () => f(m))
    variants.foreach { case (_, f) => f().count() } // warm
    val best = scala.collection.mutable.Map[String, Double]()
    (1 to 3).foreach { r =>
      variants.foreach { case (tag, f) =>
        SampleHygiene.drainResidue(spark)
        val t0 = System.nanoTime()
        f().count()
        val s = (System.nanoTime() - t0) / 1e9
        best(tag) = math.min(best.getOrElse(tag, 999.0), s)
        println(f"PROBEGRAPH $tag#$r: $s%.2f s")
      }
    }
    println("PROBEGRAPH BEST: " + best.toSeq.sorted
      .map { case (t, s) => f"$t=$s%.2f" }.mkString("  "))
    spark.stop()
  }
}
