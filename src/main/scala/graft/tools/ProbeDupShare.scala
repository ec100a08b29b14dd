package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/**
 * High-duplication probe for exact-substring dedup (the round-14
 * review's open scale claim): `markedWindows`' duplicated-gram rejoin
 * is documented "broadcast-sized under realistic duplication — AQE
 * decides", but mirror-heavy crawls run 30–50% duplicated-token
 * share, where the `firsts` frame is corpus-scale and the join
 * becomes a second token-scale sort-merge. This probe measures that
 * regime directly: take a scaled corpus (a prior ScaleGen build — its
 * replicas are mutation-perturbed, so baseline dup share is LOW), add
 * EXACT mirrors of a deterministic slice of docs (`doc_id % 4 == 0` →
 * mirrored docs' every window duplicated; token-dup share
 * 2·0.25/1.25 = 40%), and time [[graft.operators.Dedup
 * .exactSubstringDedup]] on the mirrored corpus best-of-3 with an
 * [[IoProbe]] sample per run, printing the executed plan's join
 * strategies (SortMergeJoin vs BroadcastHashJoin counts) and the
 * measured duplicated-window share.
 *
 * Usage: ProbeDupShare <scaledDocsDir> [l=50]
 *   where <scaledDocsDir> holds a ScaleGen build (documents.parquet).
 */
object ProbeDupShare {
  def main(args: Array[String]): Unit = {
    val dir = if (args.nonEmpty) args(0) else "/tmp/graft-sf10"
    val l = if (args.length > 1) args(1).toInt else 50
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val docs = spark.read.parquet(s"$dir/documents.parquet")
      .select(col("doc_id"), col("text"))
    val maxId = docs.agg(max(col("doc_id"))).head().getLong(0)
    // exact mirrors of every 4th doc: 20% of the mirrored corpus's
    // docs are copies; every window of an (original, mirror) pair is
    // duplicated → ~40% duplicated-token share
    val mirrored = docs.unionByName(
        docs.filter(pmod(col("doc_id"), lit(4)) === 0)
          .select((col("doc_id") + lit(maxId + 1L)).as("doc_id"),
            col("text")))
      .localCheckpoint() // pin: the probe times the dedup, not the read

    val nDocs = mirrored.count()
    println(s"PROBE corpus: $nDocs docs (mirrors of doc_id%4==0)")

    // measured duplicated-window share (the probe's own premise)
    val gh = mirrored
      .select(posexplode(graft.functions.GramHashExpr.gramHashes(
        split(col("text"), " "), l)).as(Seq("pos", "gh")))
    val shares = gh.groupBy(col("gh")).agg(count(lit(1)).as("c"))
      .agg(sum(col("c")).as("total"),
        sum(when(col("c") >= 2, col("c"))).as("duplicated"))
      .head()
    val total = shares.getLong(0)
    val dup = shares.getLong(1)
    println(f"PROBE dup-share: $dup/$total windows = " +
      f"${dup * 100.0 / total}%.1f%%")

    def run(name: String, frame: DataFrame): Unit = {
      var best = Double.MaxValue
      (1 to 3).foreach { i =>
        System.gc()
        val io = IoProbe.sampleMbps()
        val t0 = System.nanoTime()
        val out = graft.operators.Dedup.exactSubstringDedup(
          frame, col("doc_id"), col("text"), l)
        val n = out.count()
        val sec = (System.nanoTime() - t0) / 1e9
        best = math.min(best, sec)
        if (i == 1) {
          val plan = out.queryExecution.executedPlan.toString
          val smj = "SortMergeJoin".r.findAllIn(plan).length
          val bhj = "BroadcastHashJoin".r.findAllIn(plan).length
          println(s"PLAN $name: SortMergeJoin=$smj BroadcastHashJoin=$bhj")
        }
        println(f"RUN $name #$i: $sec%.2f s ($n rows, io=$io%.0fMB/s)")
      }
      println(f"BEST $name: $best%.2f s")
    }

    run("baseline(low-dup)", docs.localCheckpoint())
    run("mirrored(40pct-dup)", mirrored)
    spark.stop()
  }
}
