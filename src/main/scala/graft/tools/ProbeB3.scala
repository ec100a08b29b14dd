package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.operators.Dedup

/** Sub-stage attribution for minhashPairsBounded's healthy-corpus
 * premium over minhashPairs (r17): times each structural layer of the
 * two plans in isolation. Temporary probe, not library surface. */
object ProbeB3 {
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
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    val bands = Dedup.bandsFor(0.8)
    val n = 64
    def time(name: String)(f: => Long): Unit = {
      // best of 2, drained
      val ts = (1 to 2).map { _ =>
        SampleHygiene.drainResidue(spark)
        val t0 = System.nanoTime()
        val rows = f
        ((System.nanoTime() - t0) / 1e9, rows)
      }
      println(f"PROBEB3 $name: ${ts.map(_._1).min}%.2f s (${ts.head._2} rows)")
    }
    def shingledF() = Dedup.shingled(docs, col("doc_id"), col("text"), 3)
    // warmups
    shingledF().count()
    time("A.shingled(count)") { shingledF().count() }
    time("B.sets-eager-ckpt") {
      val s = shingledF().localCheckpoint(); val c = s.count()
      s.unpersist(); c
    }
    time("C.sigs64-over-ckpt-sets") {
      val s = shingledF().localCheckpoint()
      val c = Dedup.sigsOf(s, n).count(); s.unpersist(); c
    }
    time("D.sigs64-ckpt-too") {
      val s = shingledF().localCheckpoint()
      val g = Dedup.sigsOf(s, n).localCheckpoint()
      val c = g.count(); s.unpersist(); g.unpersist(); c
    }
    time("E.sizes-agg(keyed count>1)") {
      val s = shingledF().localCheckpoint()
      val keyed = Dedup.bandKeys(Dedup.sigsOf(s, n), bands, n)
      val c = keyed.groupBy(col("band"), col("key"))
        .agg(count(lit(1)).as("__bc")).filter(col("__bc") > 1).count()
      s.unpersist(); c
    }
    time("F.exact-verify-full") {
      val s = shingledF().localCheckpoint()
      val keyed = Dedup.bandKeys(Dedup.sigsOf(s, n), bands, n)
      val multi = keyed.groupBy(col("band"), col("key"))
        .agg(count(lit(1)).as("__bc")).filter(col("__bc") > 1)
        .select(col("band"), col("key"))
      val withHs = keyed.join(multi, Seq("band", "key"))
        .join(Dedup.hashedSets(s), "doc_id")
        .select(col("band"), col("key"),
          struct(col("doc_id"), col("hs")).as("e"))
      val c = Dedup.bucketStructVerify(withHs, 0.8)
        .orderBy(col("id1"), col("id2")).count()
      s.unpersist(); c
    }
    time("G.bounded-smallHs-only(sized ext=0 path)") {
      val s = shingledF().localCheckpoint()
      val sigs = Dedup.sigsOf(s, n).localCheckpoint(eager = false)
      val keyed = Dedup.bandKeys(sigs, bands, n)
      val sizes = keyed.groupBy(col("band"), col("key"))
        .agg(count(lit(1)).as("__bc")).filter(col("__bc") > 1)
      val sized = sizes.select(col("band"), col("key"),
        when(col("__bc") <= 4096, lit(0)).otherwise(lit(1)).as("__ext"))
      val smallHs = keyed
        .join(sized.filter(col("__ext") === 0)
          .select(col("band"), col("key")), Seq("band", "key"))
        .join(Dedup.hashedSets(s), "doc_id")
        .select(col("band"), col("key"),
          struct(col("doc_id"), col("hs")).as("e"))
      val c = Dedup.bucketStructVerify(smallHs, 0.8)
        .orderBy(col("id1"), col("id2")).count()
      s.unpersist(); c
    }
    time("H.exact-pairs(api)") {
      Dedup.minhashPairs(docs, col("doc_id"), col("text"), 0.8,
        bands = bands).count()
    }
    time("I.bounded-pairs(api)") {
      Dedup.minhashPairsBounded(docs, col("doc_id"), col("text"), 0.8,
        bands = bands).count()
    }
    spark.stop()
  }
}
