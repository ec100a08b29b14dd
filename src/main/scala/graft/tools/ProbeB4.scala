package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.operators.Dedup

/** Interleaved variant matrix for minhashPairsBounded's healthy-corpus
 * premium (r17): which hot-branch piece costs what when the corpus has
 * no hot buckets. Temporary probe, not library surface. */
object ProbeB4 {
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
    val threshold = 0.8
    val maxBucket = 4096

    // shared structural prologue for every bounded variant
    def prologue() = {
      val sets = Dedup.shingled(docs, col("doc_id"), col("text"), 3)
        .localCheckpoint(eager = false)
      val sigs = Dedup.sigsOf(sets, n).localCheckpoint(eager = false)
      val keyed = Dedup.bandKeys(sigs, bands, n)
      val sizes = keyed.groupBy(col("band"), col("key"))
        .agg(count(lit(1)).as("__bc")).filter(col("__bc") > 1)
      val ext = when(col("__bc") <= maxBucket, lit(0)).otherwise(
        least(ceil(log(col("__bc").cast("double") / lit(maxBucket.toDouble)) /
          lit(-math.log(threshold))), lit(32))).cast("int")
      val sized = sizes.select(col("band"), col("key"), ext.as("__ext"))
      val smallHs = keyed
        .join(sized.filter(col("__ext") === 0)
          .select(col("band"), col("key")), Seq("band", "key"))
        .join(Dedup.hashedSets(sets), "doc_id")
        .select(col("band"), col("key"),
          struct(col("doc_id"), col("hs")).as("e"))
      (sets, sigs, keyed, sized, smallHs)
    }

    // V1: tier-1a only + final distinct/orderBy (NO hot branch at all:
    // the floor a bounded plan could reach on a healthy corpus)
    def v1(): DataFrame = {
      val (_, _, _, _, smallHs) = prologue()
      Dedup.bucketStructVerify(smallHs, threshold)
        .orderBy(col("id1"), col("id2"))
    }
    // V2: + hot branch WITHOUT any hot-side checkpoint, sizes2 via a
    // window count (single-consumer rekeyed), star verify inline
    def v2(): DataFrame = {
      val (sets, _, keyed, sized, smallHs) = prologue()
      val hotRows = keyed.join(sized.filter(col("__ext") > 0),
        Seq("band", "key"))
      val hotIds = hotRows.select(col("doc_id")).distinct()
      val hsetsHot = Dedup.hashedSets(sets.join(hotIds, "doc_id"))
      val deepSigs = Dedup.sigsOf(sets.join(hotIds, "doc_id"), n + 32)
        .select(col("doc_id"), col("sig").as("__deep"))
      val rekeyed = hotRows.join(deepSigs, "doc_id")
        .select(col("band"),
          concat(col("key"), lit("|"), array_join(transform(
            slice(col("__deep"), lit(n + 1), col("__ext")),
            x => x.cast("string")), ":")).as("key"),
          col("doc_id"))
      val w = Window.partitionBy(col("band"), col("key"))
      val refinedHs = rekeyed.withColumn("__c2", count(lit(1)).over(w))
        .filter(col("__c2") > 1 && col("__c2") <= maxBucket)
        .join(hsetsHot, "doc_id")
        .select(col("band"), col("key"),
          struct(col("doc_id"), col("hs")).as("e"))
      val smallPairs = Dedup.bucketStructVerify(
        smallHs.unionByName(refinedHs), threshold)
      val anchors = hotRows.groupBy(col("band"), col("key"))
        .agg(min(col("doc_id")).as("__a"))
      val starCands = hotRows.join(anchors, Seq("band", "key"))
        .filter(col("doc_id") =!= col("__a"))
        .select(col("__a").as("id1"), col("doc_id").as("id2"))
        .distinct()
      val sz = hsetsHot.select(col("doc_id"), size(col("hs")).as("sz"))
      val pruned = starCands
        .join(sz.select(col("doc_id").as("id1"), col("sz").as("sz1")), "id1")
        .join(sz.select(col("doc_id").as("id2"), col("sz").as("sz2")), "id2")
        .filter(least(col("sz1"), col("sz2")).cast("double") >=
          lit(threshold) * greatest(col("sz1"), col("sz2")).cast("double"))
        .select(col("id1"), col("id2"))
      val bigPairs = pruned
        .join(hsetsHot.select(col("doc_id").as("id1"), col("hs").as("hs1")),
          "id1")
        .join(hsetsHot.select(col("doc_id").as("id2"), col("hs").as("hs2")),
          "id2")
        .withColumn("__i", size(array_intersect(col("hs1"), col("hs2"))))
        .withColumn("jaccard", col("__i").cast("double") /
          (size(col("hs1")) + size(col("hs2")) - col("__i")).cast("double"))
        .filter(col("jaccard") >= threshold)
        .select(col("id1"), col("id2"), col("jaccard"))
      smallPairs.unionByName(bigPairs).distinct()
        .orderBy(col("id1"), col("id2"))
    }
    // V3: current API (two lazy hot-side checkpoints)
    def v3(): DataFrame =
      Dedup.minhashPairsBounded(docs, col("doc_id"), col("text"), threshold,
        bands = bands)
    // V4: exact path
    def v4(): DataFrame =
      Dedup.minhashPairs(docs, col("doc_id"), col("text"), threshold,
        bands = bands)

    val variants = Seq("v1-no-hot-branch" -> v1 _, "v2-hot-no-ckpt" -> v2 _,
      "v3-current-api" -> v3 _, "v4-exact" -> v4 _)
    // warmup all
    variants.foreach { case (_, f) => f().count() }
    val best = scala.collection.mutable.Map[String, Double]()
    (1 to 3).foreach { r =>
      variants.foreach { case (tag, f) =>
        SampleHygiene.drainResidue(spark)
        val t0 = System.nanoTime()
        val c = f().count()
        val s = (System.nanoTime() - t0) / 1e9
        best(tag) = math.min(best.getOrElse(tag, 999.0), s)
        println(f"PROBEB4 $tag#$r: $s%.2f s ($c rows)")
      }
    }
    println("PROBEB4 BEST: " + best.toSeq.sortBy(_._1)
      .map { case (t, s) => f"$t=$s%.2f" }.mkString("  "))
    spark.stop()
  }
}
