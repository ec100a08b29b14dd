package graft.tools

import org.apache.spark.sql.SparkSession

/** Residue forensics for the bench hygiene (r17): run queries in
  * sequence, and after each, gc + drain and enumerate the persistent
  * RDDs that REMAIN cached — names, storage levels, block bytes — to
  * attribute the standing storage-memory floor the bench's
  * contamination classifier keeps tripping on.
  *
  * Usage: runMain graft.tools.ProbeResidue <q1> <q2> ...
  */
object ProbeResidue {
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
    val names = if (args.nonEmpty) args.toSeq
      else Seq("pipeline_clean", "dedup_minhash_lsh", "dedup_clusters")
    def dump(tag: String): Unit = {
      val sc = spark.sparkContext
      val rdds = sc.getPersistentRDDs.values.toSeq
      val infos = sc.statusTracker.getExecutorInfos
      val used = infos.map(e =>
        e.usedOnHeapStorageMemory() + e.usedOffHeapStorageMemory()).sum
      println(f"== $tag: storage=${used / 1024 / 1024} MB, " +
        s"persistentRDDs=${rdds.size}")
      rdds.sortBy(-_.id).take(20).foreach { r =>
        println(s"   rdd=${r.id} lvl=${r.getStorageLevel.description} " +
          s"parts=${r.getNumPartitions} name=${Option(r.name).getOrElse("-").take(60)}")
      }
    }
    names.foreach { n =>
      (1 to 3).foreach { i =>
        graft.SparkEntry.queries(n)(spark, sfDir).count()
      }
      val drained = SampleHygiene.drainResidue(spark)
      dump(s"after 3x $n (drained to ${drained / 1024 / 1024} MB)")
    }
    // a long drain at the end: does a 30 s cleaner window reclaim it?
    (1 to 10).foreach { _ => System.gc(); Thread.sleep(3000) }
    dump("after 30s gc loop")
    spark.stop()
  }
}
