package graft

import org.apache.spark.sql.SparkSession

/** Ad-hoc profiling main (not part of the library surface). */
object Scratch {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val aqe = sys.env.getOrElse("SPARK_GRAFT_AQE", "true")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.adaptive.enabled", aqe)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.range(1000000).selectExpr("sum(id)").collect()
    SparkEntry.queries("q_point_get")(spark, sfDir).count()

    def time(name: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val n = f
      println(f"STAGE $name: ${(System.nanoTime() - t0) / 1e9}%.2f s ($n rows)")
    }
    val names = if (args.nonEmpty) args.toSeq
      else Seq("dedup_minhash_lsh", "dedup_exact")
    // run twice: second run shows steady-state (codegen cache warm)
    (1 to 2).foreach { round =>
      names.foreach { n =>
        time(s"$n#$round")(SparkEntry.queries(n)(spark, sfDir).count())
      }
    }
    if (sys.env.contains("SPARK_GRAFT_EXPLAIN"))
      names.foreach { n =>
        println(s"==== $n ====")
        SparkEntry.queries(n)(spark, sfDir).explain("formatted")
      }
    spark.stop()
  }
}
