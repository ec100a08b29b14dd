package graft
import org.apache.spark.sql.SparkSession
object PlanAudit {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", 4)
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = "/root/testdata/sf0.01"
    for (n <- args) {
      println(s"========== $n ==========")
      println(Queries.registry(n).fn(spark, dir).queryExecution.executedPlan
        .toString.linesIterator.map(_.take(160)).mkString("\n"))
    }
    spark.stop()
  }
}
