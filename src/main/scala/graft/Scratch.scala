package graft
import org.apache.spark.sql.SparkSession

/** Throwaway exploration main (deleted before final commit of round). */
object Scratch {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val ev = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
    ev.printSchema()
    ev.show(5, false)
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    docs.printSchema()
    docs.show(3, true)
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    emb.printSchema()
    println("emb dim: " + emb.selectExpr("size(embedding)").head())
    for (sf <- Seq("0.001", "0.01", "0.1")) {
      val d = s"/root/testdata/sf$sf"
      val c = Seq("events", "documents", "embeddings", "lineitem", "orders")
        .map(t => t + "=" + spark.read.parquet(s"$d/$t.parquet").count())
      println(s"sf$sf: " + c.mkString(" "))
    }
    println(ev.selectExpr("min(ts)", "max(ts)", "count(distinct event_type)").head())
    println(ev.select("props").head(3).mkString("\n"))
    spark.stop()
  }
}
