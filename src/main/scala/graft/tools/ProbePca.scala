package graft.tools
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
object ProbePca {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val emb = spark.read.parquet("/tmp/graft-sf10/embeddings.parquet")
    def t[A](name: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"PROBE $name ${(System.nanoTime()-t0)/1e9}%.2f"); r
    }
    val cov = t("cov-construct") {
      graft.operators.Embeddings.covarianceMicro(emb, col("embedding"), 64) }
    t("cov-count") { cov.count() }
    val v = t("power-collect") {
      graft.operators.Embeddings.pcaPowerMicro(cov, 64, 4) }
    val proj = graft.operators.Embeddings.pcaProject(emb, col("vec_id"), col("embedding"), v)
    t("project-count") { proj.count() }
    spark.stop()
  }
}
