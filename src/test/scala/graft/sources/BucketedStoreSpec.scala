package graft.sources

import graft.SparkSpec
import org.apache.spark.sql.functions._

class BucketedStoreSpec extends SparkSpec {
  import spark.implicits._

  test("co-bucketed tables join with ZERO exchanges; unbucketed " +
      "parquet pays two") {
    val left = (0L until 2000L).map(i => (i, s"text-$i")).toDF("id", "t")
    val right = (0L until 2000L).map(i => (i, i % 7)).toDF("id", "lbl")
    BucketedStore.writeBucketed(left, "bk_left", "id", buckets = 8,
      sortCols = Seq("id"))
    BucketedStore.writeBucketed(right, "bk_right", "id", buckets = 8,
      sortCols = Seq("id"))
    val thr = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      // force a real two-sided join: broadcast would hide the exchange
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val j = BucketedStore.table(spark, "bk_left")
        .join(BucketedStore.table(spark, "bk_right"), "id")
      assert(j.count() == 2000)
      val p = j.queryExecution.executedPlan.toString
        .split("== Initial Plan ==").head
      assert(!p.contains("Exchange"),
        s"bucketed join still shuffles:\n$p")
      assert(p.contains("SortMergeJoin") || p.contains("ShuffledHashJoin"),
        s"expected a two-sided join:\n$p")
      assert(p.contains("Bucketed: true"), s"scan not bucketed:\n$p")

      // control: the same data as plain parquet shuffles both sides
      val dir = java.nio.file.Files.createTempDirectory("graft-bk").toString
      left.write.mode("overwrite").parquet(s"$dir/l")
      right.write.mode("overwrite").parquet(s"$dir/r")
      val jp = spark.read.parquet(s"$dir/l")
        .join(spark.read.parquet(s"$dir/r"), "id")
      jp.count()
      val pp = jp.queryExecution.executedPlan.toString
        .split("== Initial Plan ==").head
      assert("Exchange hashpartitioning".r.findAllIn(pp).size == 2,
        s"control plan shape changed:\n$pp")
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", thr)
      spark.sql("DROP TABLE IF EXISTS bk_left")
      spark.sql("DROP TABLE IF EXISTS bk_right")
    }
  }

  test("aggregation on the bucket key reuses the bucket distribution") {
    val df = (0L until 500L).map(i => (i % 50, i)).toDF("k", "v")
    BucketedStore.writeBucketed(df, "bk_agg", "k", buckets = 4)
    try {
      val a = BucketedStore.table(spark, "bk_agg")
        .groupBy("k").agg(sum("v"))
      a.collect()
      val p = a.queryExecution.executedPlan.toString
        .split("== Initial Plan ==").head
      assert(!p.contains("Exchange"),
        s"bucketed aggregation still shuffles:\n$p")
    } finally spark.sql("DROP TABLE IF EXISTS bk_agg")
  }
}
