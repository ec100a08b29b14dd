package graft
import org.apache.spark.sql.{SparkSession, DataFrame}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  * The real registry lives in [[graft.Queries]]. */
object SparkEntry {
  /** Flagship query on /root/testdata/sf0.001: the seriesly `_query`
    * analytical path (bucketed multi-reducer agg) over the events
    * table. Driver smoke-checks rows > 0. */
  def entry(spark: SparkSession): DataFrame =
    Queries.registry("q_series_multi_day").fn(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    Queries.registry.map { case (k, e) => k -> e.fn }

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    Queries.registry.collect { case (k, e) if e.oracle.isDefined => k -> e.oracle.get }
}
