package graft
import org.apache.spark.sql.{SparkSession, DataFrame}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  * The real registry lives in [[graft.Queries]]. */
object SparkEntry {
  /** Flagship query on /root/testdata/sf0.001: the seriesly `_query`
    * analytical path (bucketed multi-reducer agg) over the events
    * table. Driver smoke-checks rows > 0. */
  def entry(spark: SparkSession): DataFrame = {
    assertEventsContract(spark, "/root/testdata/sf0.001")
    Queries.registry("q_series_multi_day").fn(spark, "/root/testdata/sf0.001")
  }

  /** Testdata-schema smoke check: the events frame must normalize to
    * the engine's epoch-ns BIGINT contract. Fails in ONE obvious place
    * with a clear message if the driver's parquet schema drifts again
    * (round 6 lost 29 gates to a silent TIMESTAMP_NTZ drift). */
  private[graft] def assertEventsContract(spark: SparkSession, dir: String): Unit = {
    val ev = Queries.eventsNs(spark, dir)
    val dt = ev.schema("ts").dataType
    require(dt == org.apache.spark.sql.types.LongType,
      s"events.ts normalized to $dt, expected BIGINT epoch-ns — " +
        "update Queries.normalizeTsNs for the new testdata schema")
    val sampleRow = ev.select("ts").limit(1).collect()
    require(sampleRow.nonEmpty,
      s"events table at $dir is EMPTY — truncated testdata regeneration?")
    val sample = sampleRow.head.getLong(0)
    require(sample > 1000000000000000000L && sample < 4000000000000000000L,
      s"events.ts sample $sample is not plausibly epoch NANOSECONDS " +
        "(expected ~1.7e18 for 2024 data) — unit drift in testdata?")
  }

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    Queries.registry.map { case (k, e) => k -> e.fn }

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    Queries.registry.collect { case (k, e) if e.oracle.isDefined => k -> e.oracle.get }
}
