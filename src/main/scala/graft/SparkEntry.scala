package graft
import org.apache.spark.sql.{SparkSession, DataFrame}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  * Aggregates every module's declared queries into one registry. */
object SparkEntry {

  /** All declared queries: name → (Spark plan, optional DuckDB oracle). */
  def registry: Map[String, QuerySpec] = graft.queries.Registry.all

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0.
    * TPC-H-Q1-flavored grouped aggregation over lineitem. */
  def entry(spark: SparkSession): DataFrame =
    registry("agg_pricing_summary").fn(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    registry.map { case (k, v) => k -> v.fn }

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    registry.collect { case (k, QuerySpec(_, Some(sql), _)) => k -> sql }
}
