package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** One declared engine query: the Spark plan plus (when SQL-expressible) the
  * equivalent DuckDB oracle SQL over the same parquet tables.
  *
  * Determinism contract (the driver hash-compares values after sorting
  * columns by name): every multi-row result carries an explicit ORDER BY on
  * both sides; float aggregates are computed as exact decimal sums cast back
  * to double so Spark/DuckDB accumulation order cannot diverge; surrogate
  * ids are sha2 over natural keys, never uuid().
  */
final case class QuerySpec(
    fn: (SparkSession, String) => DataFrame,
    oracle: Option[String],
    doc: String = "")

object QuerySpec {
  def apply(fn: (SparkSession, String) => DataFrame, oracleSql: String): QuerySpec =
    QuerySpec(fn, Some(oracleSql))
}
