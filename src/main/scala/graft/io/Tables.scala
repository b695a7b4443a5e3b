package graft.io

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Table access for the harness parquet tables (see /root/repo/TESTDATA.md).
  *
  * Scale notes (100 TB design): every query goes through these loaders so
  * that scan-level concerns (explicit schemas, partition discovery, column
  * pruning, predicate pushdown) are controlled in one place. At cluster
  * scale the `dir` is an object-store prefix; parquet footers give Spark
  * row-group pruning for free as long as callers express filters as
  * `Column` predicates (never collect-then-filter).
  */
object Tables {

  /** Lazy parquet scan; Catalyst prunes columns/pushes filters from the
    * final plan, so no projection is forced here. */
  def table(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  def region(s: SparkSession, d: String): DataFrame     = table(s, d, "region")
  def nation(s: SparkSession, d: String): DataFrame     = table(s, d, "nation")
  def customer(s: SparkSession, d: String): DataFrame   = table(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame   = table(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame       = table(s, d, "part")
  def orders(s: SparkSession, d: String): DataFrame     = table(s, d, "orders")
  def lineitem(s: SparkSession, d: String): DataFrame   = table(s, d, "lineitem")
  def events(s: SparkSession, d: String): DataFrame     = table(s, d, "events")
  def documents(s: SparkSession, d: String): DataFrame  = table(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = table(s, d, "embeddings")
}
