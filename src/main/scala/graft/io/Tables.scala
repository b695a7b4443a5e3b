package graft.io

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.{expr, timestamp_micros}
import org.apache.spark.sql.types._

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
  /** The events parquet stores `ts` as INT64 TIMESTAMP(NANOS), which the
    * Spark 4 parquet reader rejects outright. Reading with an explicit
    * schema that maps the column to LongType (nanoseconds since epoch)
    * sidesteps the conversion; [[eventsWithTs]] derives a proper µs
    * timestamp column for event-time operators. */
  private val eventsSchema = StructType(Seq(
    StructField("event_id", LongType),
    StructField("ts", LongType),
    StructField("user_id", LongType),
    StructField("event_type", StringType),
    StructField("value", DoubleType),
    StructField("props", StringType)))

  def events(s: SparkSession, d: String): DataFrame =
    graft.ops.Scale.fanOut(
      s.read.schema(eventsSchema).parquet(s"$d/events.parquet"))

  /** events + `ts_utc` timestamp (µs, truncated from ns with exact integer
    * division — `ts / 1000` in double would lose precision at 1.7e18). */
  def eventsWithTs(s: SparkSession, d: String): DataFrame =
    events(s, d).withColumn("ts_utc", timestamp_micros(expr("ts div 1000")))

  // The text/media tables feed CPU-heavy per-row stages (tokenize, shingle,
  // hash, JSON parse, vector math); their fixtures arrive as one row group
  // = one input split, which would pin that work to a single core. fanOut
  // widens only such narrow scans — on a real many-split layout it's a
  // pass-through (see [[graft.ops.Scale.fanOut]]); filters/pruning still
  // push through the repartition to the scan.
  def documents(s: SparkSession, d: String): DataFrame =
    graft.ops.Scale.fanOut(table(s, d, "documents"))
  def embeddings(s: SparkSession, d: String): DataFrame =
    graft.ops.Scale.fanOut(table(s, d, "embeddings"))
}
