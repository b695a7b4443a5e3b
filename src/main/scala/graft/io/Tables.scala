package graft.io

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.{col, expr, lit, max, min, timestamp_micros, to_utc_timestamp, unix_micros}
import org.apache.spark.sql.types._

import graft.util.SessionScopedCache

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
  /** The harness has shipped `events.ts` under more than one physical
    * parquet encoding over time: INT64 TIMESTAMP(NANOS) — which the Spark 4
    * parquet reader rejects outright, so it must be read through an explicit
    * LongType schema — and plain µs TIMESTAMP, which reads natively. The
    * loader detects the encoding from the footer-inferred schema (cached per
    * session+path; a footer read, no data scan) instead of assuming one
    * forever, and normalizes `ts` to epoch-NANOSECOND LongType either way so
    * every downstream consumer keeps a single exact-integer contract. */
  private val eventsNsSchema = StructType(Seq(
    StructField("event_id", LongType),
    StructField("ts", LongType),
    StructField("user_id", LongType),
    StructField("event_type", StringType),
    StructField("value", DoubleType),
    StructField("props", StringType)))

  private val tsEncoding = new SessionScopedCache[Option[DataType]]
  private val tsRange = new SessionScopedCache[(Long, Long)]

  private def detectTsType(s: SparkSession, path: String): Option[DataType] =
    tsEncoding.getOrBuild(s, path)(
      scala.util.Try(s.read.parquet(path).schema("ts").dataType).toOption)

  /** Rewrite `ts` to epoch-ns LongType given its detected on-disk type.
    * NTZ wall time IS the UTC instant in this data, so it is pinned with
    * to_utc_timestamp rather than a bare cast that would shift under a
    * non-UTC session timezone. */
  private def normalizeTs(df: DataFrame, kind: Option[DataType]): DataFrame =
    kind match {
      case Some(TimestampType) =>
        df.withColumn("ts", unix_micros(col("ts")) * lit(1000L))
      case Some(TimestampNTZType) =>
        df.withColumn("ts",
          unix_micros(to_utc_timestamp(col("ts"), "UTC")) * lit(1000L))
      case _ => df // already a raw epoch-ns long column
    }

  private def eventsNormalized(s: SparkSession, path: String): DataFrame = {
    val kind = detectTsType(s, path)
    val raw = kind match {
      case Some(_) => s.read.parquet(path)
      case None => // INT64 TIMESTAMP(NANOS): schema inference throws; map
        // the physical long through an explicit schema (pre-2026-08 data)
        s.read.schema(eventsNsSchema).parquet(path)
    }
    normalizeTs(raw, kind)
  }

  /** Streaming twin of [[events]]: a file-source readStream over the raw
    * events parquet whose explicit schema matches the detected physical
    * `ts` encoding, normalized to the same epoch-ns LongType contract.
    * (A file source cannot infer schemas, and handing it the BATCH
    * loader's post-normalization schema would silently misread a
    * timestamp-encoded file as raw longs.) */
  def eventsStreamSource(s: SparkSession, d: String): DataFrame = {
    val path = s"$d/events.parquet"
    val kind = detectTsType(s, path)
    val physical = kind match {
      case Some(t @ (TimestampType | TimestampNTZType)) => t
      case _ => LongType
    }
    val readSchema = StructType(eventsNsSchema.map(f =>
      if (f.name == "ts") f.copy(dataType = physical) else f))
    // Two physical layouts: driver fixtures store events.parquet as a
    // single FILE inside the sf dir (the file source needs a directory
    // path, so glob-filter the sibling tables away); Spark-written
    // fixtures (GenScale sf1) store it as a DIRECTORY of part files —
    // stream the directory itself, or the glob matches no FILES and the
    // source silently drains zero rows (the sf1 sweep finding).
    // Resolved through Hadoop's FileSystem, NOT java.io.File: a
    // URI-style or remote path (file:/, hdfs://, s3a://) is invisible to
    // java.io.File, which would misclassify a remote DIRECTORY as a file
    // and silently reintroduce the zero-rows drain via the glob branch.
    val isDir = {
      val hp = new org.apache.hadoop.fs.Path(path)
      val fs = hp.getFileSystem(s.sessionState.newHadoopConf())
      try fs.getFileStatus(hp).isDirectory
      catch { case _: java.io.FileNotFoundException => false }
    }
    val src =
      if (isDir)
        s.readStream.schema(readSchema).parquet(path)
      else
        s.readStream.schema(readSchema)
          .option("pathGlobFilter", "events.parquet")
          .parquet(d)
    normalizeTs(src, kind)
  }

  def events(s: SparkSession, d: String): DataFrame = {
    val path = s"$d/events.parquet"
    val df = eventsNormalized(s, path)
    // Guard against silent encoding drift: a mis-decoded ts lands decades
    // off (the ns-as-µs bug put every event in Jan 1970) and every
    // duration-dependent query then "succeeds" with garbage. One min/max
    // scan per (session, path), then a cheap cached assertion per call —
    // so drift yields one loud error line, not hundreds of hash mismatches.
    val (lo, hi) = tsRange.getOrBuild(s, path) {
      val r = df.agg(min("ts"), max("ts")).head()
      // empty table: nothing to drift-check (degenerate fixtures are a
      // legal input — every consumer must still return a defined result)
      if (r.isNullAt(0)) (946684800000000000L, 946684800000000000L)
      else (r.getLong(0), r.getLong(1))
    }
    require(lo >= 946684800000000000L && hi < 4102444800000000000L,
      s"events.ts outside years [2000, 2100) as epoch-ns (min=$lo max=$hi) " +
        s"in $path — parquet timestamp encoding drift?")
    graft.ops.Scale.fanOut(df)
  }

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
