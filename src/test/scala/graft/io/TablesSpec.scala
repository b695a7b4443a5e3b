package graft.io

import java.nio.file.Files
import java.sql.Timestamp

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.apache.spark.sql.Row

import graft.SparkSpec

/** Events loader encoding detection: the harness has shipped `events.ts`
  * both as a plain µs TIMESTAMP and (earlier) as INT64 TIMESTAMP(NANOS)
  * read through an explicit LongType schema. `Tables.events` must
  * normalize either to the epoch-ns LongType contract, and refuse data
  * whose decoded timestamps land outside plausible years (the failure
  * mode of decoding one encoding as the other). */
class TablesSpec extends SparkSpec {

  private def freshDir(): String =
    Files.createTempDirectory("graft_tables_spec").toFile.getPath

  private val schema = StructType(Seq(
    StructField("event_id", LongType),
    StructField("ts", TimestampType),
    StructField("user_id", LongType),
    StructField("event_type", StringType),
    StructField("value", DoubleType),
    StructField("props", StringType)))

  private def writeTimestampEvents(dir: String, epochMicros: Seq[Long]): Unit = {
    val rows = epochMicros.zipWithIndex.map { case (us, i) =>
      val t = new Timestamp(us / 1000)
      t.setNanos((us % 1000000).toInt * 1000)
      Row(i.toLong, t, i.toLong % 3, "view", 1.5, "{}")
    }
    spark.createDataFrame(
      spark.sparkContext.parallelize(rows, 1), schema)
      .write.mode("overwrite")
      .option("parquet.outputTimestampType", "TIMESTAMP_MICROS")
      .parquet(s"$dir/.stage")
    publishSingleFile(dir)
  }

  /** The harness ships events.parquet as a plain FILE (the stream source's
    * pathGlobFilter relies on that); Spark writes a directory, so promote
    * the single part file to `$dir/events.parquet`. */
  private def publishSingleFile(dir: String): Unit = {
    val part = new java.io.File(s"$dir/.stage").listFiles()
      .filter(_.getName.startsWith("part-")).head
    java.nio.file.Files.move(part.toPath,
      java.nio.file.Paths.get(s"$dir/events.parquet"),
      java.nio.file.StandardCopyOption.REPLACE_EXISTING)
  }

  private def writeLongNsEvents(dir: String, epochNanos: Seq[Long]): Unit = {
    import spark.implicits._
    epochNanos.zipWithIndex.map { case (ns, i) =>
      (i.toLong, ns, i.toLong % 3, "view", 1.5, "{}")
    }.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/.stage")
    publishSingleFile(dir)
  }

  // 2024-01-15 12:34:56.789012 UTC in epoch µs
  private val baseUs = 1705322096789012L

  test("µs TIMESTAMP encoding is normalized to epoch-ns longs") {
    val dir = freshDir()
    writeTimestampEvents(dir, Seq(baseUs, baseUs + 1, baseUs + 3600L * 1000000))
    val got = Tables.events(spark, dir)
    assert(got.schema("ts").dataType === LongType)
    val ts = got.select("ts").as[Long](org.apache.spark.sql.Encoders.scalaLong)
      .collect().sorted
    assert(ts === Array(baseUs * 1000, (baseUs + 1) * 1000,
      (baseUs + 3600L * 1000000) * 1000))
    // and the derived µs timestamp round-trips to the wall-clock instant
    val utc = Tables.eventsWithTs(spark, dir)
      .agg(date_format(min(col("ts_utc")), "yyyy-MM-dd HH:mm:ss").as("f"))
      .head().getString(0)
    assert(utc === "2024-01-15 12:34:56")
  }

  test("µs naive TIMESTAMP_NTZ encoding (pyarrow tz-less) → epoch-ns longs") {
    val dir = freshDir()
    val ntzSchema = StructType(schema.map(f =>
      if (f.name == "ts") f.copy(dataType = TimestampNTZType) else f))
    val rows = Seq(baseUs, baseUs + 42).zipWithIndex.map { case (us, i) =>
      Row(i.toLong,
        java.time.LocalDateTime.ofEpochSecond(
          us / 1000000, (us % 1000000).toInt * 1000, java.time.ZoneOffset.UTC),
        i.toLong, "view", 1.5, "{}")
    }
    spark.createDataFrame(spark.sparkContext.parallelize(rows, 1), ntzSchema)
      .write.mode("overwrite").parquet(s"$dir/.stage")
    publishSingleFile(dir)
    val got = Tables.events(spark, dir)
    assert(got.schema("ts").dataType === LongType)
    assert(got.select("ts").collect().map(_.getLong(0)).sorted ===
      Array(baseUs * 1000, (baseUs + 42) * 1000))
  }

  test("raw epoch-ns LongType encoding passes through unchanged") {
    val dir = freshDir()
    val ns = Seq(baseUs * 1000, baseUs * 1000 + 999, baseUs * 1000 + 7000)
    writeLongNsEvents(dir, ns)
    val got = Tables.events(spark, dir)
    assert(got.schema("ts").dataType === LongType)
    assert(got.select("ts").collect().map(_.getLong(0)).sorted === ns.toArray)
  }

  test("eventsStreamSource normalizes µs timestamp files like the batch loader") {
    // The streaming twin must detect the physical encoding itself: a file
    // source cannot infer schemas, and handing it the batch loader's
    // post-normalization LongType schema against a timestamp-encoded file
    // would silently read the raw µs longs as if they were ns.
    val dir = freshDir()
    writeTimestampEvents(dir, Seq(baseUs, baseUs + 5))
    val q = Tables.eventsStreamSource(spark, dir)
      .writeStream.format("memory").queryName("tables_spec_stream")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .option("checkpointLocation",
        Files.createTempDirectory("graft_tables_spec_ckpt").toFile.getPath)
      .start()
    q.awaitTermination()
    val ts = spark.table("tables_spec_stream")
      .select("ts").collect().map(_.getLong(0)).sorted
    assert(ts === Array(baseUs * 1000, (baseUs + 5) * 1000))
  }

  test("eventsStreamSource streams directory-layout fixtures (Spark-written events.parquet)") {
    // The sf1 sweep regression: on fixtures where events.parquet is a
    // DIRECTORY of part files (any Spark-written corpus) the old
    // pathGlobFilter matched no FILES and the source silently drained
    // zero rows. The stream must yield exactly the batch loader's rows
    // on both physical layouts.
    val dir = freshDir()
    writeTimestampEvents(dir, Seq(baseUs, baseUs + 5, baseUs + 9))
    // re-publish as a directory: move the single file INTO events.parquet/
    val f = new java.io.File(s"$dir/events.parquet")
    val sub = new java.io.File(f, "part-00000.parquet")
    val tmp = new java.io.File(s"$dir/.hold")
    java.nio.file.Files.move(f.toPath, tmp.toPath)
    assert(f.mkdirs())
    java.nio.file.Files.move(tmp.toPath, sub.toPath)
    val q = Tables.eventsStreamSource(spark, dir)
      .writeStream.format("memory").queryName("tables_spec_dir_stream")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .option("checkpointLocation",
        Files.createTempDirectory("graft_tables_spec_ckpt2").toFile.getPath)
      .start()
    q.awaitTermination()
    val ts = spark.table("tables_spec_dir_stream")
      .select("ts").collect().map(_.getLong(0)).sorted
    assert(ts === Array(baseUs * 1000, (baseUs + 5) * 1000,
      (baseUs + 9) * 1000))
  }

  test("timestamps outside years [2000, 2100) fail loudly, not silently") {
    val dir = freshDir()
    // the classic drift symptom: ns decoded as if µs → January 1970
    writeLongNsEvents(dir, Seq(1705322096789L, 1705322096790L))
    val e = intercept[IllegalArgumentException](Tables.events(spark, dir).count())
    assert(e.getMessage.contains("encoding drift"))
  }
}
