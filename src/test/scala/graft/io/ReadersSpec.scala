package graft.io

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.apache.spark.sql.streaming.OutputMode
import graft.SparkSpec

class ReadersSpec extends SparkSpec {

  private def writeCsv(rows: Seq[String]): String = {
    val f = java.nio.file.Files.createTempFile("graft", ".csv")
    java.nio.file.Files.writeString(f, rows.mkString("\n"))
    f.toString
  }

  private val schema = StructType(Seq(
    StructField("name", StringType),
    StructField("n", IntegerType)))

  test("PERMISSIVE mode quarantines malformed rows in _corrupt_record") {
    val path = writeCsv(Seq("nom;valeur", "ok;1", "bad;not_a_number", "fine;3"))
    // Spark refuses plans that touch ONLY the corrupt column on raw files;
    // materialize first (the documented pattern for dead-letter handling).
    val df = Readers.csvWithPolicy(spark, path, schema, failFast = false).cache()
    val dead = df.filter(col("_corrupt_record").isNotNull)
    val good = df.filter(col("_corrupt_record").isNull)
    assert(dead.count() == 1)
    assert(dead.head().getAs[String]("_corrupt_record") == "bad;not_a_number")
    assert(good.count() == 2)
  }

  test("FAILFAST mode raises on the malformed row (reference-style strictness)") {
    val path = writeCsv(Seq("nom;valeur", "ok;1", "bad;not_a_number"))
    val df = Readers.csvWithPolicy(spark, path, schema, failFast = true)
    intercept[org.apache.spark.SparkException] { df.collect() }
  }

  test("file-source streaming: directory of parquet drives the same windowed agg") {
    import graft.streaming.Streams
    val dir = java.nio.file.Files.createTempDirectory("graft-stream-src").toString
    val batch = graft.io.Tables.eventsWithTs(spark, "/root/testdata/sf0.001")
      .select("event_id", "user_id", "event_type", "value", "ts_utc")
    batch.write.mode("overwrite").parquet(dir)
    val stream = Readers.parquetStream(spark, dir, batch.schema)
    val q = Streams.startMemorySink(
      Streams.tumblingHourly(stream), "filestream_out", OutputMode.Complete())
    q.processAllAvailable(); q.stop()
    val got = spark.table("filestream_out").agg(sum("n")).head().getLong(0)
    assert(got == batch.count())
  }
}
