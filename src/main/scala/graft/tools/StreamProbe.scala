package graft.tools

import org.apache.spark.sql.SparkSession

/** Dev diagnostic: time individual registry queries standalone (used to
  * attribute the fixed streaming-engine overhead in the bench). Args =
  * query names; defaults to the four streaming-engine queries. */
object StreamProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val names = if (args.nonEmpty) args.toSeq
      else Seq("events_stream_dedup", "events_stream_join",
        "events_tumbling_streaming", "events_stream_running_totals")
    for (name <- names) {
      val t0 = System.nanoTime()
      graft.queries.Registry.all(name).fn(spark, sfDir)
        .write.format("noop").mode("overwrite").save()
      val dt = (System.nanoTime() - t0) / 1e9
      println(f"== $name: $dt%.2f s ==")
    }
    spark.stop()
  }
}
