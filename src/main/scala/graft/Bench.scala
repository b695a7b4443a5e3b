package graft
import org.apache.spark.sql.SparkSession
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // Untimed warmup: absorb JIT/codegen/classloading so the first timed
    // query isn't charged ~4s of JVM start (standard bench hygiene; every
    // query below still executes fully inside its own timing window).
    try SparkEntry.queries("agg_pricing_summary")(spark, sfDir)
      .write.format("noop").mode("overwrite").save()
    catch { case _: Throwable => }

    // noop sink forces FULL evaluation of every column (a bare .count()
    // would let Catalyst prune projection work and under-measure
    // expression-heavy queries).
    val results = SparkEntry.queries.map { case (name, fn) =>
      val t0 = System.nanoTime()
      try fn(spark, sfDir).write.format("noop").mode("overwrite").save()
      catch { case e: Throwable =>
        System.err.println(s"[bench] $name failed: ${e.getMessage}")
      }
      name -> (System.nanoTime() - t0) / 1e9
    }
    def fmt(v: Double): String = f"$v%.3f"
    val qs = results.map { case (k, v) => s"\"" + k + "\":" + fmt(v) }
      .mkString("{", ",", "}")
    val total = if (results.nonEmpty) results.values.sum else 0.0
    // The harness keeps only the TAIL of stdout (~2000 chars), so the full
    // per-query map (~4 KB for 80+ queries) must NOT be on the final line:
    // print detail first (and persist it), then a compact total line LAST
    // that always fits inside the tail window.
    val detail = s"""{"metric":"detail","unit":"sec","queries":$qs,"sf":"$sfDir"}"""
    println(detail)
    try java.nio.file.Files.write(
      java.nio.file.Paths.get("BENCH_DETAIL.json"),
      detail.getBytes("UTF-8"))
    catch { case _: Throwable => }
    val slowest = results.toSeq.sortBy(-_._2).take(10)
      .map { case (k, v) => s"\"" + k + "\":" + fmt(v) }
      .mkString("{", ",", "}")
    println(s"""{"metric":"total","value":${fmt(total)},"unit":"sec","n_queries":${results.size},"queries":$slowest,"sf":"$sfDir"}""")
    spark.stop()
  }
}
