package graft
import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths}
/** Driver-run correctness dump: each SparkEntry.queries result → parquet,
  * plus oracle_sql.json, for the driver's DuckDB compare. */
object Verify {
  def main(args: Array[String]): Unit = {
    val Array(sfDir, outDir) = args
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    // SPARK_GRAFT_MASTER overrides the single-JVM default — used by the
    // multi-process proof (local-cluster[N,c,mem] / a standalone master
    // URL), where serialization, locality and executor-loss semantics
    // actually cross a process boundary. The driver never sets it.
    val master = sys.env.getOrElse("SPARK_GRAFT_MASTER", s"local[$cpus]")
    // Multi-process extras (only meaningful under a non-local master):
    // executor JVMs need the application classes on their own classpath
    // (local[*] shares the driver's), their heap sizing, and the JDK17
    // --add-opens set the driver gets from build.sbt.
    val execConfs = Seq(
      "spark.executor.extraClassPath" -> "SPARK_GRAFT_EXEC_CLASSPATH",
      "spark.executor.memory" -> "SPARK_GRAFT_EXEC_MEM",
      "spark.executor.extraJavaOptions" -> "SPARK_GRAFT_EXEC_JAVAOPTS")
    val spark = execConfs.foldLeft(
      SparkSession.builder()
      .master(master))((b, kv) =>
        sys.env.get(kv._2).fold(b)(v => b.config(kv._1, v)))
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      // Superseded per-round broadcasts/checkpoints of the iterative
      // queries are reclaimed by the ContextCleaner only AFTER a driver
      // GC; a 383-query sweep under a constrained heap can starve
      // execution memory on dead blocks long before the JVM bothers to
      // collect. One driver GC a minute keeps the cleaner fed (no-op
      // cost when memory is ample).
      .config("spark.cleaner.periodicGC.interval", "1min")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    new java.io.File(outDir).mkdirs()
    // Dev-only subset filter (comma-separated name prefixes); the driver
    // never sets it, so its runs always cover the full registry.
    val only = sys.env.get("SPARK_GRAFT_ONLY")
      .map(_.split(",").map(_.trim).filter(_.nonEmpty).toSeq)
    // A stray SPARK_GRAFT_ONLY in a verification environment would shrink
    // coverage while the run still looked fully green — so a subset run is
    // LOUD on stderr and leaves a machine-readable marker in outDir that
    // downstream checkers can detect.
    only.foreach { prefixes =>
      System.err.println(
        s"[verify] WARNING: SPARK_GRAFT_ONLY is set — PARTIAL coverage, " +
          s"only query-name prefixes: ${prefixes.mkString(", ")}")
      Files.writeString(Paths.get(s"$outDir/SUBSET_MARKER.json"),
        prefixes.map(p => "\"" + p + "\"").mkString("[", ",", "]"))
    }
    def selected(name: String): Boolean =
      only.forall(_.exists(name.startsWith))
    // SPARK_GRAFT_METRICS=1: per-query shuffle-spill attribution for the
    // constrained-heap gate (r14) — a cumulative task-metrics listener,
    // snapshotted around each query (queries run sequentially, so the
    // delta is the query's own). Memory spills are APPROXIMATE credit
    // (in-memory size of spilled blocks); disk spills are real bytes.
    // The listener bus is asynchronous, so a straggler task's spill can
    // bleed into the NEXT query's delta — fine for the gate's GB-scale
    // findings, not a per-query accounting ledger.
    val spillMem = new java.util.concurrent.atomic.AtomicLong
    val spillDisk = new java.util.concurrent.atomic.AtomicLong
    if (sys.env.get("SPARK_GRAFT_METRICS").contains("1"))
      spark.sparkContext.addSparkListener(
        new org.apache.spark.scheduler.SparkListener {
          override def onTaskEnd(
              t: org.apache.spark.scheduler.SparkListenerTaskEnd): Unit =
            Option(t.taskMetrics).foreach { m =>
              spillMem.addAndGet(m.memoryBytesSpilled)
              spillDisk.addAndGet(m.diskBytesSpilled): Unit
            }
        })
    // Executor loss invalidates localCheckpoint blocks (deliberately
    // non-fault-tolerant); a query failing on a LOST shared artifact is
    // recoverable by evicting the shared-stage caches and rebuilding —
    // the local-cluster SIGKILL probe (r15) showed exactly 4 consumers
    // of the killed executor's edge-stage blocks failing while the rest
    // of the sweep recovered. One retry, loudly logged.
    def isCheckpointLoss(e: Throwable): Boolean =
      Iterator.iterate(e)(_.getCause).takeWhile(_ != null).take(8).exists {
        t => Option(t.getMessage).exists(m =>
          m.contains("CHECKPOINT_RDD_BLOCK_ID_NOT_FOUND") ||
            m.contains("Checkpoint block"))
      }
    SparkEntry.queries.filter(kv => selected(kv._1)).foreach { case (name, fn) =>
      val (m0, d0) = (spillMem.get(), spillDisk.get())
      def runOnce(): Unit =
        fn(spark, sfDir).coalesce(1).write.mode("overwrite")
          .parquet(s"$outDir/$name")
      try {
        try runOnce()
        catch { case e: Throwable if isCheckpointLoss(e) =>
          System.err.println(s"[verify] $name: checkpoint blocks lost " +
            "(executor loss) — evicting shared stages, rebuilding once")
          graft.util.SessionScopedCache.evictAll(spark, sfDir)
          runOnce()
        }
        if (sys.env.get("SPARK_GRAFT_METRICS").contains("1"))
          println(s"[metrics] $name spill_mem=${spillMem.get() - m0} " +
            s"spill_disk=${spillDisk.get() - d0}")
      }
      catch { case e: Throwable =>
        System.err.println(s"[verify] $name failed: ${e.getMessage}")
      }
    }
    // JSON string escape: backslash, quote, and ALL control chars (<0x20)
    // — a tab or CR in builder-authored SQL would otherwise make the
    // driver's json.load fail and silently zero the round's correctness.
    def q(s: String): String = "\"" + s.flatMap {
      case '"'  => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""
    val json = SparkEntry.oracleSql.filter(kv => selected(kv._1))
      .map { case (k, v) => s"${q(k)}: ${q(v)}" }.mkString("{", ",", "}")
    Files.writeString(Paths.get(s"$outDir/oracle_sql.json"), json)
    spark.stop()
  }
}
