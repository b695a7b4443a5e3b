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

    // The four dedup/graph consumers share ONE LSH verified-pair build,
    // amortized exactly as a production pipeline persists that artifact
    // once. Build it here under its OWN timing entry so their per-query
    // numbers measure their own plans — not whichever consumer happened
    // to run first absorbing the whole stage.
    val sharedStage = {
      val t0 = System.nanoTime()
      try graft.queries.DedupQ.buildSharedPairStage(spark, sfDir)
      catch { case e: Throwable =>
        System.err.println(s"[bench] shared pair stage failed: ${e.getMessage}")
      }
      "dedup_lsh_shared_stage" -> (System.nanoTime() - t0) / 1e9
    }

    // Same treatment for the trained IVF codebook: the four quantizer
    // consumers (search, nprobe, IVF-PQ, cluster profile) reuse ONE
    // k-means train, charged to its own entry.
    val sharedTrain = {
      val t0 = System.nanoTime()
      try graft.queries.SimilarityQ.buildSharedTrainStage(spark, sfDir)
      catch { case e: Throwable =>
        System.err.println(s"[bench] shared kmeans train failed: ${e.getMessage}")
      }
      "similarity_kmeans_shared_train" -> (System.nanoTime() - t0) / 1e9
    }

    // And for the co-purchase edge list: PageRank and k-core peel the
    // SAME graph, built once and charged here.
    val sharedEdges = {
      val t0 = System.nanoTime()
      try graft.queries.GraphQ.buildSharedEdgeStage(spark, sfDir)
      catch { case e: Throwable =>
        System.err.println(s"[bench] shared edge stage failed: ${e.getMessage}")
      }
      "graph_edges_shared_stage" -> (System.nanoTime() - t0) / 1e9
    }

    // And the trained BPE merge table: both tokenizer consumers (merge
    // table, fertility) reuse one 5-round train, charged here.
    val sharedBpe = {
      val t0 = System.nanoTime()
      try graft.queries.Text.buildSharedBpeStage(spark, sfDir)
      catch { case e: Throwable =>
        System.err.println(s"[bench] shared BPE train failed: ${e.getMessage}")
      }
      "text_bpe_shared_train" -> (System.nanoTime() - t0) / 1e9
    }

    // noop sink forces FULL evaluation of every column (a bare .count()
    // would let Catalyst prune projection work and under-measure
    // expression-heavy queries). Every query below executes fully inside
    // its own timing window, except that dedup/graph consumers reuse the
    // pre-built shared stage above (charged to its own entry).
    def sweep(): Seq[(String, Double)] =
      SparkEntry.queries.toSeq.map { case (name, fn) =>
        val t0 = System.nanoTime()
        try fn(spark, sfDir).write.format("noop").mode("overwrite").save()
        catch { case e: Throwable =>
          System.err.println(s"[bench] $name failed: ${e.getMessage}")
        }
        name -> (System.nanoTime() - t0) / 1e9
      }

    // SPARK_GRAFT_BENCH_RUNS > 1 → per-query MEDIAN over that many full
    // sweeps (single runs at local[32] show >1.5x swings on unchanged
    // queries from GC/scheduler noise). Default 1 keeps the driver's
    // per-round wall time unchanged; medians are for committed
    // BENCH_DETAIL snapshots.
    val runsN = math.max(1,
      sys.env.getOrElse("SPARK_GRAFT_BENCH_RUNS", "1").toInt)
    def median(xs: Seq[Double]): Double = {
      val s = xs.sorted
      if (s.size % 2 == 1) s(s.size / 2)
      else (s(s.size / 2 - 1) + s(s.size / 2)) / 2
    }
    val sweeps = (1 to runsN).map(_ => sweep())
    val names = sweeps.head.map(_._1)
    val maps = sweeps.map(_.toMap)
    val results = Seq(sharedStage, sharedTrain, sharedEdges, sharedBpe) ++
      names.map(n => n -> median(maps.map(_(n))))
    def fmt(v: Double): String = f"$v%.3f"
    val qs = results.map { case (k, v) => s"\"" + k + "\":" + fmt(v) }
      .mkString("{", ",", "}")
    val total = results.map(_._2).sum
    // The harness keeps only the TAIL of stdout (~2000 chars), so the full
    // per-query map (~4 KB for 80+ queries) must NOT be on the final line:
    // print detail first (and persist it), then a compact total line LAST
    // that always fits inside the tail window.
    val detail = s"""{"metric":"detail","unit":"sec","runs":$runsN,"queries":$qs,"sf":"$sfDir"}"""
    println(detail)
    try java.nio.file.Files.write(
      java.nio.file.Paths.get("BENCH_DETAIL.json"),
      detail.getBytes("UTF-8"))
    catch { case _: Throwable => }
    val slowest = results.toSeq.sortBy(-_._2).take(10)
      .map { case (k, v) => s"\"" + k + "\":" + fmt(v) }
      .mkString("{", ",", "}")
    // n_queries counts declared registry queries; the shared-stage entry
    // is a timing line item (inside total), not a query.
    println(s"""{"metric":"total","value":${fmt(total)},"unit":"sec","n_queries":${SparkEntry.queries.size},"queries":$slowest,"sf":"$sfDir"}""")
    spark.stop()
  }
}
