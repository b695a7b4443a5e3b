package graft

import java.util.concurrent.{CountDownLatch, Executors, TimeUnit}

/** Concurrent-session isolation: everything else in the suite drives ONE
  * SparkSession at a time, but the session-scoped machinery
  * (SessionScopedCache, the DPP/sliced fixture maps, Scratch's
  * session-tagged paths, the per-session Derby databases) claims two
  * sessions sharing one JVM cannot cross-talk. This spec proves it the
  * direct way: two `newSession()`s (separate SessionState, shared
  * SparkContext + catalog — the multi-tenant shape a long-lived Spark
  * service runs) execute the SAME fixture-writing queries simultaneously,
  * start-barrier-aligned so the overwrite/clear windows genuinely
  * overlap, and every result must equal the single-session answer.
  *
  * The query set is chosen for shared mutable surface, one per hazard:
  *  - csv/xlsx/jdbc round trips   → per-run `mode(overwrite)` fixture
  *    writes (Scratch.sessionDir must keep the paths disjoint)
  *  - partitioned_dpp_join_prune  → the build-once JVM-shared fixture
  *    (computeIfAbsent must serialize the racing builders)
  *  - bucketed_join_zero_shuffle / compaction_small_files → build-once
  *    catalog tables + layouts in SparkContext-shared state
  *  - events_stream_batch_sink / restart_recovery → streaming landings
  *    CLEARED at query start (a shared path would wipe the other
  *    session's batches mid-read — the exact r13-advice race)
  */
class ConcurrencySpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  private val names = Seq(
    "csv_roundtrip_scan",
    "xlsx_roundtrip_scan",
    "jdbc_roundtrip_scan",
    "partitioned_dpp_join_prune",
    "bucketed_join_zero_shuffle",
    "compaction_small_files",
    "events_stream_batch_sink",
    "events_stream_restart_recovery")

  private def canon(name: String,
                    s: org.apache.spark.sql.SparkSession): Seq[String] =
    SparkEntry.registry(name).fn(s, sf).collect()
      .map(_.toString).sorted.toSeq

  test("two sessions run the fixture-writing queries concurrently without cross-talk") {
    val expected = names.map(n => n -> canon(n, spark)).toMap

    val sessions = Seq(spark.newSession(), spark.newSession())
    val start = new CountDownLatch(1)
    val pool = Executors.newFixedThreadPool(2)
    try {
      val futures = sessions.map { s =>
        pool.submit(new java.util.concurrent.Callable[
            Either[(String, Throwable), Map[String, Seq[String]]]] {
          def call() = {
            start.await()
            try Right(names.map(n => n -> canon(n, s)).toMap)
            catch {
              // surface WHICH query raced, not just the stack
              case e: Throwable => Left(("batch", e))
            }
          }
        })
      }
      start.countDown()
      val results = futures.map(_.get(600, TimeUnit.SECONDS))
      results.zipWithIndex.foreach {
        case (Left((_, e)), i) =>
          fail(s"session $i failed under concurrency: $e", e)
        case (Right(got), i) =>
          names.foreach { n =>
            assert(got(n) == expected(n),
              s"session $i diverged on $n under concurrency:\n" +
                s"got      ${got(n).take(5)}\n" +
                s"expected ${expected(n).take(5)}")
          }
      }
    } finally pool.shutdownNow()
  }

  test("session-scoped scratch paths are disjoint across sessions and tagged to this JVM") {
    val s1 = spark.newSession()
    val s2 = spark.newSession()
    val p1 = graft.util.Scratch.sessionDir(s1, "iso_probe", sf)
    val p2 = graft.util.Scratch.sessionDir(s2, "iso_probe", sf)
    assert(p1 != p2, "two sessions were handed one scratch path")
    assert(p1.contains(s"_p${graft.util.Scratch.jvmTag}_"),
      s"scratch path lacks the per-JVM tag: $p1")
    // build-once fixtures ARE shared within the JVM — same tag, no
    // session token — so racing builders serialize on one path instead
    // of writing two copies of a GB-scale fact table
    val j1 = graft.util.Scratch.jvmDir("iso_probe", sf)
    val j2 = graft.util.Scratch.jvmDir("iso_probe", sf)
    assert(j1 == j2)
    assert(j1.endsWith(s"_p${graft.util.Scratch.jvmTag}"))
  }

  test("SessionScopedCache keeps per-session entries independent under eviction") {
    val s1 = spark.newSession()
    val s2 = spark.newSession()
    val c = new graft.util.SessionScopedCache[String]
    var builds = 0
    def b(tag: String): String = { builds += 1; tag }
    assert(c.getOrBuild(s1, "d")(b("one")) == "one")
    assert(c.getOrBuild(s2, "d")(b("two")) == "two")
    assert(builds == 2, "sessions must not share cache entries")
    // evicting s2's entry must not touch s1's
    c.evict(s2, "d")
    assert(c.getOrBuild(s1, "d")(b("three")) == "one",
      "evicting one session's entry rebuilt another session's")
    assert(c.getOrBuild(s2, "d")(b("four")) == "four")
  }
}
