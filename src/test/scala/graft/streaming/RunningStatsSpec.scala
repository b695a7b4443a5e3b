package graft.streaming

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.{OutputMode, TimeMode}
import graft.SparkSpec

/** transformWithState running-stats processor: cross-batch ValueState
  * carry and in-batch (ts, event_id) sort determinism, driven through the
  * real engine over three explicit micro-batches on the RocksDB provider
  * the API requires. */
class RunningStatsSpec extends SparkSpec {

  test("running stats carry state across micro-batches, order-free in batch") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val pcKey = "spark.sql.streaming.stateStore.providerClass"
    val prev = spark.conf.getOption(pcKey)
    spark.conf.set(pcKey, "org.apache.spark.sql.execution.streaming.state." +
      "RocksDBStateStoreProvider")
    val ckpt = java.nio.file.Files
      .createTempDirectory("graft-tws-spec-").toString
    try {
      val mem = MemoryStream[EventIn]
      val out = mem.toDS().groupByKey(_.user_id)
        .transformWithState(new RunningStatsProcessor,
          TimeMode.None(), OutputMode.Append())
      val q = out.toDF().writeStream
        .outputMode("append")
        .format("memory").queryName("tws_spec_out")
        .option("checkpointLocation", ckpt)
        .start()
      // batch 1: user 1's rows added REVERSED — the processor must fold in
      // (tsNs, event_id) order, not arrival order.
      mem.addData(EventIn(1L, 102L, 20L, 3.0), EventIn(1L, 101L, 10L, 5.0))
      q.processAllAvailable()
      // batch 2: new key appears while key 1 extends its state.
      mem.addData(EventIn(1L, 103L, 30L, 9.0), EventIn(2L, 104L, 5L, 1.0))
      q.processAllAvailable()
      // batch 3: key 1's max must survive from batch 2's state.
      mem.addData(EventIn(1L, 105L, 40L, 2.0))
      q.processAllAvailable()
      q.stop()

      val got = spark.table("tws_spec_out")
        .collect()
        .map(r => (r.getLong(1), (r.getLong(0), r.getLong(2), r.getDouble(3))))
        .toMap
      assert(got === Map(
        101L -> ((1L, 1L, 5.0)),
        102L -> ((1L, 2L, 5.0)),
        103L -> ((1L, 3L, 9.0)),
        104L -> ((2L, 1L, 1.0)),
        105L -> ((1L, 4L, 9.0))))
    } finally {
      prev match {
        case Some(v) => spark.conf.set(pcKey, v)
        case None    => spark.conf.unset(pcKey)
      }
      val walk = java.nio.file.Files.walk(java.nio.file.Paths.get(ckpt))
      try walk.sorted(java.util.Comparator.reverseOrder())
        .forEach(p => { java.nio.file.Files.deleteIfExists(p); () })
      finally walk.close()
    }
  }
}
