package graft.streaming

import org.apache.spark.sql.Encoders
import org.apache.spark.sql.streaming.{OutputMode, StatefulProcessor, TTLConfig,
  TimeMode, TimerValues, ValueState}

/** Input/state/output rows for [[RunningStatsProcessor]]. `tsNs` is the
  * epoch-nanosecond event time (the normalized `ts` contract of
  * graft.io.Tables.events). */
final case class EventIn(user_id: Long, event_id: Long, tsNs: Long,
                         value: Double)
final case class RunState(n: Long, mx: Double)
final case class RunOut(user_id: Long, event_id: Long, run_n: Long,
                        run_max: Double)

/** Per-user running (count, max) over an event stream, written against the
  * Spark 4 `transformWithState` API — the successor to
  * `flatMapGroupsWithState` with explicitly-typed state handles
  * (ValueState/ListState/MapState), per-state TTL, and timers. Requires the
  * RocksDB state store provider; the caller sets
  * `spark.sql.streaming.stateStore.providerClass` for the query's lifetime.
  *
  * Determinism: rows arrive per (key, micro-batch) in arbitrary order, so
  * each batch's rows are sorted by (tsNs, event_id) before folding; across
  * batches the sliced replay is time-ordered (see
  * graft.queries.Events.slicedEventsDir), so the emitted running values
  * equal the batch window `count/max over (partition by user order by ts,
  * event_id)` regardless of how the stream is sliced.
  *
  * Scale: state is one (Long, Double) per user, partition-parallel on the
  * grouping key with no driver involvement; the per-batch sort is bounded by
  * one key's rows within one micro-batch. `max` and `count` are chosen over
  * `sum` so the incremental fold is bit-exact vs any batch oracle
  * (no float accumulation-order divergence).
  */
final class RunningStatsProcessor
    extends StatefulProcessor[Long, EventIn, RunOut] {

  @transient private var state: ValueState[RunState] = _

  override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
    state = getHandle.getValueState[RunState](
      "runstats", Encoders.product[RunState], TTLConfig.NONE)

  override def handleInputRows(key: Long, rows: Iterator[EventIn],
                               timerValues: TimerValues): Iterator[RunOut] = {
    val batch = rows.toArray
    java.util.Arrays.sort(batch, Ordering.by((e: EventIn) => (e.tsNs, e.event_id)))
    var s = if (state.exists()) state.get() else RunState(0L, Double.NegativeInfinity)
    val out = batch.map { e =>
      s = RunState(s.n + 1L, math.max(s.mx, e.value))
      RunOut(key, e.event_id, s.n, s.mx)
    }
    state.update(s)
    out.iterator
  }
}
