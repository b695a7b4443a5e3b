package graft.ext

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** Semantics of the ordered funnel (events_funnel_conversion): step
  * ordering (a click BEFORE the first view does not count), window
  * inclusivity (exactly at +window counts; one µs past does not), and
  * null rates when a step is empty. The oracle proves engine parity;
  * these pin the FUNNEL DEFINITION against hand-built users. */
class FunnelSpec extends SparkSpec {

  private val W = 1000000L // 1s window in µs, for readable fixtures

  private def funnel(rows: Seq[(Long, String, Long)]) = {
    import spark.implicits._
    graft.queries.Events.funnelConversion(
      rows.toDF("user_id", "event_type", "tus"), W).head()
  }

  test("completer, out-of-order clicker, and late clicker count correctly") {
    val r = funnel(Seq(
      // user 1: clean conversion view@0 -> click@10 -> purchase@20
      (1L, "view", 0L), (1L, "click", 10L), (1L, "purchase", 20L),
      // user 2: click BEFORE the first view -> no click step
      (2L, "click", 5L), (2L, "view", 10L), (2L, "purchase", 20L),
      // user 3: click one µs past the window -> no click step
      (3L, "view", 0L), (3L, "click", W + 1L),
      // user 4: click exactly AT the window boundary -> counts (<=)
      (4L, "view", 0L), (4L, "click", W)))
    assert(r.getLong(0) == 4L, "n_view")
    assert(r.getLong(1) == 2L, "n_click: users 1 and 4 only")
    assert(r.getLong(2) == 1L, "n_purchase: user 1 only")
    assert(r.getDouble(3) == 0.5, "view_to_click_rate")
    assert(r.getDouble(4) == 0.5, "click_to_purchase_rate")
    // user 1 converted in 20 µs = 2e-5 s
    assert(math.abs(r.getDouble(5) - 20e-6) < 1e-12)
  }

  test("first qualifying event per step, not any event") {
    // Two clicks inside the window: the EARLIER one anchors the purchase
    // window; a purchase inside [click1, click1+W] converts even though
    // it precedes click2.
    val r = funnel(Seq(
      (1L, "view", 0L), (1L, "click", 10L), (1L, "click", 500L),
      (1L, "purchase", 400L)))
    assert(r.getLong(1) == 1L && r.getLong(2) == 1L)
    // time-to-convert measured from the FIRST view
    assert(math.abs(r.getDouble(5) - 400e-6) < 1e-12)
  }

  test("empty downstream steps yield null rates, not division blowups") {
    val r = funnel(Seq((1L, "view", 0L)))
    assert(r.getLong(0) == 1L && r.getLong(1) == 0L && r.getLong(2) == 0L)
    assert(r.getDouble(3) == 0.0)
    assert(r.isNullAt(4) && r.isNullAt(5))
  }
}
