package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.OutputMode

import graft.streaming.StreamingTwins

/** Event for the boundary harness: ts is the ns-epoch LONG the parquet
  * events table carries.
  */
final case class WmEvent(ts: Long, event_type: String, value: Double)

/** Keyed event for the bounded-dedup harness. */
final case class WmUserEvent(user_id: Long, ts: Long)

/** Pins the watermark-eviction boundary the q_stream_hourly_append
  * oracle encodes: a window is emitted (and its state evicted) once the
  * watermark REACHES the window end — `window_end ≤ watermark`, watermark
  * = max(event time seen, ms precision) − delay. If a Spark upgrade ever
  * flipped this to a strict inequality, the oracle's `<=` would silently
  * diverge on boundary-aligned data; this suite fails instead.
  */
class WatermarkBoundarySpec extends SparkSpec {
  import spark.implicits._

  private val HourNs = 3600L * 1000000000L

  /** Drive the real append plan over two micro-batches; second batch
    * advances the watermark to exactly `wmTarget`.
    */
  private def emittedHours(firstBatch: Seq[WmEvent], advanceTo: Long): Seq[Long] = {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val input = MemoryStream[WmEvent]
    val q = StreamingTwins.hourlyAppendPlan(input.toDF())
      .writeStream.format("memory")
      .queryName("wm_boundary_" + System.nanoTime())
      .outputMode(OutputMode.Append).start()
    try {
      input.addData(firstBatch: _*)
      q.processAllAvailable()
      input.addData(WmEvent(advanceTo, "probe", 0.0))
      q.processAllAvailable()
      spark.table(q.name).collect().map(_.getLong(0)).toSeq.sorted
    } finally q.stop()
  }

  test("watermark == window end emits the window (the oracle's <= rule)") {
    // window [0, 1h) closed by watermark exactly 1h: max event = 2h
    val out = emittedHours(
      Seq(WmEvent(0L, "click", 1.0), WmEvent(HourNs / 2, "click", 2.0)),
      advanceTo = 2 * HourNs)
    assert(out == Seq(0L), s"expected exactly the [0,1h) window, got $out")
  }

  test("watermark one ms short of window end holds the window in state") {
    val out = emittedHours(
      Seq(WmEvent(0L, "click", 1.0)),
      advanceTo = 2 * HourNs - 1000000L) // watermark = 1h − 1ms
    assert(out.isEmpty, s"window emitted early: $out")
  }

  test("sub-ms event-time precision does not advance the watermark") {
    // max event = 2h + 999µs: ms-truncated stats keep watermark at 1h,
    // still ≥ window end, so [0,1h) emits; [2h,3h) stays open
    val out = emittedHours(
      Seq(WmEvent(0L, "click", 1.0)),
      advanceTo = 2 * HourNs + 999000L)
    assert(out == Seq(0L), s"got $out")
  }

  test("dropDuplicatesWithinWatermark: dupes dropped in-window, state evicted after") {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val input = MemoryStream[WmUserEvent]
    val q = StreamingTwins.dedupWithinWatermarkPlan(input.toDF())
      .writeStream.format("memory")
      .queryName("wm_dedup_" + System.nanoTime())
      .outputMode(OutputMode.Append).start()
    def users = spark.table(q.name).collect().map(_.getLong(0)).toSeq
    try {
      // batch 1: user 1 twice in-batch → emitted once
      input.addData(WmUserEvent(1L, 0L), WmUserEvent(1L, HourNs / 4))
      q.processAllAvailable()
      assert(users == Seq(1L), s"got $users")
      // batch 2: user 1 again within the 1h delay → dropped; user 99 at
      // 3h advances the watermark to 2h, past user 1's expiry (t0 + 1h)
      input.addData(WmUserEvent(1L, HourNs / 2), WmUserEvent(99L, 3 * HourNs))
      q.processAllAvailable()
      assert(users.sorted == Seq(1L, 99L), s"got $users")
      // batch 3: user 1 recurs AFTER eviction → emitted again. This is
      // the bounded-state trade the operator makes; the q_stream_dedup_wm
      // oracle is unaffected (static replay = one batch, no eviction).
      input.addData(WmUserEvent(1L, 3 * HourNs))
      q.processAllAvailable()
      assert(users.sorted == Seq(1L, 1L, 99L), s"got $users")
    } finally q.stop()
  }

  test("bounded sessionizer: idle users evicted, numbering restarts after eviction") {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val input = MemoryStream[graft.streaming.SessEvent]
    val q = StreamingTwins.sessionizeBoundedDS(input.toDF()).toDF()
      .writeStream.format("memory")
      .queryName("wm_sess_" + System.nanoTime())
      .outputMode(OutputMode.Append).start()
    def out = spark.table(q.name).collect()
      .map(r => (r.getLong(1), r.getLong(2))).sortBy(_._1).toSeq
    val gapNs = 1800000000000L // 30 min
    // keep all event times strictly above the initial (epoch-0) watermark
    // — an event AT the watermark is dropped as late in this operator
    val base = 100 * HourNs
    try {
      import graft.streaming.SessEvent
      // two sessions for user 1 within one batch (gap rule fires in-state)
      input.addData(SessEvent(1, 100, base), SessEvent(1, 101, base + gapNs * 3))
      q.processAllAvailable()
      assert(out == Seq((100L, 1L), (101L, 2L)), s"got $out")
      // user 99 10h later advances the watermark 9h past user 1's
      // timeout (last event + 30min) → user 1's state is evicted
      input.addData(SessEvent(99, 200, base + 20 * gapNs))
      q.processAllAvailable()
      // user 1 recurs: state was dropped, numbering restarts at 1 — the
      // bounded-state trade (the gap rule would open a new session anyway;
      // only the ABSOLUTE numbering resets)
      input.addData(SessEvent(1, 102, base + 21 * gapNs))
      q.processAllAvailable()
      assert(out == Seq((100L, 1L), (101L, 2L), (102L, 1L), (200L, 1L)),
        s"got $out")
    } finally q.stop()
  }
}
