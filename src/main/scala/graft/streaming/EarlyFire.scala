package graft.streaming

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming.{ExpiredTimerInfo, OutputMode,
  StatefulProcessor, TimeMode, TimerValues, TTLConfig}

/** One emitted (possibly partial) window count.
  * `closed = false` marks an EARLY fire (the +grace timer won the race);
  * `closed = true` marks the watermark fire at window end. */
case class WindowCount(key: String, windowStart: Long, cnt: Long,
  closed: Boolean)

/** U3 — the reference's custom window trigger
  * (test/bean/MyTrigger.java:10-44): fire a tumbling window when EITHER
  * the watermark passes the window end (Flink's event-time timer at
  * `window.maxTimestamp()`) OR a +5 s grace timer set on element arrival
  * expires first (Flink registers a PROCESSING-time timer at
  * `maxTimestamp() + 5000` — its purpose is to flush a window whose end
  * the watermark never reaches because the key's traffic stopped).
  * Whichever timer fires first cancels the other; a later element
  * re-arms the window, so a window can fire more than once (early +
  * final), exactly like Flink's non-purging FIRE.
  *
  * Structured Streaming port: `transformWithState` owns ONE timer clock
  * per operator, so the dual-clock trigger maps onto event time alone:
  * the grace timer is registered at `lastElementTs + graceMs` — it
  * expires when OTHER traffic advances the watermark ≥ grace past this
  * window's last element while the window end is still unreached, which
  * is precisely the "pipeline kept moving but this window stalled"
  * condition the reference's wall-clock timer detects (in a live stream
  * the wall clock IS the event clock up to the ingest lag). The single
  * registered timer is `min(windowEnd, lastTs + graceMs)`; on expiry
  * `>= windowEnd` ⇒ closed fire + state GC (Flink's onEventTime branch,
  * which deletes the processing-time timer), else ⇒ early fire, state
  * kept, NOT re-armed until the next element (Flink's onProcessingTime
  * branch, which deletes the event-time timer). MyTrigger's
  * onElement immediate-FIRE branch (element arrives with the watermark
  * already past the window end) is unreachable here: Structured
  * Streaming's late-record filter drops such input before the operator
  * (allowed lateness 0 — the reference also sets none).
  *
  * Timers on this API ACCUMULATE (the A8/keepLatestTws lesson), so the
  * previous deadline is tracked and deleted before re-registering.
  *
  * State GC after an un-re-armed early fire: MyTrigger deletes its
  * event-time timer after the processing-time fire, but Flink's
  * WindowOperator still purges the window's state through its OWN
  * cleanup timer at `maxTimestamp + allowedLateness` (WindowOperator
  * registerCleanupTimer / clearAllState). Without that, a key that
  * early-fires and then goes silent would hold its count forever. The
  * port mirrors it: the early-fire branch re-registers a SILENT timer
  * at windowEnd (flagged via `gcOnly`) that clears state without
  * emitting; a new element re-arms the window and drops the flag, so
  * the pinned no-re-fire semantics are unchanged while state for
  * stalled keys is bounded by one window length past the stall.
  */
object EarlyFire {

  class EarlyFireProcessor(windowMs: Long, graceMs: Long)
    extends StatefulProcessor[(String, Long), KeyedEvent, WindowCount] {

    @transient private var cnt: org.apache.spark.sql.streaming.ValueState[Long] = _
    @transient private var deadline: org.apache.spark.sql.streaming.ValueState[Long] = _
    // true when the registered deadline is the post-early-fire cleanup
    // timer: it must CLEAR state silently, never emit (Flink's
    // WindowOperator cleanup after the trigger dropped its ET timer)
    @transient private var gcOnly: org.apache.spark.sql.streaming.ValueState[Boolean] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit = {
      cnt = getHandle.getValueState[Long]("cnt", Encoders.scalaLong,
        TTLConfig.NONE)
      deadline = getHandle.getValueState[Long]("deadline",
        Encoders.scalaLong, TTLConfig.NONE)
      gcOnly = getHandle.getValueState[Boolean]("gcOnly",
        Encoders.scalaBoolean, TTLConfig.NONE)
    }

    override def handleInputRows(key: (String, Long),
        rows: Iterator[KeyedEvent], tv: TimerValues)
        : Iterator[WindowCount] = {
      var n = if (cnt.exists()) cnt.get() else 0L
      var maxTs = Long.MinValue
      rows.foreach { e => n += 1; if (e.ts > maxTs) maxTs = e.ts }
      cnt.update(n)
      val windowEnd = key._2 + windowMs
      val dl = math.min(windowEnd, maxTs + graceMs)
      if (deadline.exists()) getHandle.deleteTimer(deadline.get())
      getHandle.registerTimer(dl)
      deadline.update(dl)
      gcOnly.clear() // a new element re-arms the window as a live fire
      Iterator.empty
    }

    override def handleExpiredTimer(key: (String, Long), tv: TimerValues,
        info: ExpiredTimerInfo): Iterator[WindowCount] = {
      if (!cnt.exists()) return Iterator.empty
      val windowEnd = key._2 + windowMs
      val n = cnt.get()
      deadline.clear()
      if (gcOnly.exists() && gcOnly.get()) {
        // post-early-fire cleanup with no re-arming element: purge
        // silently (Flink clearAllState) — the no-re-fire pin holds
        cnt.clear(); gcOnly.clear()
        Iterator.empty
      } else if (info.getExpiryTimeInMs >= windowEnd ||
          tv.getCurrentWatermarkInMs >= windowEnd) {
        // closed if EITHER the expired timer was the window-end timer
        // OR the watermark has meanwhile passed the window end (both
        // Flink timers due in one advance ⇒ the event-time FIRE wins):
        // final fire + GC
        cnt.clear(); gcOnly.clear()
        Iterator.single(WindowCount(key._1, key._2, n, closed = true))
      } else {
        // grace fire: emit the partial count, keep accumulating; the
        // window re-arms only on the next element (MyTrigger deletes
        // the event-time timer after its processing-time fire). Bound
        // the kept state with a silent cleanup timer at the window end.
        getHandle.registerTimer(windowEnd)
        deadline.update(windowEnd)
        gcOnly.update(true)
        Iterator.single(WindowCount(key._1, key._2, n, closed = false))
      }
    }
  }

  /** Tumbling per-key window counts under the MyTrigger firing rule.
    * Streaming-only (timers); requires the RocksDB state store. */
  def windowCounts(ds: Dataset[KeyedEvent], windowMs: Long = 10000L,
      graceMs: Long = 5000L): Dataset[WindowCount] = {
    import ds.sparkSession.implicits._
    ds.groupByKey(e => (e.key, e.ts - java.lang.Math.floorMod(e.ts, windowMs)))
      .transformWithState(new EarlyFireProcessor(windowMs, graceMs),
        TimeMode.EventTime(), OutputMode.Append)
  }
}
