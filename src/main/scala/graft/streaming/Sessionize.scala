package graft.streaming

import org.apache.spark.sql.Dataset
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Bounce ("user jump") detection — the CEP replacement (SURVEY.md §2.9;
  * ref app/dwd/log/DwdTrafficUserJumpDetail.java:62-107).
  *
  * Reference pattern (Flink CEP): a session-entry page event
  * (`last_page_id IS NULL`) is a bounce iff the IMMEDIATELY NEXT page
  * event of the same mid is (a) another session entry within 10 s, or
  * (b) absent for 10 s (pattern timeout). A non-entry next event within
  * 10 s means the user navigated — no bounce.
  *
  * Here: a hand-rolled state machine in flatMapGroupsWithState holding at
  * most one pending entry per mid, with an event-time timeout standing in
  * for the CEP `within(10s)` timeout branch. Batch mode processes each
  * mid's full history in ts order and flushes the trailing pending entry
  * (end-of-input ≡ timeout), giving identical results to a replay.
  */
object Sessionize {

  case class PendingEntry(ts: Long)

  /** Buffered page event for the streaming bounce machine: only the
    * fields the strict-next decision needs. */
  case class BufEv(ts: Long, entry: Boolean)

  /** Streaming bounce state: the open session entry (if any) plus the
    * not-yet-finalizable events (ts > watermark). The buffer is what
    * makes out-of-order streams safe — see [[detectBounces]]. */
  case class BounceState(pending: Option[Long], buf: Seq[BufEv])

  case class FunnelState(anchorTs: Long, stepsReached: Int, lastStepTs: Long,
      done: Boolean)

  /** N-step ordered funnel with per-step gap timeouts — the general CEP
    * capability class the 2-event bounce pattern below instantiates
    * (`followedBy` contiguity: intermediate events neither advance nor
    * reset the pattern, unlike the bounce's strict `next`).
    *
    * Semantics, per key: the FIRST step-0 event anchors the pattern; step
    * k advances it iff it is the next expected step and arrives within
    * `timeoutsMs(k-1)` of step k-1 (inclusive, ties resolved
    * step-0-first). Exactly ONE outcome is emitted per anchored key:
    * `completed=true` the moment the last step lands, or
    * `completed=false` when the current gap expires (event-driven in
    * batch/later micro-batches, watermark-timeout-driven in streaming).
    * Keys that never reach step 0 emit nothing.
    *
    * Batch ≡ streaming: end-of-input plays the timeout role in batch, so
    * a streaming replay of the same events produces the same outcomes
    * (property-tested against the q58 SQL funnel). Bounded state: after
    * its outcome a key holds only a tombstone (blocking a re-anchor that
    * batch's global-first-anchor semantics would not have) which is
    * reaped `tombstoneMs` past the key's last activity. */
  def funnel(ds: Dataset[FunnelEvent], nSteps: Int, timeoutsMs: Seq[Long],
      tombstoneMs: Long = 7L * 24 * 3600 * 1000): Dataset[FunnelOutcome] = {
    require(nSteps >= 2 && timeoutsMs.length == nSteps - 1,
      s"need one gap timeout per transition: ${nSteps - 1}")
    import ds.sparkSession.implicits._
    val streaming = ds.isStreaming
    ds.groupByKey(_.key)
      .flatMapGroupsWithState[FunnelState, FunnelOutcome](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (key, events, state: GroupState[FunnelState]) =>
          val evSeq = if (state.hasTimedOut) Seq.empty else events.toSeq
          if (state.hasTimedOut) {
            val st = state.get
            if (!st.done) {
              // gap expired mid-pattern: fail the key, tombstone it
              state.update(st.copy(done = true))
              state.setTimeoutTimestamp(state.getCurrentWatermarkMs + tombstoneMs)
              Iterator.single(
                FunnelOutcome(key, st.anchorTs, completed = false,
                  st.lastStepTs, st.stepsReached))
            } else { state.remove(); Iterator.empty }
          } else {
            var st = state.getOption.orNull
            val out = Seq.newBuilder[FunnelOutcome]
            evSeq.sortBy(e => (e.ts, e.step)).foreach { e =>
              if (st == null) {
                if (e.step == 0) st = FunnelState(e.ts, 1, e.ts, done = false)
              } else if (!st.done) {
                // In BATCH, input is complete and globally sorted, so any
                // event past the deadline proves expiry. In STREAMING,
                // arrival order proves nothing: an on-time (within
                // watermark) out-of-order step event may still arrive in
                // a later micro-batch, so only the watermark timer may
                // declare expiry — the hasTimedOut branch above.
                if (!streaming &&
                    e.ts - st.lastStepTs > timeoutsMs(st.stepsReached - 1)) {
                  out += FunnelOutcome(key, st.anchorTs, completed = false,
                    st.lastStepTs, st.stepsReached)
                  st = st.copy(done = true)
                } else if (e.step == st.stepsReached && e.ts >= st.lastStepTs &&
                    e.ts - st.lastStepTs <= timeoutsMs(st.stepsReached - 1)) {
                  st = FunnelState(st.anchorTs, st.stepsReached + 1, e.ts,
                    done = st.stepsReached + 1 == nSteps)
                  if (st.done)
                    out += FunnelOutcome(key, st.anchorTs, completed = true,
                      e.ts, nSteps)
                }
              }
            }
            if (streaming) {
              if (st != null) {
                state.update(st)
                val deadline =
                  if (st.done) st.lastStepTs + tombstoneMs
                  else st.lastStepTs + timeoutsMs(st.stepsReached - 1)
                state.setTimeoutTimestamp(
                  math.max(deadline, state.getCurrentWatermarkMs + 1))
              }
            } else if (st != null && !st.done) {
              // end-of-input ≡ timeout
              out += FunnelOutcome(key, st.anchorTs, completed = false,
                st.lastStepTs, st.stepsReached)
            }
            out.result().iterator
          }
      }
  }

  /** Spark-4 `transformWithState` port of the streaming branch of
    * [[funnel]] — the deprecation path for the hardest stateful operator
    * (same shape as `Dedup.keepLatestTws`). Streaming-only by API;
    * equivalence to the flatMapGroupsWithState implementation on the
    * same replay is asserted by TransformWithStateSpec. Timers on this
    * API ACCUMULATE (registerTimer does not replace), so the armed
    * deadline is tracked in state and deleted before re-arming. */
  class FunnelProcessor(nSteps: Int, timeoutsMs: Seq[Long], tombstoneMs: Long)
    extends org.apache.spark.sql.streaming.StatefulProcessor[
      String, FunnelEvent, FunnelOutcome] {
    import org.apache.spark.sql.streaming.{ExpiredTimerInfo, TTLConfig, TimeMode, TimerValues}
    import org.apache.spark.sql.{Encoders, streaming}

    @transient private var st: streaming.ValueState[FunnelState] = _
    @transient private var deadline: streaming.ValueState[Long] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit = {
      st = getHandle.getValueState[FunnelState]("funnel",
        Encoders.product[FunnelState], TTLConfig.NONE)
      deadline = getHandle.getValueState[Long]("deadline",
        Encoders.scalaLong, TTLConfig.NONE)
    }

    private def arm(dl: Long): Unit = {
      if (deadline.exists()) getHandle.deleteTimer(deadline.get())
      getHandle.registerTimer(dl)
      deadline.update(dl)
    }

    override def handleInputRows(key: String, rows: Iterator[FunnelEvent],
        tv: TimerValues): Iterator[FunnelOutcome] = {
      var s = if (st.exists()) st.get() else null
      val out = Seq.newBuilder[FunnelOutcome]
      rows.toSeq.sortBy(e => (e.ts, e.step)).foreach { e =>
        if (s == null) {
          if (e.step == 0) s = FunnelState(e.ts, 1, e.ts, done = false)
        } else if (!s.done) {
          // as in the streaming branch of [[funnel]]: only the watermark
          // timer may declare expiry — an on-time out-of-order step may
          // still arrive in a later micro-batch
          if (e.step == s.stepsReached && e.ts >= s.lastStepTs &&
              e.ts - s.lastStepTs <= timeoutsMs(s.stepsReached - 1)) {
            s = FunnelState(s.anchorTs, s.stepsReached + 1, e.ts,
              done = s.stepsReached + 1 == nSteps)
            if (s.done)
              out += FunnelOutcome(key, s.anchorTs, completed = true, e.ts, nSteps)
          }
        }
      }
      if (s != null) {
        st.update(s)
        val dl = if (s.done) s.lastStepTs + tombstoneMs
          else s.lastStepTs + timeoutsMs(s.stepsReached - 1)
        arm(math.max(dl, tv.getCurrentWatermarkInMs + 1))
      }
      out.result().iterator
    }

    override def handleExpiredTimer(key: String, tv: TimerValues,
        info: ExpiredTimerInfo): Iterator[FunnelOutcome] = {
      deadline.clear() // the fired timer is gone; never delete it blindly
      if (!st.exists()) Iterator.empty
      else {
        val s = st.get()
        if (!s.done) {
          // gap expired mid-pattern: fail the key, tombstone it
          st.update(s.copy(done = true))
          arm(tv.getCurrentWatermarkInMs + tombstoneMs)
          Iterator.single(FunnelOutcome(key, s.anchorTs, completed = false,
            s.lastStepTs, s.stepsReached))
        } else { st.clear(); Iterator.empty }
      }
    }
  }

  /** Streaming-only transformWithState flavor of [[funnel]] (requires the
    * RocksDB state store provider). */
  def funnelTws(ds: Dataset[FunnelEvent], nSteps: Int, timeoutsMs: Seq[Long],
      tombstoneMs: Long = 7L * 24 * 3600 * 1000): Dataset[FunnelOutcome] = {
    require(nSteps >= 2 && timeoutsMs.length == nSteps - 1,
      s"need one gap timeout per transition: ${nSteps - 1}")
    import ds.sparkSession.implicits._
    import org.apache.spark.sql.streaming.TimeMode
    ds.groupByKey(_.key)
      .transformWithState(new FunnelProcessor(nSteps, timeoutsMs, tombstoneMs),
        TimeMode.EventTime(), OutputMode.Append)
  }

  /** Strict-next bounce detection. BATCH: input is complete, so the
    * machine runs once over the mid's full ts-ordered history
    * (end-of-input ≡ timeout) — this is the q19 oracle path and is
    * byte-stable. STREAMING: decisions are only finalized as the
    * WATERMARK passes them — arrival order proves nothing about
    * event-time order across micro-batches, so deciding on arrival
    * (the pre-round-7 behavior) could emit a bounce that an on-time
    * out-of-order successor later invalidates, or cancel one that a
    * late-but-on-time entry re-establishes. Events above the watermark
    * buffer in state (the same buffered-replay semantics Flink CEP
    * applies under `within`); each watermark advance drains the ripe
    * prefix through the batch machine. Buffer size is bounded by the
    * watermark delay × the mid's event rate — the price of
    * out-of-order correctness, paid per active session only. */
  def detectBounces(ds: Dataset[PageEvent], windowMs: Long = 10000)
      : Dataset[Bounce] = {
    import ds.sparkSession.implicits._
    val streaming = ds.isStreaming
    ds.groupByKey(_.mid)
      .flatMapGroupsWithState[BounceState, Bounce](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (mid, events, state: GroupState[BounceState]) =>
          if (!streaming) {
            // complete input: one in-order pass, flush trailing pending
            var pending: Option[Long] = None
            val out = Seq.newBuilder[Bounce]
            // same deterministic tie-break as the streaming ripe drain:
            // at equal ts, exits run before entries (arrival order would
            // otherwise decide a same-ts entry+exit pair differently
            // between runs and between the two modes)
            events.toSeq.sortBy(e => (e.ts, e.lastPageId.isEmpty)).foreach { e =>
              val isEntry = e.lastPageId.isEmpty
              pending match {
                case Some(p) =>
                  if (e.ts - p > windowMs) {
                    out += Bounce(mid, p) // timeout: nothing followed in time
                    pending = if (isEntry) Some(e.ts) else None
                  } else if (isEntry) {
                    out += Bounce(mid, p) // entry → entry within window
                    pending = Some(e.ts)
                  } else {
                    pending = None // user navigated on
                  }
                case None =>
                  if (isEntry) pending = Some(e.ts)
              }
            }
            pending.foreach(p => out += Bounce(mid, p)) // end-of-input flush
            out.result().iterator
          } else {
            val prev = state.getOption.getOrElse(BounceState(None, Nil))
            val arrived =
              if (state.hasTimedOut) Nil
              else events.map(e => BufEv(e.ts, e.lastPageId.isEmpty)).toSeq
            val wm = state.getCurrentWatermarkMs
            // ripe = finalizable: nothing with a smaller ts can still arrive
            val (ripe, rest) = (prev.buf ++ arrived).partition(_.ts <= wm)
            var pending = prev.pending
            val out = Seq.newBuilder[Bounce]
            ripe.sortBy(e => (e.ts, e.entry)).foreach { e =>
              pending match {
                case Some(p) =>
                  if (e.ts - p > windowMs) {
                    out += Bounce(mid, p)
                    pending = if (e.entry) Some(e.ts) else None
                  } else if (e.entry) {
                    out += Bounce(mid, p)
                    pending = Some(e.ts)
                  } else pending = None
                case None =>
                  if (e.entry) pending = Some(e.ts)
              }
            }
            // the open entry's window has fully passed the watermark with
            // no successor → the CEP timeout branch
            pending.foreach { p =>
              if (wm > p + windowMs) { out += Bounce(mid, p); pending = None }
            }
            if (pending.isEmpty && rest.isEmpty) state.remove()
            else {
              state.update(BounceState(pending, rest))
              // wake when the pending window can expire or the earliest
              // buffered event can ripen — both strictly above wm
              val wake = (pending.map(_ + windowMs + 1).toSeq ++
                (if (rest.nonEmpty) Seq(rest.map(_.ts).min) else Nil)).min
              state.setTimeoutTimestamp(math.max(wake, wm + 1))
            }
            out.result().iterator
          }
      }
  }
}
