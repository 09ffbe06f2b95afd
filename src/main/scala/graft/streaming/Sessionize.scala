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

  def detectBounces(ds: Dataset[PageEvent], windowMs: Long = 10000)
      : Dataset[Bounce] = {
    import ds.sparkSession.implicits._
    val streaming = ds.isStreaming
    ds.groupByKey(_.mid)
      .flatMapGroupsWithState[PendingEntry, Bounce](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (mid, events, state: GroupState[PendingEntry]) =>
          if (state.hasTimedOut) {
            val out = state.getOption.map(p => Bounce(mid, p.ts)).iterator
            state.remove()
            out
          } else {
            var pending: Option[Long] = state.getOption.map(_.ts)
            val out = Seq.newBuilder[Bounce]
            events.toSeq.sortBy(_.ts).foreach { e =>
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
            if (streaming) {
              pending match {
                case Some(p) =>
                  state.update(PendingEntry(p))
                  // clamp past the watermark: a LATE entry event still
                  // reaches this function (flatMapGroupsWithState does not
                  // drop late rows) and an un-clamped timeout ≤ watermark
                  // kills the query with IllegalArgumentException
                  state.setTimeoutTimestamp(
                    math.max(p + windowMs, state.getCurrentWatermarkMs + 1))
                case None => state.remove()
              }
            } else {
              pending.foreach(p => out += Bounce(mid, p)) // batch flush
            }
            out.result().iterator
          }
      }
  }
}
