package graft.streaming

import org.apache.spark.sql.Dataset
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout}

/** One observed event for the concurrency sweep: (day, user, t µs). */
case class ConcEvent(day: Long, userId: Long, t: Long)

/** Running per-day state: each user's [min, max] activity interval so
  * far. Bounded by users-per-day, the same per-key-boundedness
  * contract as every keyed state here. */
case class ConcState(spans: Map[Long, (Long, Long)])

/** The emitted per-day summary after each batch (Update semantics). */
case class ConcSummary(day: Long, nIntervals: Long, peakConcurrent: Long)

/** Streaming twin of q241 (sweep-line peak concurrency): per-day keyed
  * state holds each user's running [first, last] event time; after
  * every micro-batch the ≤ users-per-day intervals are swept in-state
  * and the day's current (n_intervals, peak) is emitted — Update-mode
  * semantics, the reference's keyed-window-reduce shape
  * (DwsTrafficVcChArIsNewPageViewWindow) applied to the interval
  * family.
  *
  * Correctness vs order: the final state after ANY arrival order is
  * the same (per-user min/max are order-free), so the LAST emission
  * per day always equals the batch q241 row — the spec replays the
  * real events table in arbitrary chunks and asserts exactly that
  * (and that intermediate emissions are monotone lower bounds: adding
  * events can only extend intervals, never shrink the peak).
  *
  * Scale: state per day = one (min, max) pair per active user; the
  * in-state sweep is O(u log u) on that bounded set, never over the
  * event stream.
  */
object StreamingConcurrency {

  private def sweep(spans: Iterable[(Long, Long)]): Long = {
    val pts = spans.toSeq.flatMap { case (st, en) =>
      Seq((st, 1L), (en, -1L))
    }.sortBy { case (t, d) => (t, -d) }
    var c = 0L; var mx = 0L
    pts.foreach { p => c += p._2; mx = math.max(mx, c) }
    mx
  }

  private def fold(day: Long, rows: Iterator[ConcEvent],
      state: GroupState[ConcState]): ConcSummary = {
    val cur = state.getOption.getOrElse(ConcState(Map.empty)).spans
    val next = rows.foldLeft(cur) { (acc, e) =>
      val (lo, hi) = acc.getOrElse(e.userId, (e.t, e.t))
      acc.updated(e.userId, (math.min(lo, e.t), math.max(hi, e.t)))
    }
    state.update(ConcState(next))
    ConcSummary(day, next.size.toLong, sweep(next.values))
  }

  /** Maintain per-day concurrency summaries over an event stream. */
  def run(events: Dataset[ConcEvent]): Dataset[ConcSummary] = {
    import events.sparkSession.implicits._
    events.groupByKey(_.day)
      .mapGroupsWithState(GroupStateTimeout.NoTimeout)(fold)
  }
}
