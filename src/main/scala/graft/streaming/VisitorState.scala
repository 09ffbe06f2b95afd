package graft.streaming

import org.apache.spark.sql.Dataset
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Per-visitor keyed-state operators: is_new repair and login-activity
  * classification (SURVEY.md §2.3 P8, §2.5 A5/A6).
  */
object VisitorState {
  import Dedup.dateOf

  /** P8: new/old-visitor repair (ref BaseLogApp.java:69-118). Keeps the
    * first-visit date per mid:
    *  - is_new=1 and state empty → genuinely new, remember the date;
    *  - is_new=1 but state holds an EARLIER date → repair to 0;
    *  - is_new=0 and state empty → old visitor from before state existed:
    *    remember "yesterday" so later same-day events stay 0.
    * State never expires (the reference uses no TTL here). */
  def repairIsNew(ds: Dataset[PageEvent]): Dataset[PageEvent] = {
    import ds.sparkSession.implicits._
    val streaming = ds.isStreaming
    ds.groupByKey(_.mid)
      .flatMapGroupsWithState[String, PageEvent](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (_, events, state: GroupState[String]) =>
          var firstDate = state.getOption.getOrElse("")
          val out = events.toSeq.sortBy(_.ts).map { e =>
            val dt = dateOf(e.ts)
            val repaired =
              if (e.isNew == "1") {
                if (firstDate.isEmpty) { firstDate = dt; e }
                else if (firstDate != dt) e.copy(isNew = "0")
                else e
              } else {
                if (firstDate.isEmpty) firstDate = dateOf(e.ts - 24L * 3600 * 1000)
                e
              }
            repaired
          }
          if (streaming && firstDate.nonEmpty) state.update(firstDate)
          out.iterator
      }
  }

  /** A5+A6: login-activity classification (ref DwsUserUserLoginWindow
    * .java:83-135): per uid, `uu` = first login of the day; `back` =
    * returning after a gap ≥ `backDays` (the reference's 8-day "回流"
    * rule). State: last login date, no TTL. */
  def classifyLogins(ds: Dataset[KeyedEvent], backDays: Int = 8)
      : Dataset[LoginActivity] = {
    import ds.sparkSession.implicits._
    val streaming = ds.isStreaming
    ds.groupByKey(_.key)
      .flatMapGroupsWithState[String, LoginActivity](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (uid, events, state: GroupState[String]) =>
          var lastDate = state.getOption.getOrElse("")
          val out = events.toSeq.sortBy(e => (e.ts, e.payload)).flatMap { e =>
            val dt = dateOf(e.ts)
            if (dt == lastDate) None
            else {
              val back = lastDate.nonEmpty &&
                daysBetween(lastDate, dt) >= backDays
              lastDate = dt
              Some(LoginActivity(uid, dt, e.ts, uu = true, back = back))
            }
          }
          if (streaming && lastDate.nonEmpty) state.update(lastDate)
          out.iterator
      }
  }

  private def daysBetween(from: String, to: String): Long =
    java.time.temporal.ChronoUnit.DAYS.between(
      java.time.LocalDate.parse(from), java.time.LocalDate.parse(to))
}
