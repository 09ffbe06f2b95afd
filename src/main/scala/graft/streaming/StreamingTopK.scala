package graft.streaming

import org.apache.spark.sql.Dataset
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout}

/** One weighted token observation in a keyed stream. */
case class TokenEvent(group: String, token: String, w: Long)

/** The m-counter Misra–Gries summary of one group, emitted per batch:
  * `lower` is the counter value (a LOWER bound on the true frequency;
  * true − lower ≤ decrements ≤ N/(m+1)). */
case class MgSummary(group: String, tokens: Map[String, Long], n: Long)

/** Streaming heavy hitters — the q124 native Misra–Gries aggregate run
  * as KEYED STATE: each group's m-counter summary lives in state, every
  * micro-batch folds its (token, weight) observations in with the
  * weighted MG update, and the summary is emitted per touched group
  * per batch. Because MG summaries MERGE (the property the batch
  * native's partial buffers rely on), the stream's state after any
  * prefix equals a batch MG over that prefix processed in arrival
  * order — StreamingTopKSpec pins the frequency bounds that hold
  * REGARDLESS of order: every counter is a lower bound, the deficit is
  * ≤ N/(m+1), and every true-frequency > N/(m+1) item is present.
  *
  * Ref: the reference's keyword-frequency DWS job (keyed running
  * counts emitted per window); this is that job with bounded state.
  *
  * Scale: state = ≤ m counters per group (RocksDB-ready); per-batch
  * work is observation-sized. The unbounded-domain alternative (a
  * counter per distinct token) is exactly what MG exists to avoid.
  */
object StreamingTopK {

  /** Weighted MG fold: equivalent to w unit inserts (each loop
    * iteration either finishes the token or removes ≥ 1 counter, so
    * it terminates in ≤ m steps per observation). */
  private[streaming] def mgInsert(m: Int,
      c: scala.collection.mutable.Map[String, Long],
      t: String, w: Long): Unit = {
    var rem = w
    while (rem > 0) {
      if (c.contains(t)) { c(t) += rem; rem = 0 }
      else if (c.size < m) { c(t) = rem; rem = 0 }
      else {
        val mn = c.values.min
        val d = math.min(rem, mn)
        c.keys.toSeq.foreach { k =>
          val v = c(k) - d
          if (v == 0L) c -= k else c(k) = v
        }
        rem -= d
      }
    }
  }

  private def fold(m: Int)(group: String, rows: Iterator[TokenEvent],
      state: GroupState[MgSummary]): MgSummary = {
    val cur = state.getOption.getOrElse(MgSummary(group, Map.empty, 0L))
    val c = scala.collection.mutable.Map.empty[String, Long] ++= cur.tokens
    var n = cur.n
    rows.foreach { e => mgInsert(m, c, e.token, e.w); n += e.w }
    val next = MgSummary(group, c.toMap, n)
    state.update(next)
    next
  }

  /** Maintain per-group m-counter summaries over a (possibly
    * streaming) token stream. */
  def maintain(events: Dataset[TokenEvent], m: Int): Dataset[MgSummary] = {
    import events.sparkSession.implicits._
    events.groupByKey(_.group)
      .mapGroupsWithState(GroupStateTimeout.NoTimeout)(fold(m))
  }
}
