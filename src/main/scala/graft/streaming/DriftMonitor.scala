package graft.streaming

import org.apache.spark.sql.Dataset
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** One observed value for a monitored stream (key = the monitored
  * series, e.g. event_type). */
case class Observation(key: String, value: Double)

/** Per-key, per-micro-batch drift readout: the binned two-sample KS
  * statistic (ppm) of this batch against the key's REFERENCE window
  * (its first batch), plus the sample sizes. */
case class DriftReadout(key: String, batchN: Long, nRef: Long, nBatch: Long,
    ksPpm: Long)

/** Monitor state: the frozen reference histogram + batches seen. */
case class DriftState(ref: Array[Long], batches: Long)

/** Streaming twin of q178's drift test — distribution monitoring as
  * keyed state: the first micro-batch a key sees becomes its frozen
  * reference histogram; every later batch emits the binned KS
  * statistic of that batch against the reference, in the same
  * cross-multiplied integer form as q178 (ppm of n_ref·n_batch, no
  * float CDF). Binning (value div 32 into 16 bins) is what makes the
  * state BOUNDED — the batch q178 can afford the exact distinct-value
  * frame; a stream holding every distinct double ever seen could not
  * (the q126/StreamingLsh state-growth rule).
  *
  * Ref: the reference's keyed ValueState pattern
  * (DwdTrafficUniqueVisitorDetail.java:60-109), holding a reference
  * distribution instead of a visit date.
  */
object DriftMonitor {

  val Bins = 16
  val BinWidth = 32.0

  private[streaming] def bin(v: Double): Int = {
    val b = (v / BinWidth).toInt
    if (b < 0) 0 else if (b >= Bins) Bins - 1 else b
  }

  private[streaming] def histogram(vs: Iterable[Double]): Array[Long] = {
    val h = Array.fill(Bins)(0L)
    vs.foreach(v => h(bin(v)) += 1)
    h
  }

  /** Cross-multiplied binned KS: max over bin prefixes of
    * |cumRef·nBatch − cumBatch·nRef| · 10⁶ div (nRef·nBatch). */
  private[streaming] def ksPpm(ref: Array[Long], cur: Array[Long]): Long = {
    val (nr, nc) = (ref.sum, cur.sum)
    var (cr, cc, mx) = (0L, 0L, 0L)
    for (i <- 0 until Bins) {
      cr += ref(i); cc += cur(i)
      val d = math.abs(cr * nc - cc * nr)
      if (d > mx) mx = d
    }
    mx * 1000000L / (nr * nc)
  }

  private def step(key: String, rows: Iterator[Observation],
      state: GroupState[DriftState]): Iterator[DriftReadout] = {
    val h = histogram(rows.map(_.value).toSeq)
    state.getOption match {
      case None =>
        state.update(DriftState(h, 1L))
        Iterator.empty // the reference batch emits nothing
      case Some(st) =>
        state.update(DriftState(st.ref, st.batches + 1))
        Iterator.single(DriftReadout(key, st.batches + 1, st.ref.sum,
          h.sum, ksPpm(st.ref, h)))
    }
  }

  def monitor(obs: Dataset[Observation]): Dataset[DriftReadout] = {
    import obs.sparkSession.implicits._
    obs.groupByKey(_.key)
      .flatMapGroupsWithState(OutputMode.Append(),
        GroupStateTimeout.NoTimeout)(step)
  }
}
