package graft.streaming

import java.time.{Instant, ZoneOffset}
import java.time.format.DateTimeFormatter

import org.apache.spark.sql.{DataFrame, Dataset, Encoder}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Dedup operators — the Spark re-expression of the reference's keyed
  * ValueState dedup patterns (SURVEY.md §2.5 A5/A7/A8). Each works on both
  * batch and streaming Datasets.
  *
  * All streaming state here is bounded by EVENT-TIME timeouts (watermark
  * driven) rather than wall-clock timers: deterministic under replay, and
  * crucially it avoids the processing-time-timeout rebatching loop (a
  * query with ProcessingTimeTimeout re-runs micro-batches continuously
  * because the engine must re-check timers — pure overhead at scale).
  * The reference's TTLs (1 day daily-dedup, 5 s / 2 s upsert-dedup) map
  * to event-time quiesce windows below.
  *
  * Scale: state lives in the state store (RocksDB provider in prod conf);
  * keys hash-partition across executors.
  */
object Dedup {

  private val DateFmt = DateTimeFormatter.ofPattern("yyyy-MM-dd").withZone(ZoneOffset.UTC)
  private[streaming] def dateOf(tsMs: Long): String =
    DateFmt.format(Instant.ofEpochMilli(tsMs))

  /** Attach an event-time watermark derived from an epoch-ms long column —
    * prerequisite for the event-time-timeout operators below. */
  def withMsWatermark[T](ds: Dataset[T], tsCol: String = "ts",
      delay: String = "0 seconds"): Dataset[T] = {
    implicit val enc: Encoder[T] = ds.encoder
    ds.withColumn("event_time", (col(tsCol) / 1000).cast("timestamp"))
      .withWatermark("event_time", delay)
      .as[T]
  }

  /** A7: keep-FIRST per key (ref DwsTradePaymentSucWindow.java:74-102,
    * 5 s TTL ValueState marker). Streaming: dropDuplicatesWithinWatermark
    * keeps the first ARRIVAL per key AND evicts the key's marker once the
    * watermark passes — bounded state, matching the reference's 5 s TTL
    * (a duplicate arriving after the TTL re-emits there too). Plain
    * dropDuplicates(keys) would never evict (the event-time column is not
    * part of the dedup key), growing state forever. Batch: arrival order
    * is meaningless and dropDuplicates would keep an arbitrary row, so
    * the earliest (tsCol, remaining columns) row is selected
    * deterministically. */
  def keepFirst(df: DataFrame, keyCols: Seq[String], tsCol: String,
      watermark: String = "5 seconds"): DataFrame =
    if (df.isStreaming)
      df.withWatermark(tsCol, watermark).dropDuplicatesWithinWatermark(keyCols)
    else {
      // tiebreak on orderable columns only (maps/structs of maps are not
      // orderable and would fail analysis); nulls last so a null ts never
      // beats a real timestamp
      val orderable = df.schema.fields.filter { f =>
        org.apache.spark.sql.catalyst.expressions.RowOrdering
          .isOrderable(f.dataType) &&
          !keyCols.contains(f.name) && f.name != tsCol
      }.map(f => col(f.name))
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(keyCols.map(col): _*)
        .orderBy(col(tsCol).asc_nulls_last +: orderable.toSeq.map(_.asc_nulls_last): _*)
      df.withColumn("_rn", org.apache.spark.sql.functions.row_number().over(w))
        .filter(col("_rn") === 1).drop("_rn")
    }

  /** A8: keep-LATEST per key (ref OrderDetailFilterFunction.java:42-81 —
    * pick the richest row among retraction replays). Buffers the newest
    * row per key; emits once the key is quiet for `quiesceMs` of EVENT
    * time (the reference's 2 s wall-clock timer, made deterministic).
    * Streaming input must carry a watermark ([[withMsWatermark]]).
    * Batch mode: emits the max-ts row per key directly. */
  def keepLatest(ds: Dataset[KeyedEvent], quiesceMs: Long = 2000)
      : Dataset[KeyedEvent] = {
    import ds.sparkSession.implicits._
    val streaming = ds.isStreaming // capture OUTSIDE closures: plan is driver-only
    ds.groupByKey(_.key)
      .flatMapGroupsWithState[KeyedEvent, KeyedEvent](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (_, events, state: GroupState[KeyedEvent]) =>
          if (state.hasTimedOut) {
            val out = state.getOption.iterator
            state.remove()
            out
          } else {
            val newest = (events ++ state.getOption.iterator)
              .maxBy(e => (e.ts, e.payload))
            if (streaming) {
              state.update(newest)
              state.setTimeoutTimestamp(
                math.max(newest.ts + quiesceMs, state.getCurrentWatermarkMs + 1))
              Iterator.empty
            } else Iterator.single(newest) // batch: input is complete
          }
      }
  }

  /** [[keepLatest]] on the NEW Spark 4 `transformWithState` API
    * (StatefulProcessor + named ValueStates + explicit event-time
    * timers) — the forward path for stateful operators: typed state
    * handles, multiple states per key, timer add/delete instead of the
    * single flatMapGroupsWithState timeout slot. Semantics are identical
    * to keepLatest (TransformWithStateSpec proves output equivalence on
    * the same replay); requires the RocksDB state store provider.
    * Timers ACCUMULATE on this API (unlike setTimeoutTimestamp, which
    * replaces), so the previous deadline is tracked and deleted before
    * registering the new one — otherwise an early timer fires while the
    * key is still active and emits prematurely. */
  class KeepLatestProcessor(quiesceMs: Long)
    extends org.apache.spark.sql.streaming.StatefulProcessor[String, KeyedEvent, KeyedEvent] {
    import org.apache.spark.sql.streaming.{TimeMode, TTLConfig, TimerValues, ExpiredTimerInfo}
    import org.apache.spark.sql.{Encoders, streaming}

    @transient private var latest: streaming.ValueState[KeyedEvent] = _
    @transient private var deadline: streaming.ValueState[Long] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit = {
      latest = getHandle.getValueState[KeyedEvent]("latest",
        Encoders.product[KeyedEvent], TTLConfig.NONE)
      deadline = getHandle.getValueState[Long]("deadline",
        Encoders.scalaLong, TTLConfig.NONE)
    }

    override def handleInputRows(key: String, rows: Iterator[KeyedEvent],
        tv: TimerValues): Iterator[KeyedEvent] = {
      val newest = (rows ++
        (if (latest.exists()) Iterator.single(latest.get()) else Iterator.empty))
        .maxBy(e => (e.ts, e.payload))
      latest.update(newest)
      val dl = math.max(newest.ts + quiesceMs, tv.getCurrentWatermarkInMs + 1)
      if (deadline.exists()) getHandle.deleteTimer(deadline.get())
      getHandle.registerTimer(dl)
      deadline.update(dl)
      Iterator.empty
    }

    override def handleExpiredTimer(key: String, tv: TimerValues,
        info: ExpiredTimerInfo): Iterator[KeyedEvent] =
      if (latest.exists()) {
        val out = latest.get()
        latest.clear(); deadline.clear()
        Iterator.single(out)
      } else Iterator.empty
  }

  /** Streaming-only transformWithState flavor of [[keepLatest]]. */
  def keepLatestTws(ds: Dataset[KeyedEvent], quiesceMs: Long = 2000)
      : Dataset[KeyedEvent] = {
    import ds.sparkSession.implicits._
    import org.apache.spark.sql.streaming.TimeMode
    ds.groupByKey(_.key)
      .transformWithState(new KeepLatestProcessor(quiesceMs),
        TimeMode.EventTime(), OutputMode.Append)
  }

  /** Like [[dailyFirst]] but emits the FULL first event (the reference's
    * UV stream carries the whole log row forward —
    * DwdTrafficUniqueVisitorDetail.java:118). */
  def dailyFirstEvents(ds: Dataset[KeyedEvent]): Dataset[KeyedEvent] = {
    import ds.sparkSession.implicits._
    val streaming = ds.isStreaming
    ds.groupByKey(_.key)
      .flatMapGroupsWithState[String, KeyedEvent](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (_, events, state: GroupState[String]) =>
          if (state.hasTimedOut) { state.remove(); Iterator.empty }
          else {
            var lastDate = state.getOption.getOrElse("")
            var maxTs = 0L
            val out = events.toSeq.sortBy(e => (e.ts, e.payload)).flatMap { e =>
              maxTs = math.max(maxTs, e.ts)
              val dt = dateOf(e.ts)
              if (dt != lastDate) { lastDate = dt; Some(e) } else None
            }
            if (streaming) {
              state.update(lastDate)
              state.setTimeoutTimestamp(
                math.max(maxTs + 2L * 24 * 3600 * 1000,
                  state.getCurrentWatermarkMs + 1))
            }
            out.iterator
          }
      }
  }

  /** A5: daily-dedup ("independent visitor") — emit only the FIRST event
    * of each key per UTC day (ref DwdTrafficUniqueVisitorDetail
    * .java:60-109: ValueState[lastDate], 1-day TTL). State = last seen
    * date; reaped via event-time timeout ~2 days after the last write
    * (the reference's OnCreateAndWrite TTL analog).
    *
    * Ordering contract: like the reference's ValueState pattern, the
    * last-date comparison assumes PER-KEY in-order delivery — which the
    * reference gets implicitly from Kafka partitioning by mid, and this
    * operator preserves (each micro-batch is sorted by ts and batches
    * process sequentially, so a key-partitioned ordered source stays
    * ordered). Under genuine cross-batch event-time disorder it can
    * re-emit a day (exactly as the reference would); contrast
    * [[Sessionize.detectBounces]], whose reference (Flink CEP) buffers
    * to the watermark and whose port therefore does too. */
  def dailyFirst(ds: Dataset[KeyedEvent]): Dataset[DailyFirst] = {
    import ds.sparkSession.implicits._
    val streaming = ds.isStreaming
    ds.groupByKey(_.key)
      .flatMapGroupsWithState[String, DailyFirst](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (key, events, state: GroupState[String]) =>
          if (state.hasTimedOut) { state.remove(); Iterator.empty }
          else {
            var lastDate = state.getOption.getOrElse("")
            var maxTs = 0L
            val out = events.toSeq.sortBy(e => (e.ts, e.payload)).flatMap { e =>
              maxTs = math.max(maxTs, e.ts)
              val dt = dateOf(e.ts)
              if (dt != lastDate) {
                lastDate = dt
                Some(DailyFirst(key, dt, e.ts))
              } else None
            }
            if (streaming) {
              state.update(lastDate)
              state.setTimeoutTimestamp(
                math.max(maxTs + 2L * 24 * 3600 * 1000,
                  state.getCurrentWatermarkMs + 1))
            }
            out.iterator
          }
      }
  }
}
