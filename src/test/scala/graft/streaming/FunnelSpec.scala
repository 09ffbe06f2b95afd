package graft.streaming

import graft.TestSpark
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode
import org.scalatest.funsuite.AnyFunSuite

/** Sessionize.funnel — the N-step CEP generalization. Verified three
  * ways: against an independent SQL formulation of the q58 conversion
  * funnel on real testdata (for 2 steps, first-match semantics ≡
  * exists-in-window semantics), streaming replay ≡ batch on the same
  * events, and hand-computed 3-step cases covering both failure paths
  * and the greedy (CEP first-match) step choice. */
class FunnelSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private val D = "/root/testdata/sf0.001"
  private val HourMs = 3600L * 1000

  /** click/purchase events at ms precision (truncating µs→ms keeps both
    * formulations on identical timestamps). */
  private lazy val funnelEvents: Seq[FunnelEvent] =
    graft.Tables.events(spark, D)
      .filter(col("event_type").isin("click", "purchase"))
      .select(col("user_id").cast("string").as("key"),
        expr("unix_micros(ts) div 1000").as("ts"),
        when(col("event_type") === "click", 0).otherwise(1).as("step"))
      .as[FunnelEvent].collect().toSeq

  /** q58's definitional semantics, stated independently of the operator:
    * first click per user; converted iff ANY purchase lies in
    * [click, click + 1 h]. */
  private lazy val expectedOutcomes: Map[String, (Long, Boolean)] = {
    val byUser = funnelEvents.groupBy(_.key)
    byUser.flatMap { case (k, evs) =>
      val clicks = evs.filter(_.step == 0).map(_.ts)
      if (clicks.isEmpty) None
      else {
        val c = clicks.min
        val conv = evs.exists(e =>
          e.step == 1 && e.ts >= c && e.ts <= c + HourMs)
        Some(k -> (c, conv))
      }
    }
  }

  test("batch funnel(2) ≡ the q58 SQL funnel semantics on sf0.001 events") {
    val got = Sessionize.funnel(funnelEvents.toDS(), 2, Seq(HourMs))
      .collect().map(o => o.key -> (o.anchorTs, o.completed)).toMap
    assert(got.size == expectedOutcomes.size)
    assert(got == expectedOutcomes)
    assert(got.nonEmpty)
  }

  test("streaming replay of funnel(2) ≡ batch outcomes (q58 property)") {
    implicit val sqlCtx = spark.sqlContext
    val sorted = funnelEvents.sortBy(e => (e.ts, e.step))
    val mem = MemoryStream[FunnelEvent]
    // tombstone must outlive the replayed horizon (~30 days compressed
    // into seconds) or reaped keys would re-anchor — batch's global
    // first-anchor semantics holds within the tombstone TTL by design
    val q = Sessionize.funnel(
        Dedup.withMsWatermark(mem.toDS()), 2, Seq(HourMs),
        tombstoneMs = 365L * 24 * HourMs)
      .writeStream.format("memory").queryName("funnel_out")
      .outputMode(OutputMode.Append).start()
    try {
      sorted.grouped(math.max(1, sorted.size / 5)).foreach { chunk =>
        mem.addData(chunk: _*); q.processAllAvailable()
      }
      // a far-future tick advances the watermark so every pending gap
      // timeout fires (its own anchored key emits nothing before stop)
      mem.addData(FunnelEvent("tick", sorted.last.ts + 30L * 24 * HourMs, 0))
      q.processAllAvailable()
      mem.addData(FunnelEvent("tick", sorted.last.ts + 31L * 24 * HourMs, 1))
      q.processAllAvailable()
      val rows = spark.table("funnel_out").as[FunnelOutcome].collect()
        .filter(_.key != "tick")
      assert(rows.length == rows.map(_.key).distinct.length,
        "exactly one outcome per key")
      val got = rows.map(o => o.key -> (o.anchorTs, o.completed)).toMap
      assert(got == expectedOutcomes)
    } finally q.stop()
  }

  test("3-step funnel: completion, gap expiry, and end-of-input expiry") {
    def ev(k: String, ts: Long, s: Int) = FunnelEvent(k, ts, s)
    val events = Seq(
      // complete: 0@0 → 1@5 → 2@12 (gaps 5, 7 within 10/10)
      ev("ok", 0, 0), ev("ok", 5, 1), ev("ok", 12, 2),
      // gap expiry: step 2 arrives 15 after step 1 (limit 10)
      ev("gap", 0, 0), ev("gap", 5, 1), ev("gap", 20, 2),
      // end-of-input expiry: never sees step 2
      ev("tail", 0, 0), ev("tail", 5, 1),
      // greedy first-match: second step-1 candidate at 9 is ignored once
      // 1@2 is chosen, so 2@15 (13 after the chosen one) fails even
      // though the 9→15 chain would fit — documented CEP semantics
      ev("greedy", 0, 0), ev("greedy", 2, 1), ev("greedy", 9, 1),
      ev("greedy", 15, 2),
      // no anchor: step-1/2 events alone emit nothing
      ev("noanchor", 3, 1), ev("noanchor", 6, 2))
    val got = Sessionize.funnel(events.toDS(), 3, Seq(10L, 10L))
      .collect().map(o => o.key -> o).toMap
    assert(got.keySet == Set("ok", "gap", "tail", "greedy"))
    assert(got("ok").completed && got("ok").lastStepTs == 12)
    assert(!got("gap").completed && got("gap").stepsReached == 2)
    assert(!got("tail").completed && got("tail").stepsReached == 2)
    assert(!got("greedy").completed && got("greedy").stepsReached == 2)
    assert(got.values.forall(_.anchorTs == 0))
  }

  test("streaming funnel tolerates on-time out-of-order arrivals " +
      "(expiry only via the watermark timer, never arrival order)") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[FunnelEvent]
    val in = {
      val df = mem.toDS().toDF()
        .withColumn("event_time",
          (org.apache.spark.sql.functions.col("ts") / 1000).cast("timestamp"))
        .withWatermark("event_time", "5 seconds")
      df.as[FunnelEvent]
    }
    val q = Sessionize.funnel(in, 2, Seq(60000L))
      .writeStream.format("memory").queryName("funnel_ooo")
      .outputMode(OutputMode.Append).start()
    try {
      // ts > 0: an event AT the initial watermark (0) would be dropped
      val T = 100000L
      mem.addData(FunnelEvent("u", T, 0)) // anchor; deadline = T+60000
      q.processAllAvailable()
      // a later-stamped SAME-KEY event arrives first: it is past the gap
      // (61 s after the anchor), but the watermark is only T+56000 —
      // arrival order must NOT fail the pattern...
      mem.addData(FunnelEvent("u", T + 61000, 1))
      q.processAllAvailable()
      // ...because this on-time (>= watermark T+56000) in-window step-1
      // event still arrives and must complete the funnel, as batch would
      mem.addData(FunnelEvent("u", T + 59500, 1))
      q.processAllAvailable()
      mem.addData(FunnelEvent("y", T + 500000, 0)) // flush timers
      q.processAllAvailable()
      mem.addData(FunnelEvent("y", T + 600000, 1))
      q.processAllAvailable()
      val u = spark.table("funnel_ooo").as[FunnelOutcome].collect()
        .filter(_.key == "u")
      assert(u.length == 1 && u.head.completed,
        s"out-of-order on-time completion lost: ${u.toSeq}")
    } finally q.stop()
  }

  test("randomized 2-step funnel: outcome ⇔ brute-force chain existence") {
    // for 2 steps, greedy first-match ≡ "exists a step-1 event in the
    // window after the first anchor" (the first step-1 at or after the
    // anchor is in-window iff any is) — check on seeded random replays
    val rnd = new scala.util.Random(42)
    for (_ <- 1 to 20) {
      val events = (1 to 30).map { _ =>
        FunnelEvent(s"k${rnd.nextInt(5)}", rnd.nextInt(100).toLong, rnd.nextInt(2))
      }
      val got = Sessionize.funnel(events.toDS(), 2, Seq(10L))
        .collect().map(o => o.key -> o).toMap
      events.groupBy(_.key).foreach { case (k, evs) =>
        val zeros = evs.filter(_.step == 0).map(_.ts)
        if (zeros.isEmpty) assert(!got.contains(k))
        else {
          val anchor = zeros.min
          val expect = evs.exists(e =>
            e.step == 1 && e.ts >= anchor && e.ts - anchor <= 10)
          assert(got(k).anchorTs == anchor)
          assert(got(k).completed == expect,
            s"key $k events ${evs.sortBy(e => (e.ts, e.step))}")
        }
      }
    }
  }

  test("bounce detection remains the 2-event strict-next special case") {
    // regression guard: the funnel generalization must not change
    // detectBounces (entry→entry within 10 s = bounce; navigation = not)
    val pages = Seq(
      PageEvent("m1", "home", None, "1", 1000),
      PageEvent("m1", "home", None, "1", 5000), // entry→entry: bounce @1000
      PageEvent("m1", "detail", Some("home"), "1", 8000), // navigated
      PageEvent("m2", "home", None, "1", 1000)) // trailing: bounce
    val got = Sessionize.detectBounces(pages.toDS())
      .collect().map(b => (b.mid, b.ts)).toSet
    assert(got == Set(("m1", 1000L), ("m2", 1000L)))
  }
}
