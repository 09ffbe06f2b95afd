package graft.streaming

import graft.TestSpark
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.OutputMode
import org.scalatest.funsuite.AnyFunSuite

/** U3 — EarlyFire.windowCounts must reproduce the reference trigger's
  * firing rule (MyTrigger.java): watermark-at-window-end fire, OR a
  * +grace early fire when the pipeline clock moves past the key's last
  * element while the window end is still unreached; early-fired windows
  * re-arm only on a new element. RocksDB state store required. */
class EarlyFireSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  // window 10 s, grace 5 s, watermark delay 0 s (withMsWatermark
  // default) — so the watermark equals the max event ts seen, and any
  // re-arm element must sit at or above it
  private def replay(batches: Seq[Seq[KeyedEvent]]): Seq[WindowCount] = {
    implicit val sqlCtx = spark.sqlContext
    val key = "spark.sql.streaming.stateStore.providerClass"
    val prev = spark.conf.getOption(key)
    spark.conf.set(key,
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    val name = s"early_fire_${batches.hashCode.abs}"
    try {
      val mem = MemoryStream[KeyedEvent]
      val q = EarlyFire.windowCounts(Dedup.withMsWatermark(mem.toDS()))
        .writeStream.format("memory").queryName(name)
        .outputMode(OutputMode.Append).start()
      try {
        batches.foreach { b => mem.addData(b: _*); q.processAllAvailable() }
        spark.table(name).as[WindowCount].collect().toSeq
          .filter(_.key != "tick")
      } finally q.stop()
    } finally prev match {
      case Some(v) => spark.conf.set(key, v)
      case None => spark.conf.unset(key)
    }
  }

  private def ev(k: String, ts: Long) = KeyedEvent(k, ts, "p")

  test("watermark fire: window closes once with the full count") {
    // a's last element at 9 s -> grace deadline 14 s > window end 10 s,
    // so the single registered timer IS the window end (no early fire);
    // ticks push the watermark past 10 s
    val got = replay(Seq(
      Seq(ev("a", 1000), ev("a", 9000)),
      Seq(ev("tick", 13000)),
      Seq(ev("tick", 25000))))
    assert(got == Seq(WindowCount("a", 0, 2, closed = true)))
  }

  test("early fire at +grace, then re-arm and final fire (MyTrigger race)") {
    // a stops at 1 s (grace deadline 6 s < window end 10 s); the tick
    // at 9 s advances the watermark to 9 s >= 6 s -> EARLY fire cnt=1.
    // A later element at 9.5 s (>= watermark, still in the window)
    // re-arms with deadline min(10 s, 14.5 s) = the window end; the
    // final tick closes the window with cnt=2.
    val got = replay(Seq(
      Seq(ev("a", 1000)),
      Seq(ev("tick", 9000)),
      Seq(ev("a", 9500)),
      Seq(ev("tick", 15000)),
      Seq(ev("tick", 30000))))
    assert(got.toSet == Set(
      WindowCount("a", 0, 1, closed = false),
      WindowCount("a", 0, 2, closed = true)))
  }

  test("early-fired window does NOT re-fire at window end without re-arm") {
    // MyTrigger's onProcessingTime deletes the event-time timer: after
    // the early fire, pushing the watermark past the window end emits
    // nothing more for c
    val got = replay(Seq(
      Seq(ev("c", 1000)),
      Seq(ev("tick", 9000)),
      Seq(ev("tick", 15000)),
      Seq(ev("tick", 30000))))
    assert(got == Seq(WindowCount("c", 0, 1, closed = false)))
  }

  test("stalled early-fired window is purged (bounded state, no emission)") {
    // A key that early-fires and never re-arms must not hold state
    // forever: the silent cleanup timer at windowEnd purges it (Flink
    // WindowOperator clearAllState). Observable: once the watermark is
    // past c's window end, the state store holds EXACTLY the rows of a
    // ticks-only run — c contributes zero residual rows — and c emits
    // nothing beyond the single early fire.
    def finalStateRows(batches: Seq[Seq[KeyedEvent]]): (Long, Seq[WindowCount]) = {
      implicit val sqlCtx = spark.sqlContext
      val key = "spark.sql.streaming.stateStore.providerClass"
      val prev = spark.conf.getOption(key)
      spark.conf.set(key,
        "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
      val name = s"early_fire_gc_${batches.hashCode.abs}"
      try {
        val mem = MemoryStream[KeyedEvent]
        val q = EarlyFire.windowCounts(Dedup.withMsWatermark(mem.toDS()))
          .writeStream.format("memory").queryName(name)
          .outputMode(OutputMode.Append).start()
        try {
          batches.foreach { b => mem.addData(b: _*); q.processAllAvailable() }
          val rows = q.recentProgress.filter(_.stateOperators.nonEmpty)
            .maxBy(_.batchId).stateOperators.map(_.numRowsTotal).sum
          (rows, spark.table(name).as[WindowCount].collect().toSeq
            .filter(_.key != "tick"))
        } finally q.stop()
      } finally prev match {
        case Some(v) => spark.conf.set(key, v)
        case None => spark.conf.unset(key)
      }
    }
    val ticks = Seq(Seq(ev("tick", 9000)), Seq(ev("tick", 15000)),
      Seq(ev("tick", 30000)))
    val (withC, got) = finalStateRows(Seq(ev("c", 1000)) +: ticks)
    val (baseline, _) = finalStateRows(Seq.empty[KeyedEvent] +: ticks)
    assert(got == Seq(WindowCount("c", 0, 1, closed = false)))
    assert(withC == baseline,
      s"residual state for stalled key c: $withC rows vs ticks-only $baseline")
  }

  test("independent keys and windows fire independently") {
    // a[0,10s) armed at 6 s (grace), b[0,10s) at 10 s (end),
    // a[10s,20s) at 17 s (grace). The 13 s tick expires a's 6 s grace
    // timer with the watermark ALREADY past the window end — the
    // event-time fire wins the race (closed, not early), like Flink
    // processing both due timers through onEventTime. The 30 s tick
    // closes a's second window the same way (17 s grace vs end 20 s).
    val got = replay(Seq(
      Seq(ev("a", 1000), ev("b", 9000), ev("a", 12000)),
      Seq(ev("tick", 13000)),
      Seq(ev("tick", 30000))))
    assert(got.toSet == Set(
      WindowCount("a", 0, 1, closed = true),
      WindowCount("b", 0, 1, closed = true),
      WindowCount("a", 10000, 1, closed = true)))
  }
}
