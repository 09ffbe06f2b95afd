package graft.streaming

import graft.TestSpark
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.OutputMode
import org.scalatest.funsuite.AnyFunSuite

/** Dedup.keepLatestTws (the Spark 4 transformWithState port of
  * keepLatest) must emit exactly what the flatMapGroupsWithState
  * implementation emits on the same replay. transformWithState requires
  * the RocksDB state store provider. */
class TransformWithStateSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def ev(key: String, ts: Long, p: String) = KeyedEvent(key, ts, p)

  private def replay(run: org.apache.spark.sql.Dataset[KeyedEvent]
      => org.apache.spark.sql.Dataset[KeyedEvent], name: String)
      : Map[String, (Long, String)] = {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[KeyedEvent]
    val q = run(Dedup.withMsWatermark(mem.toDS()))
      .writeStream.format("memory").queryName(name)
      .outputMode(OutputMode.Append).start()
    try {
      mem.addData(ev("a", 1000, "old"), ev("a", 9000, "new"), ev("b", 500, "only"))
      q.processAllAvailable()
      mem.addData(ev("zz", 3600000, "tick"))
      q.processAllAvailable()
      mem.addData(ev("zz", 7200000, "tick2"))
      q.processAllAvailable()
      spark.table(name).as[KeyedEvent].collect()
        .filter(_.key != "zz").map(e => e.key -> (e.ts, e.payload)).toMap
    } finally q.stop()
  }

  /** Replay the sf0.001 click/purchase funnel events through a streaming
    * funnel implementation and collect one outcome per key. */
  private def funnelReplay(run: org.apache.spark.sql.Dataset[FunnelEvent]
      => org.apache.spark.sql.Dataset[FunnelOutcome], name: String)
      : Map[String, (Long, Boolean, Int)] = {
    import org.apache.spark.sql.functions._
    implicit val sqlCtx = spark.sqlContext
    val HourMs = 3600L * 1000
    val sorted = graft.Tables.events(spark, "/root/testdata/sf0.001")
      .filter(col("event_type").isin("click", "purchase"))
      .select(col("user_id").cast("string").as("key"),
        expr("unix_micros(ts) div 1000").as("ts"),
        when(col("event_type") === "click", 0).otherwise(1).as("step"))
      .as[FunnelEvent].collect().toSeq.sortBy(e => (e.ts, e.step))
    val mem = MemoryStream[FunnelEvent]
    // tombstone outlives the compressed replay horizon (NOTES_r2 #3)
    val q = run(Dedup.withMsWatermark(mem.toDS()))
      .writeStream.format("memory").queryName(name)
      .outputMode(OutputMode.Append).start()
    try {
      sorted.grouped(math.max(1, sorted.size / 5)).foreach { chunk =>
        mem.addData(chunk: _*); q.processAllAvailable()
      }
      // far-future ticks advance the watermark so pending gap timers fire
      mem.addData(FunnelEvent("tick", sorted.last.ts + 30L * 24 * HourMs, 0))
      q.processAllAvailable()
      mem.addData(FunnelEvent("tick", sorted.last.ts + 31L * 24 * HourMs, 1))
      q.processAllAvailable()
      spark.table(name).as[FunnelOutcome].collect()
        .filter(_.key != "tick")
        .map(o => o.key -> (o.anchorTs, o.completed, o.stepsReached)).toMap
    } finally q.stop()
  }

  test("transformWithState funnel ≡ flatMapGroupsWithState funnel on replay") {
    val HourMs = 3600L * 1000
    val year = 365L * 24 * HourMs
    val key = "spark.sql.streaming.stateStore.providerClass"
    val prev = spark.conf.getOption(key)
    spark.conf.set(key,
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      val tws = funnelReplay(
        Sessionize.funnelTws(_, 2, Seq(HourMs), tombstoneMs = year), "funnel_tws")
      val fmg = funnelReplay(
        Sessionize.funnel(_, 2, Seq(HourMs), tombstoneMs = year), "funnel_fmg")
      assert(tws.nonEmpty)
      assert(tws == fmg)
    } finally prev match {
      case Some(v) => spark.conf.set(key, v)
      case None => spark.conf.unset(key)
    }
  }

  test("transformWithState keepLatest ≡ flatMapGroupsWithState keepLatest") {
    val key = "spark.sql.streaming.stateStore.providerClass"
    val prev = spark.conf.getOption(key)
    spark.conf.set(key,
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      val tws = replay(Dedup.keepLatestTws(_, 2000), "tws_out")
      val fmg = replay(Dedup.keepLatest(_, 2000), "fmg_out")
      assert(tws == fmg)
      assert(tws == Map("a" -> (9000L, "new"), "b" -> (500L, "only")))
    } finally prev match {
      case Some(v) => spark.conf.set(key, v)
      case None => spark.conf.unset(key)
    }
  }
}
