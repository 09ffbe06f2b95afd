package graft.streaming

import graft.TestSpark
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.OutputMode
import org.scalatest.funsuite.AnyFunSuite

class StatefulOpsSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private val Day = 24L * 3600 * 1000
  private def ev(key: String, ts: Long, p: String = "x") = KeyedEvent(key, ts, p)

  // ---- Dedup.keepFirst (A7) ----
  test("keepFirst keeps one row per key (batch)") {
    val df = Seq(ev("a", 1), ev("a", 2), ev("b", 5)).toDF()
    assert(Dedup.keepFirst(df, Seq("key"), "ts").count() == 2)
  }

  test("keepFirst (streaming) suppresses in-TTL dups, evicts state at the " +
      "watermark so a post-TTL duplicate re-emits (5 s ValueState TTL analog)") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[KeyedEvent]
    // no pre-applied watermark: keepFirst owns it (a second withWatermark
    // on the same column would be a disallowed redefinition)
    val in = mem.toDS().toDF()
      .withColumn("event_time",
        (org.apache.spark.sql.functions.col("ts") / 1000).cast("timestamp"))
    val q = Dedup.keepFirst(in, Seq("key"), "event_time", "5 seconds")
      .writeStream.format("memory").queryName("kf_out")
      .outputMode(OutputMode.Append).start()
    try {
      mem.addData(ev("a", 1000, "first"), ev("a", 2000, "dup"))
      q.processAllAvailable()
      assert(spark.table("kf_out").count() == 1) // in-TTL dup suppressed
      mem.addData(ev("zz", 3600000, "tick")) // watermark → ~1 h, evicts a
      q.processAllAvailable()
      mem.addData(ev("a", 7200000, "post-ttl"))
      q.processAllAvailable()
      val as = spark.table("kf_out").as[KeyedEvent].collect()
        .filter(_.key == "a").map(_.payload).toSet
      assert(as == Set("first", "post-ttl")) // state was evicted, re-emits
    } finally q.stop()
  }

  // ---- Dedup.keepLatest (A8) ----
  test("keepLatest emits the max-ts row per key (batch)") {
    val ds = Seq(ev("a", 1, "old"), ev("a", 9, "new"), ev("b", 3, "only")).toDS()
    val got = Dedup.keepLatest(ds).collect().map(e => e.key -> e.payload).toMap
    assert(got == Map("a" -> "new", "b" -> "only"))
  }

  test("keepLatest (streaming) buffers until the key goes quiet in event time") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[KeyedEvent]
    val q = Dedup.keepLatest(Dedup.withMsWatermark(mem.toDS()), quiesceMs = 2000)
      .writeStream.format("memory").queryName("kl_out")
      .outputMode(OutputMode.Append).start()
    try {
      mem.addData(ev("a", 1000, "old"), ev("a", 9000, "new"))
      q.processAllAvailable()
      // nothing emitted yet — watermark hasn't passed ts+quiesce
      assert(spark.table("kl_out").count() == 0)
      mem.addData(ev("zz", 3600000, "tick")) // advances watermark to 1h
      q.processAllAvailable()
      mem.addData(ev("zz", 3601000, "tick2")) // next batch fires a's timeout
      q.processAllAvailable()
      val got = spark.table("kl_out").as[KeyedEvent].collect()
      assert(got.exists(e => e.key == "a" && e.payload == "new"))
      assert(!got.exists(e => e.key == "a" && e.payload == "old"))
    } finally q.stop()
  }

  // ---- Dedup.dailyFirst (A5) ----
  test("dailyFirst emits one row per key per day (batch)") {
    val ds = Seq(
      ev("u1", 1000), ev("u1", 2000), ev("u1", Day + 500),
      ev("u2", 3000)).toDS()
    val got = Dedup.dailyFirst(ds).collect()
    assert(got.length == 3)
    assert(got.count(_.key == "u1") == 2)
  }

  test("dailyFirst property: any same-day event multiset yields exactly 1 row per key") {
    val rnd = new scala.util.Random(42)
    (1 to 8).foreach { _ =>
      val tss = List.fill(1 + rnd.nextInt(20))(rnd.nextLong(Day))
      val ds = tss.map(t => ev("k", t)).toDS()
      assert(Dedup.dailyFirst(ds).collect().length == 1)
    }
  }

  test("dailyFirst (streaming) dedups across micro-batches") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[KeyedEvent]
    val q = Dedup.dailyFirst(Dedup.withMsWatermark(mem.toDS()))
      .writeStream.format("memory").queryName("df_out")
      .outputMode(OutputMode.Append).start()
    try {
      mem.addData(ev("u1", 1000))
      q.processAllAvailable()
      mem.addData(ev("u1", 2000)) // same day, later batch → no new row
      q.processAllAvailable()
      mem.addData(ev("u1", Day + 100)) // next day → new row
      q.processAllAvailable()
      assert(spark.table("df_out").count() == 2)
    } finally q.stop()
  }

  test("dailyFirst and keepLatest are invariant under repartitioning") {
    val rnd = new scala.util.Random(7)
    val events = (1 to 300).map(i =>
      ev(s"u${i % 17}", rnd.nextLong(3 * Day), s"p$i"))
    val base = events.toDS()
    val shuffled = events.reverse.toDS().repartition(13)
    def norm(rows: Array[DailyFirst]) = rows.map(r => (r.key, r.date, r.ts)).toSeq.sorted
    assert(norm(Dedup.dailyFirst(base).collect()) ==
      norm(Dedup.dailyFirst(shuffled).collect()))
    def normK(rows: Array[KeyedEvent]) = rows.map(r => (r.key, r.ts, r.payload)).toSeq.sorted
    assert(normK(Dedup.keepLatest(base).collect()) ==
      normK(Dedup.keepLatest(shuffled).collect()))
  }

  // ---- VisitorState.repairIsNew (P8) ----
  private def pe(mid: String, isNew: String, ts: Long,
      last: Option[String] = None) = PageEvent(mid, "home", last, isNew, ts)

  test("repairIsNew: is_new=1 on a later day is repaired to 0") {
    val ds = Seq(pe("m1", "1", 1000), pe("m1", "1", Day + 1000)).toDS()
    val got = VisitorState.repairIsNew(ds).collect().sortBy(_.ts)
    assert(got.map(_.isNew).toSeq == Seq("1", "0"))
  }

  test("repairIsNew: same-day repeats stay new; is_new=0 never flips") {
    val ds = Seq(pe("m1", "1", 1000), pe("m1", "1", 2000),
      pe("m2", "0", 1000), pe("m2", "1", Day + 1000)).toDS()
    val got = VisitorState.repairIsNew(ds).collect()
    assert(got.filter(_.mid == "m1").forall(_.isNew == "1"))
    // m2 was old before state existed → later is_new=1 must repair to 0
    assert(got.filter(e => e.mid == "m2" && e.ts > Day).forall(_.isNew == "0"))
  }

  test("repairIsNew (streaming) remembers first date across batches") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[PageEvent]
    val q = VisitorState.repairIsNew(mem.toDS())
      .writeStream.format("memory").queryName("rn_out")
      .outputMode(OutputMode.Append).start()
    try {
      mem.addData(pe("m1", "1", 1000))
      q.processAllAvailable()
      mem.addData(pe("m1", "1", Day + 1000))
      q.processAllAvailable()
      val got = spark.table("rn_out").as[PageEvent].collect().sortBy(_.ts)
      assert(got.map(_.isNew).toSeq == Seq("1", "0"))
    } finally q.stop()
  }

  // ---- VisitorState.classifyLogins (A6) ----
  test("classifyLogins: uu per day, back after >=8-day gap") {
    val ds = Seq(
      ev("u1", 1000), ev("u1", 2000), // day 0: one uu, no back
      ev("u1", 9 * Day + 1000), // 9-day gap → back
      ev("u1", 10 * Day + 1000) // 1-day gap → uu only
    ).toDS()
    val got = VisitorState.classifyLogins(ds).collect().sortBy(_.ts)
    assert(got.length == 3)
    assert(got.map(_.back).toSeq == Seq(false, true, false))
    assert(got.forall(_.uu))
  }

  // ---- Sessionize.detectBounces (CEP analog) ----
  private def entry(mid: String, ts: Long) = PageEvent(mid, "home", None, "0", ts)
  private def page(mid: String, ts: Long) =
    PageEvent(mid, "good_list", Some("home"), "0", ts)

  test("bounce: entry followed by entry within 10s") {
    val ds = Seq(entry("m1", 1000), entry("m1", 5000), page("m1", 6000)).toDS()
    val got = Sessionize.detectBounces(ds).collect()
    assert(got.map(_.ts).toSet == Set(1000L)) // first entry bounced; second navigated
  }

  test("bounce: entry with nothing after (end-of-input timeout)") {
    val ds = Seq(entry("m1", 1000)).toDS()
    assert(Sessionize.detectBounces(ds).collect().map(_.ts).toSeq == Seq(1000L))
  }

  test("no bounce: entry followed by navigation within 10s") {
    val ds = Seq(entry("m1", 1000), page("m1", 3000), entry("m1", 20000),
      page("m1", 21000)).toDS()
    // first entry navigated; second entry (20s) navigated too → only no-follow-up
    val got = Sessionize.detectBounces(ds).collect()
    assert(got.isEmpty)
  }

  test("bounce: next event beyond 10s window") {
    val ds = Seq(entry("m1", 1000), page("m1", 50000)).toDS()
    // page arrives 49s later → first entry timed out → bounce
    assert(Sessionize.detectBounces(ds).collect().map(_.ts).toSeq == Seq(1000L))
  }

  test("bounce (streaming) fires via event-time timeout") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[PageEvent]
    val withWm = mem.toDS()
      .withColumn("eventTime", ($"ts" / 1000).cast("timestamp"))
      .withWatermark("eventTime", "1 second")
      .as[PageEvent]
    val q = Sessionize.detectBounces(withWm)
      .writeStream.format("memory").queryName("bn_out")
      .outputMode(OutputMode.Append).start()
    try {
      mem.addData(entry("m1", 1000))
      q.processAllAvailable()
      assert(spark.table("bn_out").count() == 0) // window still open
      mem.addData(page("m2", 60000)) // advances watermark past 11s
      q.processAllAvailable()
      mem.addData(page("m2", 61000)) // next batch evaluates timeouts
      q.processAllAvailable()
      assert(spark.table("bn_out").as[Bounce].collect().map(_.ts).toSeq == Seq(1000L))
    } finally q.stop()
  }

  test("bounce (streaming) out-of-order on-time navigation cancels") {
    // the arrival order says "nothing followed the entry for 14 s" but
    // the EVENT order contains an on-time navigation at +2 s that
    // arrives one micro-batch later (inside the 30 s watermark delay).
    // Deciding on arrival would emit a false bounce for ts=1000; the
    // watermark-buffered machine must emit none for m1
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[PageEvent]
    val withWm = mem.toDS()
      .withColumn("eventTime", ($"ts" / 1000).cast("timestamp"))
      .withWatermark("eventTime", "30 seconds")
      .as[PageEvent]
    val q = Sessionize.detectBounces(withWm)
      .writeStream.format("memory").queryName("bn_ooo")
      .outputMode(OutputMode.Append).start()
    try {
      mem.addData(entry("m1", 1000), page("m1", 15000)) // gap > window on arrival
      q.processAllAvailable()
      mem.addData(page("m1", 3000)) // on-time (wm = -15s), strict-NEXT of the entry
      q.processAllAvailable()
      mem.addData(page("m2", 90000)) // watermark → 60 s, finalize everything
      q.processAllAvailable()
      mem.addData(page("m2", 91000)) // evaluate timers under the new watermark
      q.processAllAvailable()
      val got = spark.table("bn_ooo").as[Bounce].collect().filter(_.mid == "m1")
      assert(got.isEmpty,
        s"entry@1000 was navigated at +2s (arriving late); got ${got.toSeq}")
    } finally q.stop()
  }
}
