package graft.apps

import graft.TestSpark
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class TrafficPipelineSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private val Day = 24L * 3600 * 1000
  // epoch-aligned base so all events of a burst share one 10 s window
  private val T0 = 1651234560000L

  private def line(mid: String, pageId: String, last: String, ts: Long,
      dur: Long = 1000): String = {
    val lastJson = if (last == null) "null" else "\"" + last + "\""
    s"""{"common":{"ar":"110000","ch":"xiaomi","is_new":"1","mid":"$mid","vc":"v1"},""" +
      s""""page":{"during_time":$dur,"page_id":"$pageId","last_page_id":$lastJson},"ts":$ts}"""
  }

  test("traffic spine: parse -> split -> UV dedup -> union -> 10s window") {
    val lines = Seq(
      line("m1", "home", null, T0 + 1000), // m1 session entry (sv, uv day 1)
      line("m1", "good_list", "home", T0 + 2000),
      line("m2", "home", null, T0 + 3000), // m2 entry (sv, uv day 1)
      line("m1", "home", null, T0 + Day + 1000), // m1 next day (uv day 2)
      "garbage {").toDF("value")
    val win = TrafficPipeline.channelWindow(lines)
      .orderBy("stt")
      .collect()
    assert(win.length == 2) // one window per day burst
    val day1 = win.head
    assert(day1.getAs[Long]("pv_ct") == 3L)
    assert(day1.getAs[Long]("sv_ct") == 2L) // two session entries
    assert(day1.getAs[Long]("uv_ct") == 2L) // m1 + m2 first-of-day
    assert(day1.getAs[Long]("dur_sum") == 3000L)
    val day2 = win.last
    assert(day2.getAs[Long]("pv_ct") == 1L)
    assert(day2.getAs[Long]("uv_ct") == 1L) // m1 again on day 2
  }

  test("traffic spine (streaming) finalizes windows under watermark") {
    implicit val ctx = spark.sqlContext
    // single-query form of the two-job topology — see TrafficPipeline scaladoc
    spark.conf.set(
      "spark.sql.streaming.statefulOperator.checkCorrectness.enabled", "false")
    val mem = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[String]
    val q = TrafficPipeline.channelWindow(mem.toDF().toDF("value"),
        watermark = Some("2 seconds"))
      .writeStream.format("memory").queryName("traffic_win")
      .outputMode("append").start()
    try {
      mem.addData(line("m1", "home", null, T0 + 1000))
      mem.addData(line("m1", "cart", "home", T0 + 2000))
      q.processAllAvailable()
      // close the window: event far past T0+10s advances the watermark
      mem.addData(line("m2", "home", null, T0 + 60000))
      q.processAllAvailable()
      mem.addData(line("m2", "cart", "home", T0 + 120000))
      q.processAllAvailable()
      val rows = spark.table("traffic_win").collect()
      assert(rows.length >= 1)
      val w1 = rows.minBy(_.getAs[java.sql.Timestamp]("stt").getTime)
      assert(w1.getAs[Long]("pv_ct") == 2L)
      assert(w1.getAs[Long]("uv_ct") == 1L)
      assert(w1.getAs[Long]("sv_ct") == 1L)
    } finally q.stop()
  }
}

/** Deployable-app form: stream → windows → dt-partitioned parquet. */
class TrafficAppSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private val T0 = 1651234560000L
  private def line(mid: String, pageId: String, last: String, ts: Long): String = {
    val lastJson = if (last == null) "null" else "\"" + last + "\""
    s"""{"common":{"ar":"110000","ch":"xiaomi","is_new":"1","mid":"$mid","vc":"v1"},""" +
      s""""page":{"during_time":1000,"page_id":"$pageId","last_page_id":$lastJson},"ts":$ts}"""
  }

  test("TrafficApp writes finalized windows to dt-partitioned parquet") {
    implicit val ctx = spark.sqlContext
    val out = java.nio.file.Files.createTempDirectory("dws_traffic").toString
    val ckpt = java.nio.file.Files.createTempDirectory("ckpt_traffic").toString
    val mem = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[String]
    val q = TrafficApp.run(mem.toDF().toDF("value"), out, ckpt,
      trigger = org.apache.spark.sql.streaming.Trigger.ProcessingTime(0))
    try {
      mem.addData(line("m1", "home", null, T0 + 1000))
      mem.addData(line("m1", "cart", "home", T0 + 2000))
      q.processAllAvailable()
      mem.addData(line("m2", "home", null, T0 + 60000)) // advance watermark
      q.processAllAvailable()
      mem.addData(line("m2", "cart", "home", T0 + 120000))
      q.processAllAvailable()
      val written = spark.read.parquet(out)
      assert(written.columns.contains("dt")) // partition column present
      val w1 = written.orderBy("stt").collect().head
      assert(w1.getAs[Long]("pv_ct") == 2L)
      assert(w1.getAs[Long]("uv_ct") == 1L)
      assert(w1.getAs[Int]("dt") == 20220429)
      // close the production loop: the serving layer reads the streamed
      // dws table directly (dt partition pruning + re-aggregation)
      val stats = graft.serving.ServingQueries
        .trafficChannelStats(written, 20220429).collect()
      assert(stats.length == 1 && stats.head.getAs[String]("ch") == "xiaomi")
      assert(stats.head.getAs[Long]("uv_ct") >= 1L)
      val uv = graft.serving.ServingQueries
        .sugarChannelUv(written, 20220429).head()
      assert(uv.getAs[String]("ch") == "xiaomi" && uv.getAs[Long]("uv_ct") >= 1L)
    } finally q.stop()
  }
}
