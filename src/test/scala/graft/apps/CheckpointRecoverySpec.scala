package graft.apps

import graft.TestSpark
import org.apache.spark.sql.streaming.Trigger
import org.scalatest.funsuite.AnyFunSuite
import java.nio.file.{Files, Paths}

/** Exactly-once across restart (the reference's checkpointing is
  * commented out everywhere; here it is mandatory and TESTED): run the
  * traffic app over a replayable file source, stop it, append more
  * input, restart with the SAME checkpoint — the output must contain
  * every finalized window exactly once: no loss, no duplicates. */
class CheckpointRecoverySpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private val T0 = 1651234560000L
  private def line(mid: String, pageId: String, last: String, ts: Long): String = {
    val lastJson = if (last == null) "null" else "\"" + last + "\""
    s"""{"common":{"ar":"110000","ch":"xiaomi","is_new":"1","mid":"$mid","vc":"v1"},""" +
      s""""page":{"during_time":1000,"page_id":"$pageId","last_page_id":$lastJson},"ts":$ts}"""
  }

  test("restart from checkpoint: no window lost, none duplicated") {
    val root = Files.createTempDirectory("ckpt_recovery").toString
    val in = s"$root/in"; val out = s"$root/out"; val ckpt = s"$root/ckpt"
    Files.createDirectories(Paths.get(in))
    def writeFile(name: String, lines: Seq[String]): Unit =
      Files.write(Paths.get(s"$in/$name"), lines.mkString("\n").getBytes("UTF-8"))

    def start() = TrafficApp.run(
      spark.readStream.format("text").load(in).toDF("value"),
      out, ckpt, trigger = Trigger.ProcessingTime(0))

    // phase 1: two events in window [T0, T0+10s), then a watermark push
    writeFile("f1.json", Seq(
      line("m1", "home", null, T0 + 1000),
      line("m1", "cart", "home", T0 + 2000),
      line("m2", "home", null, T0 + 60000)))
    val q1 = start()
    try q1.processAllAvailable() finally q1.stop()

    // phase 2: RESTART with the same checkpoint, push the second window
    // past the watermark with a third batch of input
    writeFile("f2.json", Seq(
      line("m2", "detail", "home", T0 + 61000),
      line("m3", "home", null, T0 + 300000)))
    val q2 = start()
    try q2.processAllAvailable() finally q2.stop()

    val rows = spark.read.parquet(out)
      .select("stt", "pv_ct", "uv_ct").collect()
      .map(r => (r.getTimestamp(0).getTime, r.getLong(1), r.getLong(2))).toSeq
    // exactly-once: every stt window appears once
    assert(rows.map(_._1).distinct.length == rows.length,
      s"duplicate windows after restart: $rows")
    // the first window (2 events) survived the restart, emitted once
    assert(rows.contains((T0, 2L, 1L)), s"lost window 1: $rows")
    // the second window (2 events for m2) was finalized after restart
    assert(rows.exists(r => r._1 == T0 + 60000 && r._2 == 2L), s"rows: $rows")
  }
}
