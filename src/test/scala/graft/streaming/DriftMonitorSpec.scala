package graft.streaming

import graft.TestSpark
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.OutputMode
import org.scalatest.funsuite.AnyFunSuite

/** DriftMonitor: the streaming q178. Chunked replay of the real event
  * stream — batch 1 freezes each key's reference, later batches emit
  * exactly the driver-computed binned-KS ppm; a shifted synthetic
  * batch drifts more than a replayed one.
  */
class DriftMonitorSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private lazy val obs: Seq[Observation] =
    graft.Tables.events(spark, "/root/testdata/sf0.001")
      .selectExpr("event_type", "value").collect()
      .map(r => Observation(r.getString(0), r.getDouble(1))).toSeq

  test("streamed readouts equal the driver-side binned statistic") {
    implicit val sqlCtx = spark.sqlContext
    val stream = MemoryStream[Observation]
    val query = DriftMonitor.monitor(stream.toDS())
      .writeStream.format("memory").queryName("drift")
      .outputMode(OutputMode.Append()).start()
    try {
      val chunks = obs.grouped(obs.size / 3 + 1).toSeq
      chunks.foreach { c => stream.addData(c); query.processAllAvailable() }
      val refs = chunks.head.groupBy(_.key)
        .view.mapValues(c => DriftMonitor.histogram(c.map(_.value))).toMap
      val expected = chunks.tail.zipWithIndex.flatMap { case (chunk, i) =>
        chunk.groupBy(_.key).toSeq.collect {
          case (k, rows) if refs.contains(k) =>
            val h = DriftMonitor.histogram(rows.map(_.value))
            (k, i + 2L) -> ((refs(k).sum, h.sum,
              DriftMonitor.ksPpm(refs(k), h)))
        }
      }.toMap
      val got = spark.table("drift").as[DriftReadout].collect()
        .map(r => (r.key, r.batchN) -> ((r.nRef, r.nBatch, r.ksPpm))).toMap
      assert(got == expected)
      assert(got.nonEmpty)
    } finally query.stop()
  }

  test("a location-shifted batch drifts more than a faithful replay") {
    val ref = DriftMonitor.histogram(obs.filter(_.key == "click").map(_.value))
    val faithful = DriftMonitor.histogram(
      obs.filter(_.key == "click").map(_.value))
    val shifted = DriftMonitor.histogram(
      obs.filter(_.key == "click").map(o => math.min(o.value + 200, 490)))
    assert(DriftMonitor.ksPpm(ref, faithful) == 0L)
    assert(DriftMonitor.ksPpm(ref, shifted) >
      DriftMonitor.ksPpm(ref, faithful))
  }
}
