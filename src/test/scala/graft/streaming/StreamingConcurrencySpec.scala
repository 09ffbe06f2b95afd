package graft.streaming

import graft.TestSpark
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.OutputMode
import org.scalatest.funsuite.AnyFunSuite

/** StreamingConcurrency ≡ batch q241 after replay (any chunking), with
  * monotone per-day lower bounds along the way. */
class StreamingConcurrencySpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  private val sf = "/root/testdata/sf0.001"
  import spark.implicits._

  private def events: Seq[ConcEvent] =
    graft.Tables.events(spark, sf)
      .selectExpr("unix_micros(ts) div 86400000000 AS day",
        "user_id", "unix_micros(ts) AS t").collect()
      .map(r => ConcEvent(r.getLong(0), r.getLong(1), r.getLong(2)))
      .toSeq

  private def batchExpected: Map[Long, (Long, Long)] =
    graft.queries.IntervalOps.maxConcurrency(spark, sf).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap

  test("chunked replay converges to the oracle-verified batch q241") {
    implicit val sqlCtx = spark.sqlContext
    val stream = MemoryStream[ConcEvent]
    val query = StreamingConcurrency.run(stream.toDS())
      .writeStream.format("memory").queryName("sconc")
      .outputMode(OutputMode.Update()).start()
    try {
      val evs = events
      // deliberately NOT time-ordered: shuffle deterministically by a
      // hash so cross-batch disorder is exercised
      val disordered = evs.sortBy(e => (e.t * 2654435761L) % 1000003)
      val chunks = disordered.grouped(
        math.max(1, disordered.size / 4)).toSeq
      var maxSeen = Map.empty[Long, Long]
      chunks.foreach { chunk =>
        stream.addData(chunk)
        query.processAllAvailable()
        val emitted = spark.table("sconc").as[ConcSummary].collect()
        val latest = emitted.zipWithIndex.groupBy(_._1.day)
          .view.mapValues(_.maxBy(_._2)._1).toMap
        // peaks only ever grow as more events extend intervals
        latest.foreach { case (day, s0) =>
          maxSeen.get(day).foreach(prev =>
            assert(s0.peakConcurrent >= prev, s"day $day shrank"))
          maxSeen += day -> s0.peakConcurrent
        }
      }
      val finalRows = spark.table("sconc").as[ConcSummary].collect()
        .zipWithIndex.groupBy(_._1.day)
        .view.mapValues(_.maxBy(_._2)._1).toMap
      val expect = batchExpected
      assert(finalRows.keySet == expect.keySet)
      finalRows.foreach { case (day, s0) =>
        assert((s0.nIntervals, s0.peakConcurrent) == expect(day),
          s"day $day")
      }
      assert(chunks.size >= 4, "replay crossed batch boundaries")
    } finally query.stop()
  }
}
