package graft.streaming

import graft.TestSpark
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.OutputMode
import org.scalatest.funsuite.AnyFunSuite

/** StreamingTopK: the Misra–Gries guarantees under chunked streaming
  * replay of the real corpus word stream — every counter is a lower
  * bound on the prefix-true frequency, the deficit is ≤ N/(m+1), every
  * item with true frequency > N/(m+1) is present, and state never
  * exceeds m counters. These are the ORDER-INDEPENDENT guarantees:
  * summary CONTENT depends on fold order (the q124 rows-only rationale),
  * and a micro-batch's group iterator does not promise arrival order,
  * so content equality against an ordered driver fold is deliberately
  * NOT asserted — the bounds are what MG actually promises. */
class StreamingTopKSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private val M = 8

  private lazy val words: Seq[(String, String)] =
    spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .selectExpr("source", "explode(split(text, ' ')) AS w").collect()
      .map(r => (r.getString(0), r.getString(1))).toSeq

  private def driverMg(obs: Seq[(String, String)])
      : Map[String, (Map[String, Long], Long)] =
    obs.groupBy(_._1).view.mapValues { ws =>
      val c = scala.collection.mutable.Map.empty[String, Long]
      ws.foreach { case (_, t) => StreamingTopK.mgInsert(M, c, t, 1L) }
      (c.toMap, ws.length.toLong)
    }.toMap

  test("chunked streaming replay: bounded state; MG frequency bounds " +
    "and completeness hold after every batch") {
    implicit val sqlCtx = spark.sqlContext
    val stream = MemoryStream[TokenEvent]
    val q = StreamingTopK.maintain(stream.toDS(), M)
      .writeStream.format("memory").queryName("mgtopk")
      .outputMode(OutputMode.Update()).start()
    try {
      val events = words.map { case (g, t) => TokenEvent(g, t, 1L) }
      val chunks = events.grouped(math.max(1, events.size / 3)).toSeq
      var prefix = Seq.empty[(String, String)]
      chunks.foreach { chunk =>
        stream.addData(chunk)
        q.processAllAvailable()
        prefix = prefix ++ chunk.map(e => (e.group, e.token))
        val expected = driverMg(prefix)
        val emitted = spark.table("mgtopk").as[MgSummary].collect()
        val latest = emitted.zipWithIndex.groupBy(_._1.group)
          .view.mapValues(_.maxBy(_._2)._1).toMap
        val trueFreq = prefix.groupBy(_._1).view.mapValues(
          _.groupBy(_._2).view.mapValues(_.size.toLong).toMap).toMap
        latest.foreach { case (g, s) =>
          // mass is order-independent; content bounds checked below
          assert(s.n == expected(g)._2, g)
          assert(s.tokens.size <= M)
          val bound = s.n / (M + 1)
          s.tokens.foreach { case (t, lower) =>
            val f = trueFreq(g)(t)
            assert(lower <= f && f - lower <= bound, s"$g/$t")
          }
          // completeness: every item above the MG threshold survives
          trueFreq(g).foreach { case (t, f) =>
            if (f > bound) assert(s.tokens.contains(t), s"missing $g/$t")
          }
        }
      }
    } finally q.stop()
  }
}
