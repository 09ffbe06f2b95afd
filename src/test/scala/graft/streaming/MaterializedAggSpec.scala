package graft.streaming

import graft.TestSpark
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.OutputMode
import org.scalatest.funsuite.AnyFunSuite

/** MaterializedAgg: the q167 delta-maintenance theorem run as a
  * stream. The q164 changelog (as row-level deltas) replays in chunks
  * through keyed state seeded with the base aggregates; after every
  * micro-batch the emitted rows match a driver-side fold of the same
  * prefix, and the final state equals the oracle-verified batch q167
  * result exactly.
  */
class MaterializedAggSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private val D = "/root/testdata/sf0.001"

  private lazy val deltas: Seq[ChangeEvent] =
    graft.queries.LayoutOps.changelogDeltas(spark, D).collect()
      .map(r => ChangeEvent(r.getString(0), r.getLong(1), r.getLong(2)))
      .toSeq
  private lazy val base: Map[String, (Long, Long)] =
    graft.queries.LayoutOps.baseAggregates(spark, D).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2)))).toMap
  private lazy val batchQ167: Map[String, (Long, Long)] =
    graft.queries.LayoutOps.incrementalAgg(spark, D).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2)))).toMap

  private def initialDs =
    base.toSeq.map { case (s, (d, c)) => SourceAgg(s, d, c) }.toDS()

  test("batch maintain over the full changelog equals oracle-verified q167") {
    val out = MaterializedAgg.maintain(deltas.toDS(), initialDs).collect()
      .map(a => a.source -> ((a.nDocs, a.nChars))).toMap
    // maintain emits only touched sources; untouched keep base
    val full = base ++ out
    assert(full.filter(_._2._1 > 0) == batchQ167)
  }

  test("chunked streaming replay converges through consistent prefixes") {
    implicit val sqlCtx = spark.sqlContext
    val stream = MemoryStream[ChangeEvent]
    val query = MaterializedAgg.maintain(stream.toDS(), initialDs)
      .writeStream.format("memory").queryName("magg")
      .outputMode(OutputMode.Update()).start()
    try {
      val chunks = deltas.grouped(math.max(1, deltas.size / 3)).toSeq
      var applied = base
      var batches = 0
      chunks.foreach { chunk =>
        stream.addData(chunk)
        query.processAllAvailable()
        batches += 1
        applied = chunk.foldLeft(applied) { (acc, e) =>
          val (d0, c0) = acc.getOrElse(e.source, (0L, 0L))
          acc + (e.source -> ((d0 + e.dDocs, c0 + e.dChars)))
        }
        // latest emitted row per source so far must equal the prefix fold
        val emitted = spark.table("magg").as[SourceAgg].collect()
        val latest = emitted.zipWithIndex.groupBy(_._1.source)
          .view.mapValues(_.maxBy(_._2)._1).toMap
        latest.foreach { case (src, agg) =>
          assert((agg.nDocs, agg.nChars) == applied(src),
            s"batch $batches, source $src")
        }
      }
      val finalMap = base ++ spark.table("magg").as[SourceAgg].collect()
        .zipWithIndex.groupBy(_._1.source)
        .view.mapValues(_.maxBy(_._2)._1).toMap
        .map { case (s, a) => s -> ((a.nDocs, a.nChars)) }
      assert(finalMap.filter(_._2._1 > 0) == batchQ167)
      assert(batches >= 3, "replay actually crossed batch boundaries")
    } finally query.stop()
  }
}
