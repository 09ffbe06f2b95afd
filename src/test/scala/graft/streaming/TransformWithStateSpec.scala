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
