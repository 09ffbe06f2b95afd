package graft.apps

import graft.TestSpark
import graft.streaming.FunnelEvent
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalatest.funsuite.AnyFunSuite

/** FunnelApp end-to-end: MemoryStream events → streaming funnel →
  * dt-partitioned parquet outcomes. */
class FunnelAppSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("funnel outcomes land in dt-partitioned parquet") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[FunnelEvent]
    val dir = java.nio.file.Files.createTempDirectory("funnel_app").toString
    val q = FunnelApp.run(mem.toDS(), nSteps = 2, timeoutsMs = Seq(60000L),
      outPath = s"$dir/out", checkpoint = s"$dir/ckpt")
    try {
      val base = 1651234567000L // 2022-04-29 UTC
      mem.addData(
        FunnelEvent("u1", base, 0), FunnelEvent("u1", base + 30000, 1), // completes
        FunnelEvent("u2", base, 0)) // never sees step 1
      q.processAllAvailable()
      mem.addData(FunnelEvent("tick", base + 7200000, 0)) // advance watermark
      q.processAllAvailable()
      mem.addData(FunnelEvent("tick2", base + 7300000, 0)) // u2 timeout fires
      q.processAllAvailable()
      val got = spark.read.parquet(s"$dir/out")
      val byKey = got.collect().map(r =>
        r.getAs[String]("key") -> r.getAs[Boolean]("completed")).toMap
      assert(byKey.get("u1").contains(true))
      assert(byKey.get("u2").contains(false))
      assert(got.columns.contains("dt"))
      assert(got.filter($"key" === "u1").head().getAs[Int]("dt") == 20220429)
    } finally q.stop()
  }
}
