package graft.apps

import graft.TestSpark
import org.scalatest.funsuite.AnyFunSuite

/** CI smoke for the one-command layered demo (scripts/demo.sh): every
  * layer of the ODS→DWD→DWS→ADS file-bus chain must land non-empty,
  * and the layer contents must carry the fixture's known shape. */
class LayeredDemoSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  test("all demo layers land non-empty; contents match the fixture") {
    val out = java.nio.file.Files.createTempDirectory("graft_demo").toString
    val counts = LayeredDemo.runAll(spark, out).toMap
    val empty = counts.filter(_._2 == 0L).keys
    assert(empty.isEmpty, s"empty layers: $empty")
    // dead-letter catches exactly the 2 malformed lines
    assert(counts("dwd_dirty") == 2L)
    // 12 (mid, day) combos → 12 UV rows (every mid's day-1 first page)
    assert(counts("dwd_traffic_uv") == 12L)
    // serving stats: one row per channel on the demo day
    val ads = spark.read.parquet(s"$out/ads_traffic_stats")
    assert(ads.select("ch").distinct().count() == 3L)
    val uvByCh = spark.read.parquet(s"$out/ads_channel_uv")
      .collect().map(r => r.getAs[String]("ch") -> r.getAs[Long]("uv_ct"))
      .toMap
    assert(uvByCh.values.forall(_ == 4L), s"4 mids per channel: $uvByCh")
  }
}
