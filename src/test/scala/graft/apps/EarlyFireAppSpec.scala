package graft.apps

import graft.TestSpark
import graft.streaming.KeyedEvent
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalatest.funsuite.AnyFunSuite

/** EarlyFireApp end-to-end: MemoryStream events → MyTrigger-rule
  * windowed counts → dt-partitioned parquet with partial/final rows. */
class EarlyFireAppSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("early + final fires land in dt-partitioned parquet") {
    implicit val sqlCtx = spark.sqlContext
    val key = "spark.sql.streaming.stateStore.providerClass"
    val prev = spark.conf.getOption(key)
    spark.conf.set(key,
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    val dir = java.nio.file.Files.createTempDirectory("earlyfire_app").toString
    try {
      val mem = MemoryStream[KeyedEvent]
      val base = 1651234560000L // 2022-04-29 UTC, window-aligned
      val q = EarlyFireApp.run(mem.toDS(), s"$dir/out", s"$dir/ckpt")
      try {
        // a stalls at base+1 s (grace deadline base+6 s < end base+10 s);
        // the tick at +9 s expires it -> EARLY fire; a re-arms at +9.5 s;
        // later ticks close the window -> FINAL fire cnt=2
        Seq(
          Seq(KeyedEvent("a", base + 1000, "p")),
          Seq(KeyedEvent("tick", base + 9000, "p")),
          Seq(KeyedEvent("a", base + 9500, "p")),
          Seq(KeyedEvent("tick", base + 15000, "p")),
          Seq(KeyedEvent("tick", base + 30000, "p"))
        ).foreach { b => mem.addData(b: _*); q.processAllAvailable() }
      } finally q.stop()
      val got = spark.read.parquet(s"$dir/out")
        .filter($"key" === "a").collect()
        .map(r => (r.getAs[Long]("cnt"), r.getAs[Boolean]("closed"),
          r.getAs[Int]("dt"))).toSet
      assert(got == Set((1L, false, 20220429), (2L, true, 20220429)))
    } finally prev match {
      case Some(v) => spark.conf.set(key, v)
      case None => spark.conf.unset(key)
    }
  }
}
