package graft.streaming

import graft.TestSpark
import org.apache.spark.sql.streaming.Trigger
import org.scalatest.funsuite.AnyFunSuite
import java.nio.file.{Files, Paths}

/** U3 under restart: the EarlyFire trigger's timers and counts live in
  * the state store, so stopping after the early fire and restarting
  * from the SAME checkpoint must (a) not re-emit the early fire, and
  * (b) still deliver the final closed fire with the count accumulated
  * ACROSS the restart — the trigger semantics survive recovery exactly
  * once. RocksDB provider (transformWithState requirement). */
class EarlyFireRecoverySpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("early fire not re-emitted; final fire accumulates across restart") {
    val key = "spark.sql.streaming.stateStore.providerClass"
    val prev = spark.conf.getOption(key)
    spark.conf.set(key,
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      val root = Files.createTempDirectory("earlyfire_ckpt").toString
      val in = s"$root/in"; val out = s"$root/out"; val ckpt = s"$root/ckpt"
      Files.createDirectories(Paths.get(in))
      def writeFile(name: String, rows: Seq[(String, Long)]): Unit =
        Files.write(Paths.get(s"$in/$name"),
          rows.map { case (k, ts) => s"$k,$ts" }.mkString("\n")
            .getBytes("UTF-8"))

      def start() = {
        val ds = spark.readStream.format("text").load(in)
          .selectExpr("split(value, ',')[0] AS key",
            "CAST(split(value, ',')[1] AS BIGINT) AS ts",
            "'p' AS payload").as[KeyedEvent]
        EarlyFire.windowCounts(Dedup.withMsWatermark(ds))
          .writeStream.format("parquet")
          .option("path", out).option("checkpointLocation", ckpt)
          .outputMode("append").trigger(Trigger.ProcessingTime(0))
          .start()
      }

      // phase 1: a@1s (grace deadline 6 s), tick to 9 s -> EARLY fire
      writeFile("f1.csv", Seq("a" -> 1000L, "tick" -> 9000L))
      val q1 = start()
      try q1.processAllAvailable() finally q1.stop()

      // phase 2: RESTART; re-arm a within the window (9.5 s >= wm),
      // then close it past the window end
      writeFile("f2.csv", Seq("a" -> 9500L))
      writeFile("f3.csv", Seq("tick" -> 15000L, "tick" -> 30000L))
      val q2 = start()
      try q2.processAllAvailable() finally q2.stop()

      val rows = spark.read.parquet(out).as[WindowCount].collect()
        .filter(_.key == "a").toSeq
      // exactly one early fire (cnt 1, from phase 1) and exactly one
      // closed fire whose count spans the restart (1 + 1)
      assert(rows.toSet == Set(
        WindowCount("a", 0, 1, closed = false),
        WindowCount("a", 0, 2, closed = true)), rows.toString)
      assert(rows.size == 2, s"duplicated fires after restart: $rows")
    } finally prev match {
      case Some(v) => spark.conf.set(key, v)
      case None => spark.conf.unset(key)
    }
  }
}
