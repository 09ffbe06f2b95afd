package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Pins the dual-generation `events.ts` read path (NOTES_r8: the
  * driver regenerated the testdata mid-round-7, switching the parquet
  * physical type from TIMESTAMP(NANOS) — read as LONG under
  * `nanosAsLong=true` — to TIMESTAMP(MICROS)). `Tables.events` must
  * yield the SAME microsecond timestamps from either encoding.
  */
class TablesSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  test("events.ts reads identically from nanos-long and micros-timestamp parquet") {
    import spark.implicits._
    val base = java.nio.file.Files.createTempDirectory("graft_ev").toString
    val rows = Seq(
      (0L, 1704067200123456789L, 7L, "click", 1.5, "{}"),
      (1L, 1704067201987654321L, 8L, "view", 2.5, "{}"))
    // generation A: ts as raw nanos LONG (what nanosAsLong=true yields)
    rows.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.parquet(s"$base/gen_nanos/events.parquet")
    // generation B: ts as a µs timestamp column
    rows.toDF("event_id", "ns", "user_id", "event_type", "value", "props")
      .withColumn("ts", timestamp_micros(expr("ns div 1000"))).drop("ns")
      .select("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.parquet(s"$base/gen_micros/events.parquet")
    def read(d: String) = Tables.events(spark, d)
      .select(col("event_id"), unix_micros(col("ts")).as(s"us"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val a = read(s"$base/gen_nanos")
    val b = read(s"$base/gen_micros")
    assert(a == b)
    assert(a(0L) == 1704067200123456L, "nanos truncated to micros")
  }
}
