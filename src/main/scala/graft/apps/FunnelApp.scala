package graft.apps

import graft.streaming.{FunnelEvent, Sessionize}
import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{OutputMode, StreamingQuery, Trigger}

/** The N-step funnel as a deployable streaming app: a typed event
  * stream (key, ms-timestamp, step index) → Sessionize.funnel → append
  * parquet of per-key outcomes, partitioned by outcome date for pruned
  * serving reads. In production the source is Sources.kafkaLines
  * parsed to FunnelEvent (caller maps event types to step indices);
  * tests drive a MemoryStream through the same code.
  *
  * Scale: state is one small record per in-flight key (hash-partitioned
  * across executors, RocksDB provider in GraftSession.production), and
  * each key emits exactly one outcome row — output volume is bounded by
  * distinct anchored keys, not events.
  */
object FunnelApp {

  def run(events: Dataset[FunnelEvent], nSteps: Int, timeoutsMs: Seq[Long],
      outPath: String, checkpoint: String,
      watermark: String = "2 seconds",
      trigger: Trigger = Trigger.ProcessingTime("10 seconds")): StreamingQuery = {
    val withWm = {
      import events.sparkSession.implicits._
      events
        .withColumn("event_time", (col("ts") / 1000).cast("timestamp"))
        .withWatermark("event_time", watermark)
        .as[FunnelEvent]
    }
    Sessionize.funnel(withWm, nSteps, timeoutsMs).toDF()
      .withColumn("dt",
        date_format(timestamp_millis(col("anchorTs")), "yyyyMMdd").cast("int"))
      .writeStream.format("parquet")
      .option("path", outPath)
      .option("checkpointLocation", checkpoint)
      .partitionBy("dt")
      .outputMode(OutputMode.Append)
      .trigger(trigger)
      .start()
  }
}
