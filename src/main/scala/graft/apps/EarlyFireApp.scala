package graft.apps

import graft.streaming.{Dedup, EarlyFire, KeyedEvent}
import org.apache.spark.sql.Dataset
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{OutputMode, StreamingQuery, Trigger}

/** U3 deployed: the reference's custom-trigger windowed count as a
  * runnable streaming app (the analog of MyTrigger.java:10-44 wired
  * into WmTest03's keyBy→window→trigger→sum→print job, here with a
  * durable sink). A typed event stream → EarlyFire.windowCounts
  * (fire at watermark-reaches-window-end OR +grace stall flush,
  * whichever first; early-fired windows re-arm only on a new element)
  * → append parquet partitioned by window date, so serving reads prune
  * by day and a downstream consumer can distinguish partial rows
  * (`closed = false`) from final ones.
  *
  * Scale: state is two longs + a flag per OPEN (key, window) pair,
  * hash-partitioned across executors, RocksDB-backed
  * (transformWithState requires the RocksDB provider —
  * GraftSession.production sets it; tests set it per-query). Output
  * volume is at most two rows per stalled window, one otherwise.
  */
object EarlyFireApp {

  def run(events: Dataset[KeyedEvent], outPath: String, checkpoint: String,
      windowMs: Long = 10000L, graceMs: Long = 5000L,
      trigger: Trigger = Trigger.ProcessingTime("10 seconds")): StreamingQuery =
    EarlyFire.windowCounts(Dedup.withMsWatermark(events), windowMs, graceMs)
      .toDF()
      .withColumn("dt",
        date_format(timestamp_millis(col("windowStart")), "yyyyMMdd")
          .cast("int"))
      .writeStream.format("parquet")
      .option("path", outPath)
      .option("checkpointLocation", checkpoint)
      .partitionBy("dt")
      .outputMode(OutputMode.Append)
      .trigger(trigger)
      .start()
}
