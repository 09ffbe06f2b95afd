package graft.apps

import graft.sinks.Sinks
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

/** The traffic DWS job as a deployable streaming app: raw `topic_log`
  * lines → TrafficPipeline.channelWindow → dt-partitioned parquet serving
  * table (Sinks.dwsParquet). In production the source is
  * Sources.kafkaLines(...); any lines frame works (the tests drive a
  * MemoryStream through the same code).
  */
object TrafficApp {

  def run(rawLines: DataFrame, outPath: String, checkpoint: String,
      watermark: String = "2 seconds",
      trigger: Trigger = Trigger.ProcessingTime("10 seconds")): StreamingQuery = {
    val spark = rawLines.sparkSession
    // single-query form of the reference's two-job topology — see
    // TrafficPipeline scaladoc for the tradeoff and the two-query form.
    // The correctness-check override is needed only while THIS query is
    // analyzed (at start()); restore the prior value so the safeguard
    // stays on for other queries in the session.
    val key = "spark.sql.streaming.statefulOperator.checkCorrectness.enabled"
    val prev = spark.conf.getOption(key)
    spark.conf.set(key, "false")
    try {
      Sinks.dwsParquet(
          TrafficPipeline.channelWindow(rawLines, Some(watermark)),
          outPath, checkpoint)
        .trigger(trigger)
        .start()
    } finally {
      prev match {
        case Some(v) => spark.conf.set(key, v)
        case None => spark.conf.unset(key)
      }
    }
  }
}
