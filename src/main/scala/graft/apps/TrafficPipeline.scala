package graft.apps

import graft.schemas.Schemas
import graft.streaming.{Dedup, KeyedEvent, LogSplit}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** The end-to-end traffic spine (SURVEY.md §7.2 step 2): raw `topic_log`
  * JSON lines → parse + dead-letter → 5-way split → daily-unique-visitor
  * dedup → 3-way bean union → 10 s channel window — the composition of
  * BaseLogApp → DwdTrafficUniqueVisitorDetail →
  * DwsTrafficVcChArIsNewPageViewWindow as ONE declarative dataflow.
  *
  * Works on a batch fixture frame and on a streaming frame alike; in
  * streaming, pass `watermark = Some("2 seconds")` (the reference's
  * bounded out-of-orderness; 13 s for the full union per
  * DwsTrafficVcChArIsNewPageViewWindow.java:118-123).
  *
  * Chained-stateful note: running UV dedup and the window agg in ONE
  * query trips Spark's multiple-stateful-operator correctness check
  * (flatMapGroupsWithState could in general emit behind the watermark).
  * Here emission is always same-batch as arrival, so set
  * `spark.sql.streaming.statefulOperator.checkCorrectness.enabled=false`
  * for the single-query form — or run it as the reference does: UV dedup
  * as its own query feeding a topic (Sinks.kafka), windows consuming it.
  * At 100 TB the two-query topology is also what you want operationally
  * (independent scaling + checkpoint lifecycles).
  */
object TrafficPipeline {
  import graft.dws.DwsWindows._

  /** UV stream: first page event of each mid per day, carrying `common`
    * forward (ref DwdTrafficUniqueVisitorDetail.java:118). */
  def uniqueVisitors(pageLog: DataFrame, watermark: Option[String] = None)
      : DataFrame = {
    val spark = pageLog.sparkSession
    import spark.implicits._
    val keyed = pageLog.select(
      col("common.mid").as("key"), col("ts"),
      to_json(struct(col("common"), col("ts"))).as("payload")).as[KeyedEvent]
    val wmKeyed = watermark.fold(keyed)(w => Dedup.withMsWatermark(keyed, delay = w))
    Dedup.dailyFirstEvents(wmKeyed)
      .select(from_json(col("payload"),
        org.apache.spark.sql.types.StructType(Seq(
          org.apache.spark.sql.types.StructField("common", Schemas.common),
          org.apache.spark.sql.types.StructField("ts",
            org.apache.spark.sql.types.LongType)))).as("row"))
      .select(col("row.common").as("common"), col("row.ts").as("ts"))
  }

  /** Full pipeline: raw lines → windowed channel rollup. */
  def channelWindow(rawLines: DataFrame, watermark: Option[String] = None)
      : DataFrame = {
    val parsed = LogSplit.parse(rawLines)
    val pages = LogSplit.pageLog(parsed)
    val beans = trafficPageBean(pages)
      .unionByName(trafficUvBean(uniqueVisitors(pages, watermark)))
    val withWm = watermark.fold(beans)(w => beans.withWatermark("event_time", w))
    trafficChannelPageView(withWm)
  }
}
