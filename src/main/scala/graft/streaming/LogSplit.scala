package graft.streaming

import graft.schemas.Schemas
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** BaseLogApp analog (ref app/dwd/log/BaseLogApp.java:126-202): parse raw
  * JSON log lines, route corrupt lines to a dead-letter branch (the
  * reference's Dirty side output, BaseLogApp.java:45-59), and split one
  * parsed stream into the five DWD traffic branches — page / start /
  * display / action / err — with the nested `displays[]`/`actions[]`
  * arrays exploded and enriched with `page_id`/`ts`/`common`
  * (BaseLogApp.java:166-188).
  *
  * All transforms are `DataFrame => DataFrame` and work identically on a
  * batch frame and a streaming frame — the parsed frame is computed once
  * and the five branches are cheap projections over it (Spark reuses the
  * scan per sink via foreachBatch, or one query per branch at scale).
  */
object LogSplit {

  /** Parse `value: String` lines → typed columns + `_corrupt` flag.
    * Spark 4's `from_json` returns an all-null struct (not null) on
    * corrupt rows, so detection goes through the PERMISSIVE-mode
    * `_corrupt_record` field — same semantics as the reference's
    * try/catch side output. */
  def parse(raw: DataFrame): DataFrame = {
    import org.apache.spark.sql.types.{StringType, StructField, StructType}
    val schemaWithCorrupt =
      StructType(Schemas.logEvent.fields :+ StructField("_corrupt_record", StringType))
    raw.withColumn("log", from_json(col("value"), schemaWithCorrupt,
        Map("mode" -> "PERMISSIVE", "columnNameOfCorruptRecord" -> "_corrupt_record")))
      .withColumn("_corrupt", col("log._corrupt_record").isNotNull)
  }

  /** Dead-letter branch: lines that failed to parse. */
  def dirty(parsed: DataFrame): DataFrame =
    parsed.filter(col("_corrupt")).select(col("value"))

  private def ok(parsed: DataFrame): DataFrame =
    parsed.filter(!col("_corrupt")).select(col("log.*"))
      .drop("_corrupt_record")

  /** dwd_traffic_start_log — rows with a `start` payload
    * (BaseLogApp.java:145-150). */
  def startLog(parsed: DataFrame): DataFrame =
    ok(parsed).filter(col("start").isNotNull)
      .select(col("common"), col("start"), col("ts"))

  /** dwd_traffic_error_log (BaseLogApp.java:139-143). */
  def errLog(parsed: DataFrame): DataFrame =
    ok(parsed).filter(col("err").isNotNull)
      .select(col("common"), col("page"), col("err"), col("ts"))

  /** dwd_traffic_page_log — everything with a `page` payload
    * (BaseLogApp.java:193-196). */
  def pageLog(parsed: DataFrame): DataFrame =
    ok(parsed).filter(col("page").isNotNull)
      .select(col("common"), col("page"), col("ts"))

  /** dwd_traffic_display_log — `displays[]` exploded, enriched with
    * page_id + ts (BaseLogApp.java:166-176). */
  def displayLog(parsed: DataFrame): DataFrame =
    ok(parsed).filter(col("displays").isNotNull)
      .select(col("common"), col("page.page_id").as("page_id"), col("ts"),
        explode(col("displays")).as("display"))
      .select(col("common"), col("page_id"), col("ts"), col("display.*"))

  /** dwd_traffic_action_log — `actions[]` exploded
    * (BaseLogApp.java:178-188). */
  def actionLog(parsed: DataFrame): DataFrame =
    ok(parsed).filter(col("actions").isNotNull)
      .select(col("common"), col("page.page_id").as("page_id"),
        explode(col("actions")).as("action"))
      .select(col("common"), col("page_id"), col("action.*"))

  /** P9 analog: session-entry pages (`last_page_id IS NULL`) — the input
    * of unique-visitor and bounce detection
    * (DwdTrafficUniqueVisitorDetail.java:49-54). */
  def sessionEntries(pageLog: DataFrame): DataFrame =
    pageLog.filter(col("page.last_page_id").isNull)
}
