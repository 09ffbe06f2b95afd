package graft.schemas

import org.apache.spark.sql.types._

/** Shared StructTypes for the gmall-domain event streams — the reference
  * hand-duplicates these DDLs in every app (e.g. the 42-column order-detail
  * schema re-declared at DwdTradeOrderAdd.java:23-67); here they live once.
  */
object Schemas {

  /** app/web log event (`topic_log`) — shape consumed by BaseLogApp
    * (ref gmall-realtime/.../app/dwd/log/BaseLogApp.java:139-196; fixture
    * FIXTURES.md §1). `start`/`err`/`displays`/`actions` optional → the
    * 5-way split. */
  val common: StructType = StructType(Seq(
    StructField("ar", StringType), StructField("ch", StringType),
    StructField("is_new", StringType), StructField("md", StringType),
    StructField("mid", StringType), StructField("os", StringType),
    StructField("uid", StringType), StructField("vc", StringType)))

  val page: StructType = StructType(Seq(
    StructField("during_time", LongType), StructField("item", StringType),
    StructField("item_type", StringType), StructField("last_page_id", StringType),
    StructField("page_id", StringType), StructField("source_type", StringType)))

  val display: StructType = StructType(Seq(
    StructField("display_type", StringType), StructField("item", StringType),
    StructField("item_type", StringType), StructField("order", LongType),
    StructField("pos_id", LongType)))

  val action: StructType = StructType(Seq(
    StructField("action_id", StringType), StructField("item", StringType),
    StructField("item_type", StringType), StructField("ts", LongType)))

  val start: StructType = StructType(Seq(
    StructField("entry", StringType), StructField("loading_time", LongType),
    StructField("open_ad_id", LongType), StructField("open_ad_ms", LongType),
    StructField("open_ad_skip_ms", LongType)))

  val err: StructType = StructType(Seq(
    StructField("error_code", LongType), StructField("msg", StringType)))

  val logEvent: StructType = StructType(Seq(
    StructField("common", common), StructField("page", page),
    StructField("displays", ArrayType(display)),
    StructField("actions", ArrayType(action)),
    StructField("start", start), StructField("err", err),
    StructField("ts", LongType)))

  /** Maxwell binlog envelope (`topic_db`) — one shared view of all CDC
    * events (ref utils/MyKafkaUtil.java:91-100; fixture FIXTURES.md §2).
    * `old` is also kept raw as `old_str` (the reference reads it both as
    * map and as string — DwdTradeOrderRefund.java:51). */
  val maxwellEnvelope: StructType = StructType(Seq(
    StructField("database", StringType), StructField("table", StringType),
    StructField("type", StringType), StructField("ts", LongType),
    StructField("xid", LongType), StructField("xoffset", LongType),
    StructField("data", MapType(StringType, StringType)),
    StructField("old", MapType(StringType, StringType))))
}
