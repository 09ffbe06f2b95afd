package graft.apps

import graft.dwd.DwdDb
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Streaming form of the order-detail wide fact (ref
  * DwdTradeOrderDetail.java:183-190): order_detail ⋈ order_info (J1),
  * ⟕ order_detail_activity, ⟕ order_detail_coupon (J2), + broadcast
  * base_dic lookup (J3) — as watermarked stream-stream joins over ONE
  * shared topic_db stream.
  *
  * The reference keeps join state for 3 days of idle time
  * (tableEnv idle-state retention); here each leg carries a watermark and
  * the join conditions bound event-time distance to `retention`, so state
  * is reclaimed by watermark — same effect, declarative. Inner-join rows
  * emit as soon as both sides arrive; left-outer null-padded rows emit
  * once the watermark passes the join window (vs the reference's
  * retract/re-emit changelog — see SURVEY.md §7.4 delta 1).
  */
object TradePipeline {

  def orderDetailStream(topicDb: DataFrame, baseDic: DataFrame,
      watermark: String = "5 seconds", retention: String = "60 seconds")
      : DataFrame = {
    // ONE watermark on the shared topic_db stream BEFORE the split: each
    // leg's time column is an alias of the same watermarked column. A
    // per-leg watermark would stall the query whenever one table sees no
    // traffic (global watermark = min over all watermark nodes, and a
    // node with no data never advances).
    val src = topicDb
      .withColumn("event_time", to_timestamp(col("ts")))
      .withWatermark("event_time", watermark)
    def leg(table: String, prefix: String, cols: Seq[String]): DataFrame =
      DwdDb.tableEvents(src, table, "insert")
        .select(cols.map(c => col("data").getItem(c).as(s"$prefix$c")) :+
          col("event_time").as(s"${prefix}time"): _*)
    val detail = leg("order_detail", "d_", Seq("id", "order_id", "sku_id",
      "sku_num", "order_price", "split_total_amount", "source_type"))
    val info = leg("order_info", "i_", Seq("id", "user_id", "province_id"))
    val act = leg("order_detail_activity", "a_", Seq("order_detail_id", "activity_id"))
    val cou = leg("order_detail_coupon", "c_", Seq("order_detail_id", "coupon_id"))

    def within(l: String, r: String) =
      col(r) >= col(l) - expr(s"interval $retention") &&
        col(r) <= col(l) + expr(s"interval $retention")

    detail
      .join(info, col("d_order_id") === col("i_id") &&
        within("d_time", "i_time"))
      .join(act, col("d_id") === col("a_order_detail_id") &&
        within("d_time", "a_time"), "left")
      .join(cou, col("d_id") === col("c_order_detail_id") &&
        within("d_time", "c_time"), "left")
      .join(broadcast(baseDic.select(col("dic_code"), col("dic_name"))),
        col("d_source_type") === col("dic_code"), "left")
      .select(
        col("d_id").as("detail_id"), col("d_order_id").as("order_id"),
        col("d_sku_id").as("sku_id"), col("d_sku_num").as("sku_num"),
        col("d_split_total_amount").as("split_total_amount"),
        col("i_user_id").as("user_id"), col("i_province_id").as("province_id"),
        col("a_activity_id").as("activity_id"), col("c_coupon_id").as("coupon_id"),
        col("dic_name").as("source_type_name"),
        col("d_time").as("event_time"))
  }
}
