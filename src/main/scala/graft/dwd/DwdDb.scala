package graft.dwd

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** DWD business-fact transforms over the parsed `topic_db` Maxwell
  * envelope (graft.sources.Sources.topicDb). Each function is the
  * Spark re-expression of one reference DWD-db job (SURVEY.md §2.3
  * P2–P6, §2.4 J1–J5); all are plain `DataFrame => DataFrame` so they run
  * identically on a batch fixture and a streaming frame.
  *
  * Conventions: `data`/`old` are MapType(String,String) columns;
  * projections pull `data['col']` fields (P2); status transitions test
  * `old['col']` (P5); changed-key-set tests use `map_keys(old)` (P6).
  */
object DwdDb {

  private def d(c: String): Column = col("data").getItem(c).as(c)

  /** P2: envelope filter + field projection, the head of every DWD-db job
    * (e.g. DwdTradeOrderDetail.java:32-51). */
  def tableEvents(topicDb: DataFrame, table: String, types: String*): DataFrame =
    topicDb.filter(col("table") === table &&
      (if (types.isEmpty) lit(true) else col("type").isin(types: _*)))

  /** dwd_trade_cart_add (ref DwdTradeCartAdd.java:37-59): inserts, plus
    * updates that INCREASE sku_num (P4); delta via if(insert, n, n-old)
    * (P3). */
  def cartAdd(topicDb: DataFrame): DataFrame =
    tableEvents(topicDb, "cart_info")
      .filter(col("type") === "insert" ||
        (col("type") === "update" && col("old").getItem("sku_num").isNotNull &&
          col("data").getItem("sku_num").cast("int") >
            col("old").getItem("sku_num").cast("int")))
      .select(d("id"), d("user_id"), d("sku_id"), d("source_type"), d("source_id"),
        d("create_time"),
        when(col("type") === "insert", col("data").getItem("sku_num").cast("int"))
          .otherwise(col("data").getItem("sku_num").cast("int") -
            col("old").getItem("sku_num").cast("int")).as("sku_num"),
        col("ts"))

  /** dwd_trade_order_detail (ref DwdTradeOrderDetail.java:183-190):
    * order_detail ⋈ order_info (J1) ⟕ order_detail_activity ⟕
    * order_detail_coupon (J2) + base_dic lookup (J3). In streaming these
    * become watermarked stream-stream joins; the dic join is a per-batch
    * broadcast snapshot (≡ FOR SYSTEM_TIME AS OF pt). */
  def orderDetail(topicDb: DataFrame, baseDic: DataFrame): DataFrame = {
    val detail = tableEvents(topicDb, "order_detail", "insert")
      .select(d("id"), d("order_id"), d("sku_id"), d("sku_name"), d("create_time"),
        d("source_id"), d("source_type"), d("sku_num"),
        (col("data").getItem("sku_num").cast("decimal(16,2)") *
          col("data").getItem("order_price").cast("decimal(16,2)"))
          .as("split_original_amount"),
        d("split_total_amount"), d("split_activity_amount"), d("split_coupon_amount"),
        col("ts"))
      .withColumnRenamed("id", "detail_id")
    val info = tableEvents(topicDb, "order_info", "insert")
      .select(d("id"), d("user_id"), d("province_id"))
      .withColumnRenamed("id", "order_id_i")
    val act = tableEvents(topicDb, "order_detail_activity", "insert")
      .select(d("order_detail_id"), d("activity_id"), d("activity_rule_id"))
      .withColumnRenamed("order_detail_id", "act_detail_id")
    val cou = tableEvents(topicDb, "order_detail_coupon", "insert")
      .select(d("order_detail_id"), d("coupon_id"))
      .withColumnRenamed("order_detail_id", "cou_detail_id")
    detail
      .join(info, col("order_id") === col("order_id_i"))
      .join(act, col("detail_id") === col("act_detail_id"), "left")
      .join(cou, col("detail_id") === col("cou_detail_id"), "left")
      .join(broadcast(baseDic.select(col("dic_code"), col("dic_name"))),
        col("source_type") === col("dic_code"), "left")
      .withColumnRenamed("dic_name", "source_type_name")
      .drop("order_id_i", "act_detail_id", "cou_detail_id", "dic_code")
  }

  /** dwd_trade_order_add (ref DwdTradeOrderAdd.java:23-67): the
    * order-placement fact — `type='insert'` rows of the order-detail wide
    * changelog, re-projected. The reference's wide topic is a changelog
    * carrying `type`/`old`; our orderDetail frame is built from
    * insert-type envelopes only, so order-add is a pure projection of it
    * (the filter the reference applies is already folded in upstream). */
  def orderAdd(topicDb: DataFrame, baseDic: DataFrame): DataFrame =
    orderDetail(topicDb, baseDic)
      .select("detail_id", "order_id", "sku_id", "sku_name", "create_time",
        "source_id", "source_type", "source_type_name", "sku_num",
        "split_original_amount", "split_total_amount",
        "split_activity_amount", "split_coupon_amount",
        "user_id", "province_id", "activity_id", "activity_rule_id",
        "coupon_id", "ts")

  /** dwd_trade_cancel_detail (ref DwdTradeCancelDetail.java:70-76, P5):
    * order_status transition to 1003. */
  def cancelDetail(topicDb: DataFrame): DataFrame =
    tableEvents(topicDb, "order_info", "update")
      .filter(col("old").getItem("order_status").isNotNull &&
        col("data").getItem("order_status") === "1003")
      .select(d("id"), d("user_id"), d("province_id"), d("operate_time"), col("ts"))

  /** dwd_trade_pay_detail_suc (ref DwdTradePayDetailSuc.java:91-134):
    * payment_status → 1602 (P5) + dic lookup for payment_type (J3). The
    * `old['payment_status'] is not null` guard (ref :101-102) emits only
    * on the actual transition — a later update touching another column
    * of an already-paid row must NOT re-emit the payment fact. */
  def payDetailSuc(topicDb: DataFrame, baseDic: DataFrame): DataFrame =
    tableEvents(topicDb, "payment_info", "update")
      .filter(col("data").getItem("payment_status") === "1602" &&
        col("old").getItem("payment_status").isNotNull)
      .select(d("id"), d("order_id"), d("user_id"), d("payment_type"),
        d("callback_time"), col("ts"))
      .join(broadcast(baseDic.select(col("dic_code"), col("dic_name"))),
        col("payment_type") === col("dic_code"), "left")
      .withColumnRenamed("dic_name", "payment_type_name")
      .drop("dic_code")

  /** dwd_trade_order_refund (ref DwdTradeOrderRefund.java:76-133):
    * refund_info inserts ⟕ order_info rows whose update set
    * order_status=1005 with the change-set test on the raw `old` string
    * (P6) + the same dim joined twice under aliases (J4). */
  def orderRefund(topicDb: DataFrame, baseDic: DataFrame): DataFrame = {
    val refund = tableEvents(topicDb, "order_refund_info", "insert")
      .select(d("id"), d("user_id"), d("order_id"), d("sku_id"),
        d("refund_type"), d("refund_num"), d("refund_amount"),
        d("refund_reason_type"), d("create_time"),
        date_format(col("data").getItem("create_time"), "yyyy-MM-dd").as("date_id"),
        col("ts"))
    val info = tableEvents(topicDb, "order_info", "update")
      .filter(col("data").getItem("order_status") === "1005" &&
        array_contains(map_keys(col("old")), "order_status"))
      .select(d("id"), d("province_id"))
      .withColumnRenamed("id", "info_order_id")
    val dicType = broadcast(baseDic.select(col("dic_code").as("t_code"),
      col("dic_name").as("refund_type_name")))
    val dicReason = broadcast(baseDic.select(col("dic_code").as("r_code"),
      col("dic_name").as("refund_reason_type_name")))
    refund
      .join(info, col("order_id") === col("info_order_id"), "left")
      .join(dicType, col("refund_type") === col("t_code"), "left")
      .join(dicReason, col("refund_reason_type") === col("r_code"), "left")
      .drop("info_order_id", "t_code", "r_code")
  }

  /** dwd_tool_coupon_get (ref DwdToolCouponGet.java:43-52): coupon_use
    * inserts with derived date_id (P13). */
  def couponGet(topicDb: DataFrame): DataFrame =
    tableEvents(topicDb, "coupon_use", "insert")
      .select(d("id"), d("coupon_id"), d("user_id"), d("get_time"),
        date_format(col("data").getItem("get_time"), "yyyy-MM-dd").as("date_id"),
        col("ts"))

  /** dwd_tool_coupon_order (ref DwdToolCouponOrder.java:66-76, P6):
    * updates whose changed-key set contains using_time — tested on the
    * RAW `old` JSON string, as the reference does. */
  def couponOrder(topicDb: DataFrame): DataFrame =
    tableEvents(topicDb, "coupon_use", "update")
      .filter(array_contains(
        map_keys(from_json(col("old_str"), org.apache.spark.sql.types.MapType(
          org.apache.spark.sql.types.StringType, org.apache.spark.sql.types.StringType))), "using_time"))
      .select(d("id"), d("coupon_id"), d("user_id"), d("order_id"), d("using_time"),
        date_format(col("data").getItem("using_time"), "yyyy-MM-dd").as("date_id"),
        col("ts"))

  /** dwd_tool_coupon_pay (ref DwdToolCouponPay.java:65-75, P6). */
  def couponPay(topicDb: DataFrame): DataFrame =
    tableEvents(topicDb, "coupon_use", "update")
      .filter(array_contains(
        map_keys(from_json(col("old_str"), org.apache.spark.sql.types.MapType(
          org.apache.spark.sql.types.StringType, org.apache.spark.sql.types.StringType))), "used_time"))
      .select(d("id"), d("coupon_id"), d("user_id"), d("order_id"), d("used_time"),
        date_format(col("data").getItem("used_time"), "yyyy-MM-dd").as("date_id"),
        col("ts"))

  /** dwd_interaction_comment (ref DwdInteractionComment.java:39-80):
    * inserts + single-alias dic join (J4). */
  def comment(topicDb: DataFrame, baseDic: DataFrame): DataFrame =
    tableEvents(topicDb, "comment_info", "insert")
      .select(d("id"), d("user_id"), d("sku_id"), d("spu_id"), d("order_id"),
        d("create_time"), d("appraise"),
        date_format(col("data").getItem("create_time"), "yyyy-MM-dd").as("date_id"),
        col("ts"))
      .join(broadcast(baseDic.select(col("dic_code"), col("dic_name"))),
        col("appraise") === col("dic_code"), "left")
      .withColumnRenamed("dic_name", "appraise_name")
      .drop("dic_code")

  /** dwd_interaction_favor_add (ref DwdInteractionFavorAdd.java:52-54):
    * inserts, or updates flipping is_cancel back to '0' (re-favor). */
  def favorAdd(topicDb: DataFrame): DataFrame =
    tableEvents(topicDb, "favor_info")
      .filter(col("type") === "insert" ||
        (col("type") === "update" && col("data").getItem("is_cancel") === "0" &&
          col("old").getItem("is_cancel") === "1"))
      .select(d("id"), d("user_id"), d("sku_id"), d("create_time"), col("ts"))

  /** dwd_user_register (ref DwdUserRegister.java:60-66): user_info
    * inserts with date_id/ts derivation (P13). */
  def userRegister(topicDb: DataFrame): DataFrame =
    tableEvents(topicDb, "user_info", "insert")
      .select(d("id"), d("create_time"),
        date_format(col("data").getItem("create_time"), "yyyy-MM-dd").as("date_id"),
        col("ts"))
}
