package graft.dws

import graft.streaming.{Dedup, KeyedEvent, VisitorState}
import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** The eleven reference DWS jobs as named compositions of the engine's
  * operators (SURVEY.md §2.5; one entry per `Dws*Window` app). Inputs are
  * the corresponding DWD frames (graft.dwd.DwdDb outputs or the traffic
  * branches); every function returns the windowed serving frame whose
  * row shape matches FIXTURES.md §7 (minus the nondeterministic
  * wall-clock `ts` column, excluded per FIXTURES.md).
  */
object DwsJobs {
  import DwsWindows._

  private def evTime(df: DataFrame, tsCol: String = "ts"): DataFrame =
    df.withColumn("event_time", (col(tsCol) / 1000).cast("timestamp"))

  /** dws_traffic_source_keyword_page_view_window
    * (DwsTrafficSourceKeywordPageViewWindow.java:71-81). */
  def keywordPageView(pageLog: DataFrame): DataFrame = keywordWindow(pageLog)

  /** dws_traffic_channel_page_view_window
    * (DwsTrafficVcChArIsNewPageViewWindow.java:126-180) — see also the
    * full composition in apps.TrafficPipeline. */
  def channelPageView(beans: DataFrame): DataFrame =
    trafficChannelPageView(beans)

  /** dws_traffic_page_view_window — home / good_detail UV
    * (DwsTrafficPageViewWindow.java:96-181): daily-dedup per (mid, page). */
  def homeDetailPageView(pageLog: DataFrame): DataFrame = {
    val spark = pageLog.sparkSession
    import spark.implicits._
    val keyed = pageLog
      .filter(col("page.page_id").isin("home", "good_detail"))
      .select(concat_ws("|", col("common.mid"), col("page.page_id")).as("key"),
        col("ts"), col("page.page_id").as("payload")).as[KeyedEvent]
    val firsts = Dedup.dailyFirstEvents(keyed).toDF()
    globalWindow(evTime(firsts), "event_time",
      "home_uv_ct" -> when(col("payload") === "home", 1L).otherwise(0L),
      "good_detail_uv_ct" -> when(col("payload") === "good_detail", 1L).otherwise(0L))
  }

  /** dws_user_user_login_window (DwsUserUserLoginWindow.java:83-159):
    * uu + back counts from login classification. */
  def userLogin(logins: Dataset[KeyedEvent], backDays: Int = 8): DataFrame = {
    val acts = VisitorState.classifyLogins(logins, backDays).toDF()
    globalWindow(evTime(acts), "event_time",
      "uu_ct" -> when(col("uu"), 1L).otherwise(0L),
      "back_ct" -> when(col("back"), 1L).otherwise(0L))
  }

  /** dws_user_user_register_window (DwsUserUserRegisterWindow.java:68-88). */
  def userRegister(registers: DataFrame): DataFrame =
    globalWindow(evTime(registers.withColumn("ts", col("ts") * 1000)),
      "event_time", "register_ct" -> lit(1L))

  /** dws_trade_cart_add_uu_window (DwsTradeCartAddUuWindow.java:79-140):
    * daily-unique cart-adders. */
  def cartAddUu(cartAdds: DataFrame): DataFrame = {
    val spark = cartAdds.sparkSession
    import spark.implicits._
    val keyed = cartAdds.select(col("user_id").as("key"),
      (col("ts") * 1000).as("ts"), col("user_id").as("payload")).as[KeyedEvent]
    globalWindow(evTime(Dedup.dailyFirstEvents(keyed).toDF()), "event_time",
      "cart_add_uu_ct" -> lit(1L))
  }

  /** dws_trade_order_window (DwsTradeOrderWindow.java:74-156): unique +
    * new order users, activity/coupon/origin amounts. */
  def tradeOrder(orderDetail: DataFrame): DataFrame = {
    val spark = orderDetail.sparkSession
    import spark.implicits._
    val keyed = orderDetail.select(col("user_id").as("key"),
      (col("ts") * 1000).as("ts"),
      coalesce(col("split_activity_amount"), lit("0")).as("payload")).as[KeyedEvent]
    val uu = globalWindow(evTime(Dedup.dailyFirstEvents(keyed).toDF()),
      "event_time", "order_unique_user_count" -> lit(1L))
    val amounts = globalWindow(evTime(orderDetail.withColumn("ts", col("ts") * 1000)),
      "event_time",
      "order_activity_reduce_amount" ->
        coalesce(col("split_activity_amount").cast("decimal(16,2)"), lit(0)),
      "order_coupon_reduce_amount" ->
        coalesce(col("split_coupon_amount").cast("decimal(16,2)"), lit(0)),
      "order_origin_total_amount" -> col("split_original_amount"))
    uu.join(amounts, Seq("stt", "edt"), "full_outer")
  }

  /** dws_trade_payment_suc_window (DwsTradePaymentSucWindow.java:108-176). */
  def paymentSuc(payDetails: DataFrame): DataFrame = {
    val spark = payDetails.sparkSession
    import spark.implicits._
    val keyed = payDetails.select(col("user_id").as("key"),
      (col("ts") * 1000).as("ts"), col("user_id").as("payload")).as[KeyedEvent]
    globalWindow(evTime(Dedup.dailyFirstEvents(keyed).toDF()), "event_time",
      "payment_suc_unique_user_count" -> lit(1L))
  }

  /** dws_trade_province_order_window
    * (DwsTradeProvinceOrderWindow.java:56-134). */
  def provinceOrder(orderDetail: DataFrame): DataFrame =
    provinceOrderWindow(evTime(orderDetail.withColumn("ts", col("ts") * 1000)))

  /** dws_trade_trademark_category_user_spu_order_window
    * (DwsTradeTrademarkCategoryUserSpuOrderWindow.java:57-255): snowflake
    * dims + exact distinct orders per (tm, cat, user, spu). */
  def tmCategoryUserSpuOrder(orderDetail: DataFrame, skuInfo: DataFrame,
      spuInfo: DataFrame, trademark: DataFrame, cat3: DataFrame,
      cat2: DataFrame, cat1: DataFrame): DataFrame = {
    val enriched = snowflakeDimJoin(orderDetail, skuInfo, spuInfo, trademark,
      cat3, cat2, cat1)
    evTime(enriched.withColumn("ts", col("ts") * 1000))
      .groupBy(window(col("event_time"), WindowSize),
        col("tm_id"), col("tm_name"), col("category1_id"), col("category1_name"),
        col("category2_id"), col("category2_name"), col("category3_id"),
        col("category3_name"), col("user_id"), col("spu_id"), col("spu_name"))
      .agg(size(collect_set(col("order_id"))).cast("long").as("order_count"),
        sum(col("split_total_amount").cast("decimal(16,2)")).as("order_amount"))
      .select(col("window.start").as("stt"), col("window.end").as("edt"),
        col("*")).drop("window")
  }

  /** dws_trade_trademark_category_user_refund_window
    * (DwsTradeTrademarkCategoryUserRefundWindow.java:113-239). */
  def tmCategoryUserRefund(orderRefund: DataFrame, skuInfo: DataFrame,
      spuInfo: DataFrame, trademark: DataFrame, cat3: DataFrame,
      cat2: DataFrame, cat1: DataFrame): DataFrame = {
    val enriched = snowflakeDimJoin(orderRefund, skuInfo, spuInfo, trademark,
      cat3, cat2, cat1)
    evTime(enriched.withColumn("ts", col("ts") * 1000))
      .groupBy(window(col("event_time"), WindowSize),
        col("tm_id"), col("tm_name"), col("category1_id"), col("category1_name"),
        col("category2_id"), col("category2_name"), col("category3_id"),
        col("category3_name"), col("user_id"))
      .agg(size(collect_set(col("order_id"))).cast("long").as("refund_count"),
        sum(col("refund_amount").cast("decimal(16,2)")).as("refund_amount"))
      .select(col("window.start").as("stt"), col("window.end").as("edt"),
        col("*")).drop("window")
  }
}
