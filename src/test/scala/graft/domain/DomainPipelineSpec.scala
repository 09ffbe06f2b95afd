package graft.domain

import graft.TestSpark
import graft.dim.DimRouter
import graft.dwd.DwdDb
import graft.dws.DwsWindows
import graft.serving.ServingQueries
import graft.sources.Sources
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** End-to-end fixture replay of the gmall domain: Maxwell envelopes
  * (FIXTURES.md §2) → topic_db parse → DWD transforms → DWS windows →
  * serving queries. Batch frames here; the transforms are the same
  * `DataFrame => DataFrame` functions used in streaming. */
class DomainPipelineSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def env(table: String, typ: String, data: Map[String, String],
      old: Map[String, String] = null, ts: Long = 1592270938L): String = {
    def m(mm: Map[String, String]) =
      if (mm == null) "null"
      else mm.map { case (k, v) =>
        "\"" + k + "\":" + (if (v == null) "null" else "\"" + v + "\"")
      }.mkString("{", ",", "}")
    s"""{"database":"gmall","table":"$table","type":"$typ","ts":$ts,""" +
      s""""xid":1,"xoffset":1,"data":${m(data)},"old":${m(old)}}"""
  }

  private val fixtures = Seq(
    // cart: insert + qty increase + qty decrease (excluded) + non-cart table
    env("cart_info", "insert", Map("id" -> "c1", "user_id" -> "u1", "sku_id" -> "s1",
      "sku_num" -> "2", "source_type" -> "2401", "source_id" -> null,
      "create_time" -> "2020-06-14 09:28:57")),
    env("cart_info", "update", Map("id" -> "c1", "user_id" -> "u1", "sku_id" -> "s1",
      "sku_num" -> "5", "source_type" -> "2401", "source_id" -> null,
      "create_time" -> "2020-06-14 09:28:57"), Map("sku_num" -> "2")),
    env("cart_info", "update", Map("id" -> "c1", "user_id" -> "u1", "sku_id" -> "s1",
      "sku_num" -> "1", "source_type" -> "2401", "source_id" -> null,
      "create_time" -> "2020-06-14 09:28:57"), Map("sku_num" -> "5")),
    // order detail + order info + activity (no coupon)
    env("order_detail", "insert", Map("id" -> "d1", "order_id" -> "o1",
      "sku_id" -> "s1", "sku_name" -> "phone", "sku_num" -> "2",
      "order_price" -> "100.50", "source_type" -> "2401", "source_id" -> null,
      "create_time" -> "2020-06-14 10:00:00", "split_total_amount" -> "180.00",
      "split_activity_amount" -> "21.00", "split_coupon_amount" -> null)),
    env("order_info", "insert", Map("id" -> "o1", "user_id" -> "u1",
      "province_id" -> "p11")),
    env("order_detail_activity", "insert", Map("order_detail_id" -> "d1",
      "activity_id" -> "a1", "activity_rule_id" -> "ar1")),
    // order cancel (1003) + refund flow (1005)
    env("order_info", "update", Map("id" -> "o2", "user_id" -> "u2",
      "province_id" -> "p12", "order_status" -> "1003",
      "operate_time" -> "2020-06-14 11:00:00"), Map("order_status" -> "1001")),
    env("order_refund_info", "insert", Map("id" -> "r1", "user_id" -> "u2",
      "order_id" -> "o2", "sku_id" -> "s1", "refund_type" -> "1501",
      "refund_num" -> "1", "refund_amount" -> "100.50",
      "refund_reason_type" -> "1301", "create_time" -> "2020-06-14 12:00:00")),
    env("order_info", "update", Map("id" -> "o2", "province_id" -> "p12",
      "order_status" -> "1005"), Map("order_status" -> "1002")),
    // payment success
    env("payment_info", "update", Map("id" -> "pay1", "order_id" -> "o1",
      "user_id" -> "u1", "payment_type" -> "1102",
      "payment_status" -> "1602", "callback_time" -> "2020-06-14 10:05:00"),
      Map("payment_status" -> "1601")),
    // later update to the already-paid row (callback touched, status
    // unchanged) — must NOT re-emit a payment-success fact
    env("payment_info", "update", Map("id" -> "pay1", "order_id" -> "o1",
      "user_id" -> "u1", "payment_type" -> "1102",
      "payment_status" -> "1602", "callback_time" -> "2020-06-14 10:05:00"),
      Map("callback_content" -> "retry")),
    // coupon lifecycle
    env("coupon_use", "insert", Map("id" -> "cu1", "coupon_id" -> "cp1",
      "user_id" -> "u1", "get_time" -> "2020-06-14 09:00:00")),
    env("coupon_use", "update", Map("id" -> "cu1", "coupon_id" -> "cp1",
      "user_id" -> "u1", "order_id" -> "o1",
      "using_time" -> "2020-06-14 10:00:00"), Map("using_time" -> null)),
    env("coupon_use", "update", Map("id" -> "cu1", "coupon_id" -> "cp1",
      "user_id" -> "u1", "order_id" -> "o1",
      "used_time" -> "2020-06-14 10:05:00"), Map("used_time" -> null)),
    // comment + favor + user register
    env("comment_info", "insert", Map("id" -> "cm1", "user_id" -> "u1",
      "sku_id" -> "s1", "spu_id" -> "sp1", "order_id" -> "o1",
      "appraise" -> "1301", "create_time" -> "2020-06-14 13:00:00")),
    env("favor_info", "insert", Map("id" -> "f1", "user_id" -> "u1",
      "sku_id" -> "s1", "create_time" -> "2020-06-14 13:30:00")),
    env("favor_info", "update", Map("id" -> "f1", "user_id" -> "u1",
      "sku_id" -> "s1", "is_cancel" -> "0", "create_time" -> "2020-06-14 13:31:00"),
      Map("is_cancel" -> "1")),
    env("user_info", "insert", Map("id" -> "u9",
      "create_time" -> "2020-06-14 14:00:00")),
    // dirty line
    "][ not an envelope")

  private lazy val topicDb = Sources.topicDb(Sources.lines(spark, fixtures))

  private lazy val baseDic = Seq(
    ("2401", "user_query"), ("2402", "promo"), ("1102", "wechat"),
    ("1602", "pay_success"), ("1501", "refund_full"), ("1301", "good_review"))
    .toDF("dic_code", "dic_name")

  test("topic_db parse drops dirty rows, keeps envelopes") {
    assert(topicDb.count() == fixtures.length - 1)
    assert(topicDb.filter($"table" === "cart_info").count() == 3)
  }

  test("cartAdd: inserts + qty increases with delta semantics (P2-P4)") {
    val got = DwdDb.cartAdd(topicDb).orderBy("sku_num").collect()
    assert(got.length == 2)
    assert(got.map(_.getAs[Int]("sku_num")).toSeq == Seq(2, 3)) // insert 2, delta 5-2
  }

  test("orderDetail: 4-table join + dic lookup (J1-J3)") {
    val got = DwdDb.orderDetail(topicDb, baseDic).collect()
    assert(got.length == 1)
    val r = got.head
    assert(r.getAs[String]("user_id") == "u1")
    assert(r.getAs[String]("activity_id") == "a1")
    assert(r.getAs[String]("coupon_id") == null) // left join null-pad
    assert(r.getAs[String]("source_type_name") == "user_query")
    assert(r.getAs[java.math.BigDecimal]("split_original_amount")
      .compareTo(new java.math.BigDecimal("201.00")) == 0)
  }

  test("cancelDetail: status transition 1003 (P5)") {
    val got = DwdDb.cancelDetail(topicDb).collect()
    assert(got.map(_.getAs[String]("id")).toSeq == Seq("o2"))
  }

  test("payDetailSuc: 1602 transition only, not already-paid updates (P5, J3)") {
    val got = DwdDb.payDetailSuc(topicDb, baseDic).collect()
    assert(got.length == 1) // the callback-retry update is suppressed
    assert(got.head.getAs[String]("payment_type_name") == "wechat")
  }

  test("orderAdd: insert-type projection of the order-detail wide row") {
    val got = DwdDb.orderAdd(topicDb, baseDic).collect()
    assert(got.length == 1)
    val r = got.head
    assert(r.getAs[String]("detail_id") == "d1")
    assert(r.getAs[String]("user_id") == "u1")
    assert(r.getAs[String]("source_type_name") == "user_query")
    assert(!got.head.schema.fieldNames.contains("order_id_i"))
  }

  test("orderRefund: refund join + double-aliased dic (P6, J4, J5)") {
    val got = DwdDb.orderRefund(topicDb, baseDic).collect()
    assert(got.length == 1)
    val r = got.head
    assert(r.getAs[String]("province_id") == "p12")
    assert(r.getAs[String]("refund_type_name") == "refund_full")
    assert(r.getAs[String]("refund_reason_type_name") == "good_review")
    assert(r.getAs[String]("date_id") == "2020-06-14")
  }

  test("coupon get/order/pay: changed-key-set detection (P6)") {
    assert(DwdDb.couponGet(topicDb).count() == 1)
    val order = DwdDb.couponOrder(topicDb).collect()
    assert(order.length == 1 && order.head.getAs[String]("using_time") != null)
    val pay = DwdDb.couponPay(topicDb).collect()
    assert(pay.length == 1 && pay.head.getAs[String]("used_time") != null)
  }

  test("comment, favorAdd, userRegister") {
    assert(DwdDb.comment(topicDb, baseDic).collect()
      .head.getAs[String]("appraise_name") == "good_review")
    assert(DwdDb.favorAdd(topicDb).count() == 2) // insert + re-favor
    val reg = DwdDb.userRegister(topicDb).collect()
    assert(reg.length == 1 && reg.head.getAs[String]("date_id") == "2020-06-14")
  }

  test("DimRouter: config-driven routing, column pruning, pk dedup (J7, K4)") {
    val config = Seq(
      ("cart_info", "dim_cart", "id,user_id,sku_num", "id"),
      ("user_info", "dim_user", "id,create_time", ""))
      .toDF("source_table", "sink_table", "sink_columns", "sink_pk")
    val rules = DimRouter.parseConfig(config)
    assert(rules.find(_.sinkTable == "dim_user").get.sinkPk == "id")
    val routed = DimRouter.route(topicDb, config)
    val frames = DimRouter.dimFrames(routed, rules)
    val cart = frames("dim_cart").frame
    // configured columns + retained binlog-order columns for merge
    assert(cart.columns.toSeq ==
      Seq("id", "user_id", "sku_num", "_ts", "_xid", "_xoffset"))
    // 3 cart envelopes for id c1 → keep-latest leaves exactly 1 row
    assert(cart.count() == 1)
    assert(frames("dim_user").frame.count() == 1)
  }

  test("DWS: province order window with exact distinct orders (A4)") {
    val od = DwdDb.orderDetail(topicDb, baseDic)
      .withColumn("event_time", to_timestamp(col("create_time")))
    val got = DwsWindows.provinceOrderWindow(od).collect()
    assert(got.length == 1)
    assert(got.head.getAs[Long]("order_count") == 1L)
  }

  test("DWS: keyword window tokenizes CJK + latin (U1, A3)") {
    val pages = Seq(
      ("""search""", """keyword""", "Apple 手机 pro", 1651234567000L),
      (null, """keyword""", "ignored", 1651234568000L))
      .toDF("last_page_id", "item_type", "item", "ts")
      .select(struct(col("last_page_id"), col("item_type"), col("item")).as("page"),
        col("ts"))
    val got = DwsWindows.keywordWindow(pages).collect()
    val kws = got.map(_.getAs[String]("keyword")).toSet
    assert(kws == Set("apple", "pro", "手机"))
  }

  test("DWS globalWindow + serving tradeStats/userChange round trip (A2, §2.10)") {
    val orders = Seq(
      ("u1", 100.0, 20.0, 5.0, 1651234567000L),
      ("u2", 50.0, 0.0, 0.0, 1651234568000L))
      .toDF("user_id", "origin", "act", "cou", "ts")
      .withColumn("event_time", (col("ts") / 1000).cast("timestamp"))
    val dws = DwsWindows.globalWindow(orders, "event_time",
      "order_origin_total_amount" -> col("origin"),
      "order_activity_reduce_amount" -> col("act"),
      "order_coupon_reduce_amount" -> col("cou"),
      "order_unique_user_count" -> lit(1L))
    val stats = ServingQueries.tradeStats(dws, 20220429) // 2022-04-29 UTC
    val m = stats.collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(m("order_amount") == 150.0)
    assert(m("activity_amount") == 20.0)
    assert(m("order_uu_count") == 2.0)
  }

  test("Tokenize handles single CJK char and punctuation") {
    assert(graft.functions.Tokenize.split("华") == Seq("华"))
    assert(graft.functions.Tokenize.split("a-b c") == Seq("a", "b", "c"))
    assert(graft.functions.Tokenize.split("小米手机") == Seq("小米", "米手", "手机"))
    assert(graft.functions.Tokenize.split(null) == Seq.empty)
  }
}
