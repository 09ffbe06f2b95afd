package graft.apps

import graft.TestSpark
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalatest.funsuite.AnyFunSuite

class TradePipelineSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def env(table: String, ts: Long, data: (String, String)*): String = {
    val d = data.map { case (k, v) => "\"" + k + "\":\"" + v + "\"" }
      .mkString("{", ",", "}")
    s"""{"database":"g","table":"$table","type":"insert","ts":$ts,""" +
      s""""xid":1,"xoffset":1,"data":$d,"old":null}"""
  }

  test("streaming 4-table order-detail join: inner match + left null-pad") {
    implicit val ctx = spark.sqlContext
    val baseDic = Seq(("2401", "user_query")).toDF("dic_code", "dic_name")
    val mem = MemoryStream[String]
    val out = TradePipeline.orderDetailStream(
      graft.sources.Sources.topicDb(mem.toDF().toDF("value")), baseDic)
    val q = out.writeStream.format("memory").queryName("trade_out")
      .outputMode("append").start()
    try {
      // batch 1: detail only — no emission (inner join pending)
      mem.addData(env("order_detail", 1000,
        "id" -> "d1", "order_id" -> "o1", "sku_id" -> "s1", "sku_num" -> "2",
        "order_price" -> "10.00", "split_total_amount" -> "18.00",
        "source_type" -> "2401"))
      q.processAllAvailable()
      assert(spark.table("trade_out").count() == 0)
      // batch 2: matching order_info + activity within retention
      mem.addData(
        env("order_info", 1005, "id" -> "o1", "user_id" -> "u1",
          "province_id" -> "p1"),
        env("order_detail_activity", 1002, "order_detail_id" -> "d1",
          "activity_id" -> "act9"))
      q.processAllAvailable()
      // batch 3+: far-future envelopes push the watermark past the join
      // window so the unmatched coupon leg null-pads and the row emits
      mem.addData(env("order_info", 10000, "id" -> "oX", "user_id" -> "uX",
        "province_id" -> "pX"))
      q.processAllAvailable()
      mem.addData(env("order_detail", 20000, "id" -> "dY", "order_id" -> "oY",
        "sku_id" -> "sY", "sku_num" -> "1", "order_price" -> "1.00",
        "split_total_amount" -> "1.00", "source_type" -> "2401"))
      q.processAllAvailable()
      mem.addData(env("order_info", 30000, "id" -> "oZ", "user_id" -> "uZ",
        "province_id" -> "pZ"))
      q.processAllAvailable()
      val rows = spark.table("trade_out").collect()
      assert(rows.nonEmpty, "joined row should emit after watermark passes")
      val r = rows.find(_.getAs[String]("detail_id") == "d1").get
      assert(r.getAs[String]("user_id") == "u1")
      assert(r.getAs[String]("activity_id") == "act9")
      assert(r.getAs[String]("coupon_id") == null) // left null-pad
      assert(r.getAs[String]("source_type_name") == "user_query")
    } finally q.stop()
  }
}
