package graft.dws

import graft.TestSpark
import graft.dwd.DwdDb
import graft.sources.Sources
import graft.streaming.KeyedEvent
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class DwsJobsSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private val Day = 24L * 3600 * 1000

  test("homeDetailPageView counts first-of-day visitors per page") {
    val pages = Seq(
      ("m1", "home", 1000L), ("m1", "home", 2000L), // same day dup
      ("m1", "good_detail", 3000L),
      ("m2", "home", 4000L),
      ("m1", "home", Day + 1000L)) // next day
      .toDF("mid", "page_id", "ts")
      .select(struct(col("mid")).as("common"),
        struct(col("page_id"), lit(null).cast("string").as("last_page_id")).as("page"),
        col("ts"))
    val got = DwsJobs.homeDetailPageView(pages).agg(
      sum("home_uv_ct"), sum("good_detail_uv_ct")).head()
    assert(got.getLong(0) == 3L) // m1 day1, m2 day1, m1 day2
    assert(got.getLong(1) == 1L)
  }

  test("userLogin window counts uu and back") {
    val logins = Seq(
      KeyedEvent("u1", 1000L, "a"),
      KeyedEvent("u1", 9 * Day + 1000L, "b"), // back after 9 days
      KeyedEvent("u2", 9 * Day + 2000L, "c")).toDS()
    val got = DwsJobs.userLogin(logins).agg(sum("uu_ct"), sum("back_ct")).head()
    assert(got.getLong(0) == 3L)
    assert(got.getLong(1) == 1L)
  }

  test("tradeOrder window: uu count + exact amounts from DWD order detail") {
    val baseDic = Seq(("2401", "q")).toDF("dic_code", "dic_name")
    val envs = Seq(
      """{"database":"g","table":"order_detail","type":"insert","ts":100,"xid":1,"xoffset":0,"data":{"id":"d1","order_id":"o1","sku_id":"s1","sku_num":"2","order_price":"10.00","split_total_amount":"18.00","split_activity_amount":"2.00","source_type":"2401","create_time":"2020-06-14 10:00:00"},"old":null}""",
      """{"database":"g","table":"order_detail","type":"insert","ts":101,"xid":1,"xoffset":1,"data":{"id":"d2","order_id":"o2","sku_id":"s1","sku_num":"1","order_price":"5.00","split_total_amount":"5.00","source_type":"2401","create_time":"2020-06-14 10:00:01"},"old":null}""",
      """{"database":"g","table":"order_info","type":"insert","ts":100,"xid":1,"xoffset":2,"data":{"id":"o1","user_id":"u1","province_id":"p1"},"old":null}""",
      """{"database":"g","table":"order_info","type":"insert","ts":101,"xid":1,"xoffset":3,"data":{"id":"o2","user_id":"u1","province_id":"p1"},"old":null}""")
    val od = DwdDb.orderDetail(Sources.topicDb(Sources.lines(spark, envs)), baseDic)
    val got = DwsJobs.tradeOrder(od).collect()
    assert(got.length == 1) // ts 100/101 s → same 10 s window
    val r = got.head
    assert(r.getAs[Long]("order_unique_user_count") == 1L) // u1 deduped
    assert(r.getAs[java.math.BigDecimal]("order_origin_total_amount")
      .compareTo(new java.math.BigDecimal("25.00")) == 0) // 2*10 + 1*5
    assert(r.getAs[java.math.BigDecimal]("order_activity_reduce_amount")
      .compareTo(new java.math.BigDecimal("2.00")) == 0)
  }

  test("provinceOrder + snowflake tm/category rollup") {
    val baseDic = Seq(("2401", "q")).toDF("dic_code", "dic_name")
    val envs = Seq(
      """{"database":"g","table":"order_detail","type":"insert","ts":100,"xid":1,"xoffset":0,"data":{"id":"d1","order_id":"o1","sku_id":"s1","sku_num":"1","order_price":"10.00","split_total_amount":"10.00","source_type":"2401","create_time":"2020-06-14 10:00:00"},"old":null}""",
      """{"database":"g","table":"order_info","type":"insert","ts":100,"xid":1,"xoffset":1,"data":{"id":"o1","user_id":"u1","province_id":"p1"},"old":null}""")
    val od = DwdDb.orderDetail(Sources.topicDb(Sources.lines(spark, envs)), baseDic)
    assert(DwsJobs.provinceOrder(od).head().getAs[Long]("order_count") == 1L)

    val sku = Seq(("s1", "sp1", "t1", "c3")).toDF("id", "spu_id", "tm_id", "category3_id")
    val spu = Seq(("sp1", "spu one")).toDF("id", "spu_name")
    val tm = Seq(("t1", "acme")).toDF("id", "tm_name")
    val c3 = Seq(("c3", "phones", "c2")).toDF("id", "name", "category2_id")
    val c2 = Seq(("c2", "electronics", "c1")).toDF("id", "name", "category1_id")
    val c1 = Seq(("c1", "goods")).toDF("id", "name")
    val rolled = DwsJobs.tmCategoryUserSpuOrder(od, sku, spu, tm, c3, c2, c1)
    val r = rolled.head()
    assert(r.getAs[String]("tm_name") == "acme")
    assert(r.getAs[String]("category1_name") == "goods")
    assert(r.getAs[Long]("order_count") == 1L)
  }
}
