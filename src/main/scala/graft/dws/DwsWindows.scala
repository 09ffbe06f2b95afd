package graft.dws

import graft.functions.Tokenize
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** DWS windowed aggregations (SURVEY.md §2.5 A1–A4) — 10 s tumbling
  * event-time windows over the DWD streams, one function per reference
  * job family. All take/return DataFrames so batch fixtures and streaming
  * frames share the code; in streaming, callers attach
  * `withWatermark(tsCol, "2 seconds")` upstream (the reference's bounded
  * out-of-orderness, §2.9).
  *
  * Scale notes: windowed groupBy is a hash partial/final aggregation —
  * map-side combine happens before the shuffle, and the `window` struct
  * is just two derived columns, so a 10 s window over 100 TB/day shuffles
  * only (groups × windows) rows. The keyless "windowAll" variants (A2)
  * parallelize the partial agg where Flink pinned parallelism 1.
  */
object DwsWindows {

  val WindowSize = "10 seconds"

  private def tumble(tsCol: Column): Column = window(tsCol, WindowSize)

  private def stt(df: DataFrame): DataFrame =
    df.select(col("window.start").as("stt"), col("window.end").as("edt"),
      col("*")).drop("window")

  /** A1 (ref DwsTrafficVcChArIsNewPageViewWindow.java:126-180): per
    * (vc, ch, ar, is_new) sums of uv/sv/pv/dur/uj over the 3-way union
    * (O3) of page views, unique-visitor emissions and bounce emissions.
    * Inputs carry bean columns (uv_ct, sv_ct, pv_ct, dur_sum, uj_ct); use
    * [[trafficPageBean]]/[[trafficUvBean]]/[[trafficUjBean]] to build them. */
  def trafficChannelPageView(beans: DataFrame, tsCol: String = "event_time")
      : DataFrame =
    stt(beans
      .groupBy(tumble(col(tsCol)), col("vc"), col("ch"), col("ar"), col("is_new"))
      .agg(sum("uv_ct").as("uv_ct"), sum("sv_ct").as("sv_ct"),
        sum("pv_ct").as("pv_ct"), sum("dur_sum").as("dur_sum"),
        sum("uj_ct").as("uj_ct")))

  /** Page-view bean rows: sv = session entry, pv = 1, dur from page
    * (ref TrafficPageViewBean construction, BaseLogApp output). */
  def trafficPageBean(pageLog: DataFrame): DataFrame =
    pageLog.select(
      col("common.vc").as("vc"), col("common.ch").as("ch"),
      col("common.ar").as("ar"), col("common.is_new").as("is_new"),
      lit(0L).as("uv_ct"),
      when(col("page.last_page_id").isNull, 1L).otherwise(0L).as("sv_ct"),
      lit(1L).as("pv_ct"),
      coalesce(col("page.during_time"), lit(0L)).as("dur_sum"),
      lit(0L).as("uj_ct"),
      (col("ts") / 1000).cast("timestamp").as("event_time"))

  def trafficUvBean(uvLog: DataFrame): DataFrame =
    uvLog.select(col("common.vc").as("vc"), col("common.ch").as("ch"),
      col("common.ar").as("ar"), col("common.is_new").as("is_new"),
      lit(1L).as("uv_ct"), lit(0L).as("sv_ct"), lit(0L).as("pv_ct"),
      lit(0L).as("dur_sum"), lit(0L).as("uj_ct"),
      (col("ts") / 1000).cast("timestamp").as("event_time"))

  def trafficUjBean(bounces: DataFrame): DataFrame =
    bounces.select(col("vc"), col("ch"), col("ar"), col("is_new"),
      lit(0L).as("uv_ct"), lit(0L).as("sv_ct"), lit(0L).as("pv_ct"),
      lit(0L).as("dur_sum"), lit(1L).as("uj_ct"),
      (col("ts") / 1000).cast("timestamp").as("event_time"))

  /** A3/U1 (ref DwsTrafficSourceKeywordPageViewWindow.java:61-81):
    * search-keyword tokenize (LATERAL TABLE analog) + windowed count. */
  def keywordWindow(pageLog: DataFrame): DataFrame =
    stt(pageLog
      .filter(col("page.last_page_id") === "search" &&
        col("page.item_type") === "keyword" && col("page.item").isNotNull)
      .select(explode(Tokenize.tokenize(col("page.item"))).as("keyword"),
        (col("ts") / 1000).cast("timestamp").as("event_time"))
      .groupBy(tumble(col("event_time")), col("keyword"))
      .agg(count(lit(1)).as("keyword_count"))
      .withColumn("source", lit("SEARCH")))

  /** A2 (ref the six windowAll jobs, e.g. DwsUserUserRegisterWindow
    * .java:68-88): keyless tumbling window over flag columns — each
    * `flags` entry becomes `sum(expr) as name`. */
  def globalWindow(df: DataFrame, tsCol: String, flags: (String, Column)*)
      : DataFrame = {
    val aggs = flags.map { case (name, c) => sum(c).as(name) }
    stt(df.groupBy(tumble(col(tsCol))).agg(aggs.head, aggs.tail: _*))
  }

  /** A4 (ref DwsTradeProvinceOrderWindow.java:56-112): per-province
    * window with EXACT distinct order count via set union — `collect_set`
    * is the reference's `Set<String>` buffer; swap to
    * approx_count_distinct at extreme cardinality. */
  def provinceOrderWindow(orderDetail: DataFrame, tsCol: String = "event_time")
      : DataFrame =
    stt(orderDetail
      .groupBy(tumble(col(tsCol)), col("province_id"))
      .agg(size(collect_set(col("order_id"))).cast("long").as("order_count"),
        sum(col("split_total_amount").cast("decimal(16,2)")).as("order_amount")))

  /** provinceOrderWindow + post-aggregation dim name join — the
    * reference attaches provinceName AFTER the window agg
    * (DwsTradeProvinceOrderWindow.java:115-130); serving queries expect
    * `province_name`. */
  def provinceOrderWindowNamed(orderDetail: DataFrame, dimProvince: DataFrame,
      tsCol: String = "event_time"): DataFrame =
    provinceOrderWindow(orderDetail, tsCol)
      .join(broadcast(dimProvince.select(col("id").as("province_id"),
        col("name").as("province_name"))), Seq("province_id"), "left")

  /** J6 (ref DwsTradeTrademarkCategoryUserSpuOrderWindow.java:88-199):
    * the 6-deep async dim chain as ONE multi-way broadcast hash join —
    * sku → spu → trademark → category3 → category2 → category1. Dim
    * frames are the all-string DIM tables (FIXTURES.md §5). */
  def snowflakeDimJoin(facts: DataFrame, skuInfo: DataFrame, spuInfo: DataFrame,
      trademark: DataFrame, cat3: DataFrame, cat2: DataFrame, cat1: DataFrame)
      : DataFrame =
    facts
      .join(broadcast(skuInfo.select(col("id").as("sku_id"),
        col("spu_id"), col("tm_id"), col("category3_id"))), Seq("sku_id"), "left")
      .join(broadcast(spuInfo.select(col("id").as("spu_id"),
        col("spu_name"))), Seq("spu_id"), "left")
      .join(broadcast(trademark.select(col("id").as("tm_id"),
        col("tm_name"))), Seq("tm_id"), "left")
      .join(broadcast(cat3.select(col("id").as("category3_id"),
        col("name").as("category3_name"), col("category2_id"))),
        Seq("category3_id"), "left")
      .join(broadcast(cat2.select(col("id").as("category2_id"),
        col("name").as("category2_name"), col("category1_id"))),
        Seq("category2_id"), "left")
      .join(broadcast(cat1.select(col("id").as("category1_id"),
        col("name").as("category1_name"))), Seq("category1_id"), "left")
}
