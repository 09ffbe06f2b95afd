package graft.streaming

import graft.TestSpark
import org.scalatest.funsuite.AnyFunSuite

class LogSplitSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  // FIXTURES.md §1 shapes
  private val fullLine =
    """{"common":{"ar":"110000","ch":"xiaomi","is_new":"1","mid":"mid_001","uid":"21","vc":"v2.1"},
      |"page":{"during_time":12000,"item":"phone","item_type":"keyword","last_page_id":"search","page_id":"good_list"},
      |"displays":[{"display_type":"query","item":"5","item_type":"sku_id","order":1,"pos_id":3},
      |            {"display_type":"promo","item":"6","item_type":"sku_id","order":2,"pos_id":4}],
      |"actions":[{"action_id":"cart_add","item":"5","item_type":"sku_id","ts":1651234567000}],
      |"ts":1651234567000}""".stripMargin.replaceAll("\n", "")
  private val startLine =
    """{"common":{"mid":"mid_002","is_new":"1"},"start":{"entry":"icon","loading_time":5000,"open_ad_id":7,"open_ad_ms":2870,"open_ad_skip_ms":0},"ts":1651234568000}"""
  private val errLine =
    """{"common":{"mid":"mid_003"},"page":{"page_id":"home"},"err":{"error_code":2633,"msg":"boom"},"ts":1651234569000}"""
  private val entryLine =
    """{"common":{"mid":"mid_001"},"page":{"page_id":"home","during_time":1000},"ts":1651234570000}"""
  private val dirtyLine = "not json {"

  private lazy val parsed = LogSplit.parse(
    Seq(fullLine, startLine, errLine, entryLine, dirtyLine).toDF("value"))

  test("dirty lines go to the dead-letter branch") {
    assert(LogSplit.dirty(parsed).as[String].collect().toSeq == Seq(dirtyLine))
  }

  test("page branch keeps rows with a page payload") {
    val pages = LogSplit.pageLog(parsed)
    assert(pages.count() == 3) // fullLine, errLine, entryLine
    assert(pages.select("page.page_id").as[String].collect().toSet ==
      Set("good_list", "home"))
  }

  test("start branch") {
    val st = LogSplit.startLog(parsed)
    assert(st.count() == 1)
    assert(st.select("start.entry").as[String].head() == "icon")
  }

  test("err branch") {
    assert(LogSplit.errLog(parsed).select("err.error_code").as[Long].head() == 2633L)
  }

  test("displays explode with page_id + ts enrichment") {
    val d = LogSplit.displayLog(parsed)
    assert(d.count() == 2)
    val row = d.filter($"item" === "5").head()
    assert(row.getAs[String]("page_id") == "good_list")
    assert(row.getAs[Long]("ts") == 1651234567000L)
    assert(row.getAs[Long]("order") == 1L)
  }

  test("actions explode") {
    val a = LogSplit.actionLog(parsed)
    assert(a.count() == 1)
    assert(a.select("action_id").as[String].head() == "cart_add")
  }

  test("session entries = last_page_id null") {
    val e = LogSplit.sessionEntries(LogSplit.pageLog(parsed))
    assert(e.count() == 2) // errLine (no last_page_id), entryLine
  }
}
