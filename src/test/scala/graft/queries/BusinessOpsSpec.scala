package graft.queries

import graft.TestSpark
import org.scalatest.funsuite.AnyFunSuite

/** q196/q198/q199 re-derivations against literal driver-side scans. */
class BusinessOpsSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  private val sf = "/root/testdata/sf0.001"

  test("q196 ≡ driver conversion-lag scan with literal order statistics") {
    val ev = graft.Tables.events(spark, sf)
      .selectExpr("user_id", "unix_micros(ts) AS tsu", "event_type", "value")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2), r.getDouble(3)))
    val lags = ev.groupBy(_._1).values.flatMap { es =>
      val touch = es.filter(e => e._3 == "view" || e._3 == "click")
        .map(_._2).minOption
      val conv = es.filter(e => e._3 == "purchase" && e._4 > 90)
        .map(_._2).minOption
      (touch, conv) match {
        case (Some(t), Some(c)) if c >= t => Some((c - t) / 3600000000L)
        case _ => None
      }
    }.toSeq.sorted
    def pct(p: Int) = lags(((lags.length - 1) * p) / 100)
    val r = BusinessOps.timeToConvert(spark, sf).collect().head
    assert(r.getLong(0) == lags.length)
    assert(r.getLong(1) == pct(50))
    assert(r.getLong(2) == pct(90))
    assert(r.getLong(3) == lags.max)
    assert(lags.nonEmpty && pct(50) <= pct(90))
  }

  test("q198 ≡ brute-force within-order pair census") {
    val li = spark.read.parquet(s"$sf/lineitem.parquet")
      .select("l_orderkey", "l_partkey").collect()
      .map(r => (r.getLong(0), r.getLong(1))).distinct
    val counts = li.groupBy(_._1).values.flatMap { parts =>
      val ps = parts.map(_._2).distinct.sorted
      for (i <- ps.indices; j <- i + 1 until ps.length) yield (ps(i), ps(j))
    }.groupBy(identity).view.mapValues(_.size.toLong).toSeq
    val expected = counts.sortBy { case ((a, b), n) => (-n, a, b) }.take(20)
      .map { case ((a, b), n) => (a, b, n) }
    val got = BusinessOps.copurchasePairs(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    assert(got == expected)
    assert(got.head._3 >= got.last._3)
  }

  test("q199 ≡ driver Gini over customer cents; bounded in [0, 1e6)") {
    import java.math.{BigDecimal => JBD, RoundingMode}
    val cents = spark.read.parquet(s"$sf/orders.parquet")
      .select("o_custkey", "o_totalprice").collect()
      .map(r => (r.getLong(0),
        JBD.valueOf(r.getDouble(1)).setScale(2, RoundingMode.HALF_UP)
          .movePointRight(2).longValueExact))
      .groupBy(_._1).view.mapValues(_.map(_._2).sum).toSeq
      .sortBy { case (k, v) => (v, k) }.map(_._2)
    val n = cents.length.toLong
    val sx = cents.map(BigInt(_)).sum
    val ri = cents.zipWithIndex.map { case (x, i) => BigInt(i + 1) * x }.sum
    val gini = ((ri * 2 - (BigInt(n) + 1) * sx) * 1000000 / (BigInt(n) * sx))
      .toLong
    val r = BusinessOps.revenueGini(spark, sf).collect().head
    assert(r.getLong(0) == n)
    assert(r.getLong(1) == sx.toLong)
    assert(r.getLong(2) == gini)
    assert(gini >= 0 && gini < 1000000)
  }
}
