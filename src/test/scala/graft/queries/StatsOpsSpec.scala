package graft.queries

import graft.TestSpark
import org.scalatest.funsuite.AnyFunSuite

/** q203/q204/q209 re-derivations against literal driver-side scans. */
class StatsOpsSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  private val sf = "/root/testdata/sf0.001"

  private def cents(v: Double): Long =
    java.math.BigDecimal.valueOf(v)
      .setScale(2, java.math.RoundingMode.HALF_UP)
      .movePointRight(2).longValueExact

  private def daily: Seq[(Long, Long)] =
    graft.Tables.events(spark, sf)
      .selectExpr("unix_micros(ts) AS tsu", "value").collect()
      .map(r => (r.getLong(0) / 86400000000L, cents(r.getDouble(1))))
      .groupBy(_._1).view.mapValues(_.map(_._2).sum)
      .toSeq.sortBy(_._1)

  test("q203 ≡ driver CUSUM over the daily series") {
    val ds = daily
    val d = ds.length.toLong
    val t = ds.map(_._2).sum
    var cum = 0L
    val excursions = ds.map { case (day, s) =>
      cum += s * d - t; (day, math.abs(cum))
    }
    val mx = excursions.map(_._2).max
    val cpDay = excursions.filter(_._2 == mx).map(_._1).min
    val r = StatsOps.cusumChangepoint(spark, sf).collect().head
    assert(r.getLong(0) == d)
    assert(r.getLong(1) == t)
    assert(r.getLong(2) == cpDay)
    assert(r.getLong(3) == mx * 1000000L / (d * t))
  }

  test("q204 dow indices partition the total; weighted mean is 1e6-ish") {
    val rows = StatsOps.dowSeasonality(spark, sf).collect()
    assert(rows.length == 7)
    val ds = daily
    assert(rows.map(_.getLong(1)).sum == ds.length)
    assert(rows.map(_.getLong(2)).sum == ds.map(_._2).sum)
    // each index re-derived: sum_dow * D * 1e6 / (days_dow * T)
    val t = ds.map(_._2).sum
    val byDow = ds.groupBy { case (day, _) => (day + 4) % 7 }
    rows.foreach { r =>
      val g = byDow(r.getLong(0))
      assert(r.getLong(3) ==
        g.map(_._2).sum * ds.length * 1000000L / (g.length * t))
    }
  }

  test("q209 ≡ driver median/MAD/Hampel per segment") {
    val cts = spark.read.parquet(s"$sf/customer.parquet")
      .select("c_mktsegment", "c_acctbal").collect()
      .map(r => (r.getString(0), cents(r.getDouble(1))))
      .groupBy(_._1).view.mapValues(_.map(_._2).toSeq).toMap
    def lowerMedian(xs: Seq[Long]): Long = {
      val s = xs.sorted
      s(((s.length + 1) / 2) - 1)
    }
    val got = StatsOps.madOutliers(spark, sf).collect()
      .map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))).toMap
    assert(got.keySet == cts.keySet)
    cts.foreach { case (seg, xs) =>
      val med = lowerMedian(xs)
      val mad = lowerMedian(xs.map(x => math.abs(x - med)))
      val out = xs.count(x => math.abs(x - med) > 3 * mad)
      assert(got(seg) == ((xs.length.toLong, med, mad, out.toLong)))
    }
  }
}
