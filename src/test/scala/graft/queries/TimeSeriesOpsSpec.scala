package graft.queries

import graft.TestSpark
import org.scalatest.funsuite.AnyFunSuite

/** q179–q181 re-derivations. sf0.01 for the anomaly test — that scale
  * actually has out-of-fence days (sf0.001 has none; every day there
  * labels `normal`, which the non-empty-result contract relies on).
  */
class TimeSeriesOpsSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private def daily(sf: String): Map[Long, Long] =
    graft.Tables.events(spark, sf)
      .selectExpr("CAST(to_date(ts) AS STRING) as d").collect()
      .map(r => java.time.LocalDate.parse(r.getString(0)).toEpochDay)
      .groupBy(p => p).view.mapValues(_.length.toLong).toMap

  test("q179 flags exactly the out-of-Tukey-fence days") {
    val sf = "/root/testdata/sf0.01"
    val counts = daily(sf)
    val sorted = counts.values.toSeq.sorted
    def pct(p: Int) = sorted(((sorted.length - 1) * p) / 100)
    val (q1, q3) = (pct(25), pct(75))
    val iqr = q3 - q1
    val expected = counts.map { case (day, c) =>
      day -> ((c,
        if (c * 4 < q1 * 4 - iqr * 6) "low"
        else if (c * 4 > q3 * 4 + iqr * 6) "high"
        else "normal"))
    }
    val got = TimeSeriesOps.anomalyDays(spark, sf).collect()
      .map(r => (r.getDate(0).toLocalDate.toEpochDay,
        (r.getLong(1), r.getString(2))))
      .map { case (d, v) => d -> v }.toMap
    assert(got == expected)
    assert(expected.exists(_._2._2 != "normal"), "sf0.01 has anomalous days")
  }

  test("q180 slope equals the exact least-squares rational") {
    val sf = "/root/testdata/sf0.001"
    val counts = daily(sf)
    val d0 = counts.keys.min
    val xs = counts.toSeq.map { case (d, c) => (d - d0, c) }
    val n = xs.length.toLong
    val (sxy, sx, sy, sxx) = (
      xs.map(p => p._1 * p._2).sum, xs.map(_._1).sum,
      xs.map(_._2).sum, xs.map(p => p._1 * p._1).sum)
    val r = TimeSeriesOps.trendSlope(spark, sf).collect().head
    assert(r.getLong(0) == n)
    assert(r.getLong(1) == n * sxy - sx * sy)
    assert(r.getLong(2) == n * sxx - sx * sx)
    assert(r.getLong(3) == (n * sxy - sx * sy) * 1000000L / (n * sxx - sx * sx))
  }

  test("q181 EWMA equals the sequential fold") {
    val sf = "/root/testdata/sf0.001"
    val byType = graft.Tables.events(spark, sf)
      .selectExpr("event_type", "CAST(to_date(ts) AS STRING) as d").collect()
      .map(r => (r.getString(0), java.time.LocalDate.parse(r.getString(1)).toEpochDay))
      .groupBy(_._1).view.mapValues { rs =>
        rs.groupBy(_._2).view.mapValues(_.length.toLong).toSeq.sortBy(_._1)
          .map(_._2)
      }.toMap
    val expected = byType.map { case (t, series) =>
      t -> ((series.length.toLong, series.last,
        series.tail.foldLeft(series.head)((s, c) => (3 * s + c) / 4)))
    }
    val got = TimeSeriesOps.ewma(spark, sf).collect()
      .map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    assert(got == expected)
  }
}
