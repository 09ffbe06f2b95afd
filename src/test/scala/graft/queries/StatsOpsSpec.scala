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

  test("q213 ≡ driver BigInt CV² per event type") {
    val ev = graft.Tables.events(spark, sf)
      .selectExpr("user_id", "event_type", "event_id",
        "unix_micros(ts) AS tsu").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3)))
    val gaps = ev.groupBy(e => (e._1, e._2)).values.flatMap { es =>
      val s = es.sortBy(e => (e._4, e._3))
      s.zip(s.tail).map { case (a, b) => (a._2, (b._4 - a._4) / 1000000L) }
    }.toSeq.groupBy(_._1)
    val got = StatsOps.burstiness(spark, sf).collect()
      .map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    assert(got.keySet == gaps.keySet)
    gaps.foreach { case (t, gs) =>
      val n = BigInt(gs.length)
      val s1 = gs.map(g => BigInt(g._2)).sum
      val s2 = gs.map(g => BigInt(g._2) * g._2).sum
      assert(got(t) == ((gs.length.toLong, (s1 / n).toLong,
        ((n * s2 - s1 * s1) * 1000000 / (s1 * s1)).toLong)), t)
    }
  }

  test("q230 ≡ driver Poisson bootstrap; ordered band") {
    import java.math.{BigDecimal => JBD, RoundingMode}
    val P = 36028797018963913L
    def poly(g: String): Long =
      g.codePoints().toArray.foldLeft(0L)((h, c) => (h * 131 + c % 256) % P)
    val H = 2147483647L
    val t0 = (H * math.exp(-1.0)).toLong
    val t1 = (H * 2.0 * math.exp(-1.0)).toLong
    val t2 = (H * 2.5 * math.exp(-1.0)).toLong
    val rev = spark.read.parquet(s"$sf/orders.parquet")
      .select("o_custkey", "o_totalprice").collect()
      .map(r => (r.getLong(0),
        JBD.valueOf(r.getDouble(1)).setScale(2, RoundingMode.HALF_UP)
          .movePointRight(2).longValueExact))
      .groupBy(_._1).view.mapValues(_.map(_._2).sum).toSeq
    val repMeans = (0 until 32).map { b =>
      val ws = rev.map { case (k, c) =>
        val h = poly(s"$k:$b:boot") % H
        val w = if (h < t0) 0L else if (h < t1) 1L
                else if (h < t2) 2L else 3L
        (w, w * c)
      }
      ws.map(_._2).sum / ws.map(_._1).sum
    }.sorted
    val r = StatsOps.poissonBootstrap(spark, sf).collect().head
    assert(r.getLong(0) == 32L)
    assert(r.getLong(1) == rev.map(_._2).sum / rev.length)
    assert(r.getLong(2) == repMeans(0))   // rank 1 of 32 (B/20 = 1)
    assert(r.getLong(3) == repMeans(30))  // rank 31 of 32
    assert(r.getLong(2) <= r.getLong(3))
    // the band brackets the truth on this corpus (deterministic)
    assert(r.getLong(2) <= r.getLong(1) && r.getLong(1) <= r.getLong(3))
  }

  test("q232 ≡ driver Theil–Sen; robust vs LS on the same series") {
    val ds = daily
    val slopes = (for {
      i <- ds.indices; j <- (i + 1) until ds.length
    } yield (ds(j)._2 - ds(i)._2) * 1000000L /
        (ds(j)._1 - ds(i)._1)).sorted
    val r = StatsOps.theilSen(spark, sf).collect().head
    assert(r.getLong(0) == ds.length)
    assert(r.getLong(1) == slopes.length)
    assert(r.getLong(2) == slopes((slopes.length + 1) / 2 - 1))
  }

  test("q233 conformal: coverage ≥ 90% by construction; ≡ driver") {
    import java.math.{BigDecimal => JBD, RoundingMode}
    val c = spark.read.parquet(s"$sf/customer.parquet")
      .select("c_mktsegment", "c_acctbal").collect()
      .map(r => (r.getString(0),
        JBD.valueOf(r.getDouble(1)).setScale(2, RoundingMode.HALF_UP)
          .movePointRight(2).longValueExact))
    val exp = c.groupBy(_._1).view.mapValues { xs =>
      val mu = xs.map(_._2).sum / xs.length
      val rs = xs.map(x => math.abs(x._2 - mu) / 100).sorted
      val r90 = rs(((xs.length * 9 + 9) / 10) - 1)
      val cov = rs.count(_ <= r90).toLong * 1000000L / xs.length
      (xs.length.toLong, mu, r90, cov)
    }.toMap
    val got = StatsOps.conformal(spark, sf).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4)))).toMap
    assert(got == exp)
    got.values.foreach { case (_, _, _, cov) => assert(cov >= 900000L) }
  }
}
