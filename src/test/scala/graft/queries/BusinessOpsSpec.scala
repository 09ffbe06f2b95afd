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

  test("q200 ≡ driver NTILE quintiles with the same tie-breaks") {
    import java.math.{BigDecimal => JBD, RoundingMode}
    val os = spark.read.parquet(s"$sf/orders.parquet")
      .selectExpr("o_custkey",
        "unix_micros(CAST(o_orderdate AS TIMESTAMP)) AS odu",
        "o_totalprice").collect()
      .map(r => (r.getLong(0), r.getLong(1),
        JBD.valueOf(r.getDouble(2)).setScale(2, RoundingMode.HALF_UP)
          .movePointRight(2).longValueExact))
    val maxd = os.map(_._2).max
    val pc = os.groupBy(_._1).map { case (k, rs) =>
      (k, (maxd - rs.map(_._2).max) / 86400000000L,
        rs.length.toLong, rs.map(_._3).sum)
    }.toSeq
    def ntile5[A](xs: Seq[(Long, A)]): Map[Long, Int] = {
      // xs already ordered; NTILE(5): first (n mod 5) buckets get +1
      val n = xs.length
      val base = n / 5; val extra = n % 5
      xs.zipWithIndex.map { case ((k, _), i) =>
        var acc = 0; var b = 0
        while (acc + base + (if (b < extra) 1 else 0) <= i) {
          acc += base + (if (b < extra) 1 else 0); b += 1
        }
        (k, b + 1)
      }.toMap
    }
    val r = ntile5(pc.sortBy { case (k, rec, _, _) => (-rec, k) }
      .map(t => (t._1, ())))
    val f = ntile5(pc.sortBy { case (k, _, fr, _) => (fr, k) }
      .map(t => (t._1, ())))
    val m = ntile5(pc.sortBy { case (k, _, _, c) => (c, k) }
      .map(t => (t._1, ())))
    val exp = pc.groupBy { case (k, _, _, _) =>
      r(k) * 100 + f(k) * 10 + m(k)
    }.map { case (seg, cs) =>
      (seg.toLong, (cs.length.toLong, cs.map(_._4).sum))
    }
    val got = BusinessOps.rfmSegments(spark, sf).collect()
      .map(row => row.getInt(0).toLong ->
        (row.getLong(1), row.getLong(2))).toMap
    assert(got == exp)
  }

  test("q201 lift/confidence re-derived for every returned rule") {
    val li = spark.read.parquet(s"$sf/lineitem.parquet")
      .select("l_orderkey", "l_partkey").collect()
      .map(r => (r.getLong(0), r.getLong(1))).distinct
    val nOrders = li.map(_._1).distinct.length.toLong
    val nPart = li.groupBy(_._2).view.mapValues(_.length.toLong).toMap
    val pairN = li.groupBy(_._1).values.flatMap { rs =>
      val ps = rs.map(_._2).distinct.toSeq
      for (a <- ps; b <- ps if a != b) yield (a, b)
    }.groupBy(identity).view.mapValues(_.size.toLong).toMap
    val got = BusinessOps.assocRules(spark, sf).collect()
    assert(got.length == 25)
    got.foreach { r =>
      val (a, c, pn) = (r.getLong(0), r.getLong(1), r.getLong(2))
      assert(pairN((a, c)) == pn && pn >= 3)
      assert(r.getLong(3) == pn * 1000000L / nPart(a))
      assert(r.getLong(4) == pn * nOrders * 1000000L / (nPart(a) * nPart(c)))
    }
    // descending lift with the declared tie-breaks
    val keys = got.map(r => (-r.getLong(4), -r.getLong(3),
      r.getLong(0), r.getLong(1))).toSeq
    assert(keys == keys.sorted)
  }

  test("q208 gains table: partition, cumulative closure, final gain = 1e6") {
    val rows = BusinessOps.decileLift(spark, sf).collect()
    assert(rows.map(_.getInt(0)).toSeq == (1 to 10))
    val nCust = spark.read.parquet(s"$sf/customer.parquet").count()
    assert(rows.map(_.getLong(1)).sum == nCust)
    val gains = rows.map(_.getLong(3))
    assert(gains.zip(gains.tail).forall { case (a, b) => a <= b })
    assert(gains.last == 1000000L)
    val totalCents = rows.map(_.getLong(2)).sum
    var cum = 0L
    rows.foreach { r =>
      cum += r.getLong(2)
      assert(r.getLong(3) == BigInt(cum) * 1000000 / totalCents)
      assert(r.getLong(4) ==
        (BigInt(cum) * 10 * 1000000 / (BigInt(totalCents) * r.getInt(0))))
    }
  }

  test("q239 ≡ driver ship-lag percentiles for every month") {
    val ords = spark.read.parquet(s"$sf/orders.parquet")
      .selectExpr("o_orderkey",
        "year(o_orderdate) * 100 + month(o_orderdate)",
        "unix_micros(CAST(o_orderdate AS TIMESTAMP))").collect()
      .map(r => r.getLong(0) -> ((r.getInt(1), r.getLong(2)))).toMap
    val lags = spark.read.parquet(s"$sf/lineitem.parquet")
      .selectExpr("l_orderkey",
        "unix_micros(CAST(l_shipdate AS TIMESTAMP))").collect()
      .map { r =>
        val (ym, odu) = ords(r.getLong(0))
        (ym, (r.getLong(1) - odu) / 86400000000L)
      }
    val exp = lags.groupBy(_._1).view.mapValues { ls =>
      val xs = ls.map(_._2).sorted
      def pct(num: Int, den: Int) =
        xs.zipWithIndex.collectFirst {
          case (v, i) if (i + 1).toLong * den >= xs.length.toLong * num => v
        }.get
      (xs.length.toLong, pct(1, 2), pct(9, 10))
    }.toMap
    val got = BusinessOps.shipLag(spark, sf).collect()
      .map(r => r.getInt(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    assert(got == exp)
    got.values.foreach { case (_, p50, p90) => assert(p50 <= p90) }
  }

  test("q240 HHI ≡ driver shares; bounded by [1e6/n, 1e6]") {
    import java.math.{BigDecimal => JBD, RoundingMode}
    val types = spark.read.parquet(s"$sf/part.parquet")
      .select("p_partkey", "p_type").collect()
      .map(r => (r.getLong(0), r.getString(1))).toMap
    val rev = spark.read.parquet(s"$sf/lineitem.parquet")
      .select("l_partkey", "l_suppkey", "l_extendedprice").collect()
      .map(r => ((types(r.getLong(0)), r.getLong(1)),
        JBD.valueOf(r.getDouble(2)).setScale(2, RoundingMode.HALF_UP)
          .movePointRight(2).longValueExact))
      .groupBy(_._1).view.mapValues(_.map(_._2).sum).toMap
    val exp = rev.keys.map(_._1).toSeq.distinct.map { t =>
      val sups = rev.filter(_._1._1 == t)
      val tot = sups.values.sum
      val hhi = sups.values.map { c =>
        val p = BigInt(c) * 1000000 / tot; p * p
      }.sum / 1000000
      t -> ((sups.size.toLong, hhi.toLong))
    }.toMap
    val got = BusinessOps.supplierHhi(spark, sf).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(got == exp)
    got.values.foreach { case (n, hhi) =>
      assert(hhi >= 1000000L / n - 1 && hhi <= 1000000L)
    }
  }
}
