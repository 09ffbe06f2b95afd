package graft.queries

import graft.TestSpark
import org.scalatest.funsuite.AnyFunSuite

/** q291/q293/q294 — brute-force driver re-derivations. */
class DistributionOpsSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  private val sf = "/root/testdata/sf0.001"

  private def cents(v: Double): Long =
    java.math.BigDecimal.valueOf(v)
      .setScale(2, java.math.RoundingMode.HALF_UP)
      .movePointRight(2).longValueExact

  test("q291 ≡ driver dow/hour census") {
    val ev = graft.Tables.events(spark, sf)
      .selectExpr("unix_micros(ts)").collect().map(_.getLong(0))
    val expect = ev.map(t =>
      ((t / 86400000000L + 4) % 7, (t % 86400000000L) / 3600000000L))
      .groupBy(identity).view.mapValues(_.length.toLong).toMap
    val total = ev.length.toLong
    val got = IntervalOps.dowHourHeatmap(spark, sf).collect()
    assert(got.length == expect.size)
    got.foreach { r =>
      val n = expect((r.getLong(0), r.getLong(1)))
      assert(r.getLong(2) == n)
      assert(r.getLong(3) == n * 1000000L / total)
    }
    assert(got.map(_.getLong(2)).sum == total)
  }

  test("q292 ≡ driver gap census; shares reach exactly 1e6") {
    val o = spark.read.parquet(s"$sf/orders.parquet")
      .selectExpr("o_custkey", "o_orderkey",
        "unix_micros(CAST(o_orderdate AS TIMESTAMP)) div 86400000000")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val gaps = o.groupBy(_._1).values.flatMap { os =>
      val sorted = os.sortBy(x => (x._3, x._2)).map(_._3)
      sorted.zip(sorted.tail).map { case (a, b) => (b - a) / 7 }
    }.toSeq
    val expect = gaps.groupBy(identity).view
      .mapValues(_.size.toLong).toMap
    val got = CustomerValueOps.interArrival(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(got.map(g => g._1 -> g._2).toMap == expect)
    assert(got.maxBy(_._1)._3 == 1000000L)
    var cum = 0L
    got.sortBy(_._1).foreach { g =>
      cum += g._2
      assert(g._3 == cum * 1000000L / gaps.size)
    }
  }

  test("q311 ≡ driver basket census; cum curve ends at 1e6") {
    val sizes = spark.read.parquet(s"$sf/lineitem.parquet")
      .select("l_orderkey").collect().map(_.getLong(0))
      .groupBy(identity).values.map(_.length).toSeq
    val expect = sizes.groupBy(identity).view
      .mapValues(_.size.toLong).toMap
    val got = CustomerValueOps.basketSizes(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(got.map(g => g._1.toInt -> g._2).toMap == expect)
    assert(got.maxBy(_._1)._4 == 1000000L)
    assert(got.map(_._2).sum == sizes.size.toLong)
  }

  test("q312 ≡ driver lifetime spans; shares conserve") {
    val spans = spark.read.parquet(s"$sf/orders.parquet")
      .selectExpr("o_custkey",
        "unix_micros(CAST(o_orderdate AS TIMESTAMP)) div 86400000000")
      .collect().map(r => (r.getLong(0), r.getLong(1)))
      .groupBy(_._1).values
      .map(os => os.map(_._2).max - os.map(_._2).min).toSeq
    val expect = spans.groupBy(_ / 91).view.mapValues { vs =>
      (vs.size.toLong, vs.min, vs.max) }.toMap
    val got = CustomerValueOps.lifetimeSpans(spark, sf).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4)))).toMap
    assert(got.view.mapValues(v => (v._1, v._2, v._3)).toMap == expect)
    assert(got.values.map(_._1).sum == spans.size.toLong)
  }

  test("q293 ≡ brute-force pairwise |diff| per region") {
    val regionOf = {
      val cust = spark.read.parquet(s"$sf/customer.parquet")
        .select("c_custkey", "c_nationkey").collect()
        .map(r => (r.getLong(0), r.getInt(1))).toMap
      val nat = spark.read.parquet(s"$sf/nation.parquet")
        .select("n_nationkey", "n_regionkey").collect()
        .map(r => (r.getInt(0), r.getInt(1))).toMap
      val reg = spark.read.parquet(s"$sf/region.parquet")
        .select("r_regionkey", "r_name").collect()
        .map(r => (r.getInt(0), r.getString(1))).toMap
      cust.map { case (c, n) => c -> reg(nat(n)) }
    }
    val o = spark.read.parquet(s"$sf/orders.parquet")
      .select("o_custkey", "o_totalprice").collect()
      .map(r => (regionOf(r.getLong(0)), cents(r.getDouble(1))))
    val got = CustomerValueOps.giniMeanDiff(spark, sf).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2),
        r.getLong(3)))).toMap
    o.groupBy(_._1).foreach { case (name, vs0) =>
      val vs = vs0.map(_._2)
      val pairSum = (for {
        i <- vs.indices; j <- vs.indices if i < j
      } yield math.abs(vs(i) - vs(j)).toLong).sum
      val (n, ps, gmd) = got(name)
      assert(n == vs.length)
      assert(ps == pairSum, name)
      assert(gmd == pairSum * 2 / (n * (n - 1)))
    }
  }

  test("q294 Lorenz: shares cumulative, convex, end at 1e6") {
    val rev = spark.read.parquet(s"$sf/orders.parquet")
      .select("o_custkey", "o_totalprice").collect()
      .map(r => (r.getLong(0), cents(r.getDouble(1))))
      .groupBy(_._1).view.mapValues(_.map(_._2).sum)
      .toSeq.sortBy { case (k, v) => (v, k) }
    val n = rev.length
    val total = rev.map(_._2).sum
    val expect = rev.zipWithIndex.map { case ((_, v), i) =>
      ((i * 10) / n + 1, v)
    }.groupBy(_._1).view.mapValues { vs =>
      (vs.size.toLong, vs.map(_._2).sum)
    }.toMap
    val got = CustomerValueOps.lorenzCurve(spark, sf).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2),
        r.getLong(3)))).toMap
    assert(got.size == expect.size)
    var cum = 0L
    (1L to got.keys.max).foreach { d =>
      val (nc, rc) = expect(d.toInt)
      val g = got(d)
      assert(g._1 == nc && g._2 == rc, s"decile $d")
      cum += rc
      assert(g._3 == cum * 1000000L / total)
    }
    assert(got(got.keys.max)._3 == 1000000L)
    // the top decile out-earns the bottom decile (inequality exists)
    assert(got(got.keys.max)._2 > got(1L)._2)
  }
}
