package graft.queries

import graft.TestSpark
import org.scalatest.funsuite.AnyFunSuite

/** q257/q258 — driver re-derivations; RANGE≠ROWS witnessed on gaps. */
class RevenueOpsSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  private val sf = "/root/testdata/sf0.001"

  private def cents(v: Double): Long =
    java.math.BigDecimal.valueOf(v)
      .setScale(2, java.math.RoundingMode.HALF_UP)
      .movePointRight(2).longValueExact

  test("q257: shares sum to ~1e6 per year; revenue conserves") {
    val rows = RevenueOps.marketShare(spark, sf).collect()
      .map(r => (r.getInt(0), r.getString(1), r.getLong(2), r.getLong(3)))
    assert(rows.nonEmpty)
    rows.groupBy(_._1).foreach { case (yr, ys) =>
      val total = ys.map(_._3).sum
      // integer-division shares: within n_nations ppm below 1e6
      val shareSum = ys.map(_._4).sum
      assert(shareSum <= 1000000L && shareSum > 1000000L - ys.length,
        s"year $yr shares")
      ys.foreach { y =>
        assert(y._4 == y._3 * 1000000L / total)
      }
    }
    // nations are ASIA-side customers' suppliers — all 25 possible
    assert(rows.map(_._2).distinct.length <= 25)
  }

  test("q299: decomposition identity holds exactly per year") {
    val rows = RevenueOps.growthDecomposition(spark, sf).collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5)))
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r._4 == r._5 + r._6) // delta = volume + price, exactly
    }
    // deltas chain: rev_t - rev_{t-1} across consecutive rows
    rows.sliding(2).foreach {
      case Array(a, b) if b._1 == a._1 + 1 =>
        assert(b._4 == b._3 - a._3)
      case _ =>
    }
  }

  test("q300: dashboard internally consistent; shares sum per year") {
    val rows = RevenueOps.execDashboard(spark, sf).collect()
      .map(r => (r.getString(0), r.getInt(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getLong(6),
        if (r.isNullAt(7)) None else Some(r.getLong(7))))
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r._6 == r._5 / r._3)      // aov = rev div orders
      assert(r._4 <= r._3)             // customers <= orders
    }
    rows.groupBy(_._2).foreach { case (_, ys) =>
      val s0 = ys.map(_._7).sum
      assert(s0 <= 1000000L && s0 > 1000000L - ys.length)
    }
    // growth cross-check against the raw revenue sequence
    rows.groupBy(_._1).foreach { case (_, rs) =>
      val sorted = rs.sortBy(_._2)
      assert(sorted.head._8.isEmpty)
      sorted.sliding(2).foreach {
        case Array(a, b) =>
          assert(b._8.contains(
            (b._5 - a._5) * 1000000L / a._5))
        case _ =>
      }
    }
  }

  test("q258 ≡ driver rolling sum on day values; gaps shrink window") {
    val rows = RevenueOps.rangeWindow(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4)))
    val byRegion = rows.groupBy(_._1)
    byRegion.values.foreach { rs =>
      val daily = rs.map(r => r._2 -> r._3).toMap
      rs.foreach { case (_, day, _, rolling, n) =>
        val win = (day - 6 to day).flatMap(daily.get)
        assert(rolling == win.sum)
        assert(n == (day - 6 to day).count(daily.contains))
      }
    }
    // the RANGE frame must actually shrink somewhere (gap witness) —
    // otherwise this spec could not distinguish RANGE from ROWS
    assert(rows.exists(r => r._5 < 7L && r._2 >
      byRegion(r._1).map(_._2).min + 6))
  }
}
