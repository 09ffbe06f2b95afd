package graft.queries

import graft.TestSpark
import org.scalatest.funsuite.AnyFunSuite

/** q308/q309/q310 — driver re-derivations. */
class EngagementOpsSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  private val sf = "/root/testdata/sf0.001"

  private def cents(v: Double): Long =
    java.math.BigDecimal.valueOf(v)
      .setScale(2, java.math.RoundingMode.HALF_UP)
      .movePointRight(2).longValueExact

  test("q308 ≡ driver five-number summary + Tukey fences") {
    val ev = graft.Tables.events(spark, sf)
      .select("event_type", "value").collect()
      .map(r => (r.getString(0), cents(r.getDouble(1))))
    val got = EngagementOps.boxplot(spark, sf).collect()
      .map(r => r.getString(0) -> r).toMap
    ev.groupBy(_._1).foreach { case (t, vs0) =>
      val vs = vs0.map(_._2).sorted
      val n = vs.length
      def qAt(num: Int) = vs.find { v =>
        vs.count(_ <= v) * 4 >= n * num }.get
      val (q1, med, q3) = (qAt(1), qAt(2), qAt(3))
      val r = got(t)
      assert(r.getLong(1) == n)
      assert(r.getLong(2) == vs.min && r.getLong(6) == vs.max)
      assert((r.getLong(3), r.getLong(4), r.getLong(5)) == ((q1, med, q3)))
      assert(r.getLong(7) == vs.count(v => v * 2 < q1 * 5 - q3 * 3))
      assert(r.getLong(8) == vs.count(v => v * 2 > q3 * 5 - q1 * 3))
    }
  }

  test("q309: week 0 is everyone; curve bounded by the base") {
    val rows = EngagementOps.retentionCurve(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val byK = rows.map(r => r._1 -> r._2).toMap
    val base = graft.Tables.events(spark, sf)
      .selectExpr("user_id").distinct().count()
    assert(byK(0L) == base)                     // everyone active week 0
    assert(rows.forall(_._2 <= base))
    assert(rows.find(_._1 == 0L).get._3 == 1000000L)
  }

  test("q310 ≡ driver DAU/MAU; stickiness within (0, 1e6]") {
    val ud = graft.Tables.events(spark, sf)
      .selectExpr("user_id", "unix_micros(ts) div 86400000000")
      .distinct().collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val expect = ud.map { case (u, day) => (day / 30, day, u) }
      .groupBy(_._1).map { case (m, xs) =>
        val days = xs.map(_._2).distinct.size.toLong
        val sumDau = xs.size.toLong
        val mau = xs.map(_._3).distinct.size.toLong
        m -> ((days, sumDau, mau, sumDau * 1000000L / (days * mau)))
      }
    val got = EngagementOps.stickiness(spark, sf).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4)))).toMap
    assert(got == expect)
    assert(got.values.forall(v => v._4 > 0 && v._4 <= 1000000L))
  }
}
