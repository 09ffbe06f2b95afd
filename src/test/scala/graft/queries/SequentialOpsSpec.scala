package graft.queries

import graft.TestSpark
import org.scalatest.funsuite.AnyFunSuite

/** q266/q267 — driver sequential-fold re-derivations + non-vacuity. */
class SequentialOpsSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  private val sf = "/root/testdata/sf0.001"

  private def cents(v: Double): Long =
    java.math.BigDecimal.valueOf(v)
      .setScale(2, java.math.RoundingMode.HALF_UP)
      .movePointRight(2).longValueExact

  private def seqs: Map[Long, Seq[(Long, Long)]] = // user -> (t, delta)
    graft.Tables.events(spark, sf)
      .selectExpr("user_id", "unix_micros(ts)", "event_id",
        "event_type", "value").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getString(3), cents(r.getDouble(4))))
      .groupBy(_._1).view.mapValues {
        _.sortBy(e => (e._2, e._3)).map { e =>
          val delta = e._4 match {
            case "purchase" => e._5
            case "click" => -e._5
            case _ => 0L
          }
          (e._2, delta)
        }.toSeq
      }.toMap

  test("q266 ≡ driver clamp fold; clamping actually occurs") {
    val expect = seqs.map { case (u, es) =>
      var bal = 0L; var mx = 0L; var hits = 0L
      es.foreach { case (_, d) =>
        val next = bal + d
        if (next < 0) { bal = 0; hits += 1 } else bal = next
        mx = math.max(mx, bal)
      }
      u -> ((es.size.toLong, bal, mx, hits))
    }
    val got = SequentialOps.cappedBalance(spark, sf).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4)))).toMap
    assert(got == expect)
    assert(got.values.exists(_._4 > 0), "no clamp ever fired — vacuous")
    // the clamp matters: final balance differs from the unclamped sum
    assert(seqs.exists { case (u, es) =>
      es.map(_._2).sum != got(u)._2 })
  }

  test("q267 ≡ driver throttle fold; both keeps and drops occur") {
    val T = 2L * 3600 * 1000000
    val expect = seqs.map { case (u, es) =>
      var last = Long.MinValue; var kept = 0L
      es.foreach { case (t, _) =>
        if (last == Long.MinValue || t >= last + T) { last = t; kept += 1 }
      }
      u -> ((es.size.toLong, kept, last))
    }
    val got = SequentialOps.rateLimit(spark, sf).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2),
        r.getLong(3)))).toMap
    assert(got == expect)
    assert(got.values.exists(v => v._2 < v._1), "nothing throttled")
    assert(got.values.forall(_._2 >= 1))
    // throttling is state-dependent: kept count differs from naive
    // fixed-bucket dedup somewhere
    val naive = seqs.map { case (u, es) =>
      u -> es.map(_._1 / T).distinct.size.toLong }
    assert(naive.exists { case (u, n) => n != got(u)._2 })
  }
}
