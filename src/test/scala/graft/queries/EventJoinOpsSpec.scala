package graft.queries

import graft.TestSpark
import org.scalatest.funsuite.AnyFunSuite

/** q252/q256 — brute-force driver re-derivations + a churn fixture. */
class EventJoinOpsSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  private val sf = "/root/testdata/sf0.001"

  test("q252 ≡ brute-force nearest click (tie → earlier)") {
    val ev = graft.Tables.events(spark, sf)
      .selectExpr("event_id", "user_id", "event_type", "unix_micros(ts)")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2), r.getLong(3)))
    val clicksByUser = ev.filter(_._3 == "click")
      .groupBy(_._2).view.mapValues(_.map(x => (x._4, x._1))).toMap
    val expect = ev.filter(_._3 == "purchase").map {
      case (eid, u, _, t) =>
        val cands = clicksByUser.getOrElse(u, Array.empty).toSeq
        if (cands.isEmpty) eid -> None
        else {
          // brute force: min |dt|; ties -> earlier ts; same ts both
          // sides impossible (a click is on exactly one side of t by
          // (ts, event_id) order, but distance only depends on ts)
          val best = cands.minBy { case (ct, _) =>
            (math.abs(ct - t), ct) }
          eid -> Some((best._1, math.abs(best._1 - t)))
        }
    }.toMap
    val got = EventJoinOps.nearestEvent(spark, sf).collect()
    assert(got.length == expect.size)
    got.foreach { r =>
      expect(r.getLong(0)) match {
        case None => assert(r.isNullAt(3))
        case Some((ts, dist)) =>
          assert(r.getLong(3) == ts, s"event ${r.getLong(0)}")
          assert(r.getLong(4) == dist)
      }
    }
  }

  test("q256 ≡ driver features/label split at cutoff") {
    val ev = graft.Tables.events(spark, sf)
      .selectExpr("user_id", "event_type",
        "unix_micros(ts) div 86400000000").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    val cutoff = ev.map(_._3).max - 7
    val expect = ev.groupBy(_._1).flatMap { case (u, es) =>
      val pre = es.filter(_._3 <= cutoff)
      if (pre.isEmpty) None
      else Some(u -> (
        Seq("click", "view", "purchase", "error", "signup")
          .map(t => pre.count(_._2 == t).toLong),
        cutoff - pre.map(_._3).max,
        if (es.exists(_._3 > cutoff)) 1L else 0L))
    }
    val got = EventJoinOps.leakageSafeLabels(spark, sf).collect()
    assert(got.length == expect.size)
    got.foreach { r =>
      val (counts, recency, label) = expect(r.getLong(0))
      assert((1 to 5).map(r.getLong).toSeq == counts)
      assert(r.getLong(6) == recency)
      assert(r.getLong(7) == label)
    }
  }

  test("q268 ≡ driver duration-weighted mean") {
    val ev = graft.Tables.events(spark, sf)
      .selectExpr("user_id", "unix_micros(ts)", "event_id",
        "CAST(CAST(value AS DECIMAL(12,2)) * 100 AS BIGINT)").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    val expect = ev.groupBy(_._1).flatMap { case (u, es) =>
      val sorted = es.sortBy(e => (e._2, e._3))
      val ivs = sorted.zip(sorted.tail)
        .map { case (a, b) => (b._2 - a._2, a._4) }
      if (ivs.isEmpty) None
      else {
        val span = ivs.map(_._1).sum
        val ws = ivs.map(i => i._1 * i._2).sum
        Some(u -> ((ivs.length.toLong, span, ws / span)))
      }
    }
    val got = EventJoinOps.twap(spark, sf).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2),
        r.getLong(3)))).toMap
    assert(got == expect)
    // twap is bounded by the held values' extremes
    assert(got.nonEmpty)
  }

  test("q256 fixture: churned user labeled 0, features exclude future") {
    import spark.implicits._
    // day range 0..20, cutoff = 13. u1 active after; u2 churned at 5;
    // u3 only active after cutoff (no feature row at all).
    val ev = Seq(
      (1L, "click", 1L), (1L, "purchase", 12L), (1L, "click", 20L),
      (2L, "view", 2L), (2L, "view", 5L),
      (3L, "signup", 14L), (3L, "click", 20L))
      .toDF("user_id", "event_type", "day")
    val got = EventJoinOps.labelsFrom(ev).collect()
      .map(r => r.getLong(0) -> r).toMap
    assert(got.keySet == Set(1L, 2L))
    val u1 = got(1L); val u2 = got(2L)
    assert(u1.getLong(1) == 1L && u1.getLong(3) == 1L) // clicks pre only
    assert(u1.getLong(7) == 1L)                        // active after
    assert(u2.getLong(2) == 2L && u2.getLong(7) == 0L) // churned
    assert(u2.getLong(6) == 13L - 5L)                  // recency
  }
}
