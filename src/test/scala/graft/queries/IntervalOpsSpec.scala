package graft.queries

import graft.TestSpark
import org.scalatest.funsuite.AnyFunSuite

/** q241/q242/q243 re-derived driver-side from the raw events/orders. */
class IntervalOpsSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  private val sf = "/root/testdata/sf0.001"

  private def eventTimes: Seq[(Long, Long)] = // (user, ts µs)
    graft.Tables.events(spark, sf)
      .selectExpr("user_id", "unix_micros(ts)").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSeq

  test("q241 ≡ driver sweep-line per day") {
    val iv = eventTimes
      .groupBy { case (u, t) => (u, t / 86400000000L) }
      .map { case ((u, day), es) =>
        (day, es.map(_._2).min, es.map(_._2).max) }.toSeq
    val expect = iv.groupBy(_._1).map { case (day, is) =>
      val pts = is.flatMap(i => Seq((i._2, 1L), (i._3, -1L)))
        .sortBy { case (t, d) => (t, -d) }
      var c = 0L; var mx = 0L
      pts.foreach { p => c += p._2; mx = math.max(mx, c) }
      (day, (is.size.toLong, mx))
    }
    val got = IntervalOps.maxConcurrency(spark, sf).collect()
    assert(got.length == expect.size)
    got.foreach { r =>
      val (n, pk) = expect(r.getLong(0))
      assert(r.getLong(1) == n && r.getLong(2) == pk)
    }
  }

  test("q242 ≡ driver island merge per user") {
    val W = 30L * 60 * 1000000
    val expect = eventTimes.distinct.groupBy(_._1).map { case (u, es) =>
      val ss = es.map(_._2).distinct.sorted
      var islands = List.empty[(Long, Long, Long)] // (st, en, nEv)
      ss.foreach { t =>
        islands match {
          case (st, en, n) :: rest if t <= en =>
            islands = (st, math.max(en, t + W), n + 1) :: rest
          case _ => islands = (t, t + W, 1L) :: islands
        }
      }
      (u, (ss.size.toLong, islands.size.toLong,
        islands.map(i => i._2 - i._1).sum,
        islands.map(i => i._2 - i._1).max))
    }
    val got = IntervalOps.intervalCoalesce(spark, sf).collect()
    assert(got.length == expect.size)
    got.foreach { r =>
      val (nEv, nIs, cov, mxi) = expect(r.getLong(0))
      assert(r.getLong(1) == nEv, s"user ${r.getLong(0)} n_events")
      assert(r.getLong(2) == nIs, s"user ${r.getLong(0)} n_islands")
      assert(r.getLong(3) == cov, s"user ${r.getLong(0)} covered")
      assert(r.getLong(4) == mxi, s"user ${r.getLong(0)} max island")
    }
  }

  test("q243: known days exact, gaps interpolate between neighbors") {
    val rows = IntervalOps.gapFill(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getLong(3)))
    val byRegion = rows.groupBy(_._1)
    assert(byRegion.size == 5)
    // dense spine: consecutive days, same span everywhere
    byRegion.values.foreach { rs =>
      val days = rs.map(_._2).sorted
      assert(days.zip(days.tail).forall(p => p._2 == p._1 + 1))
    }
    assert(byRegion.values.map(_.length).toSet.size == 1)
    // every gap value lies within [min,max] of its bracketing knowns
    byRegion.values.foreach { rs =>
      val sorted = rs.sortBy(_._2)
      var prev = Option.empty[Long]
      val nexts = sorted.reverse.scanLeft(Option.empty[Long]) {
        (acc, r) => if (r._3 == 0) Some(r._4) else acc
      }.tail.reverse
      sorted.zip(nexts).foreach { case (r, nx) =>
        if (r._3 == 0) prev = Some(r._4)
        else (prev, nx) match {
          case (Some(p), Some(n)) =>
            assert(r._4 >= math.min(p, n) && r._4 <= math.max(p, n))
          case (Some(p), None) => assert(r._4 == p)
          case (None, Some(n)) => assert(r._4 == n)
          case _ => fail("gap with no known neighbor")
        }
      }
    }
  }
}
