package graft.queries

import graft.TestSpark
import org.scalatest.funsuite.AnyFunSuite

/** q270–q273 — driver re-derivations + the q270 plan-shape pin. */
class AllocOpsSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  private val sf = "/root/testdata/sf0.001"

  private def cents(v: Double): Long =
    java.math.BigDecimal.valueOf(v)
      .setScale(2, java.math.RoundingMode.HALF_UP)
      .movePointRight(2).longValueExact

  test("q270 ≡ brute-force coincidences; plan has no nested loop") {
    val ev = graft.Tables.events(spark, sf)
      .selectExpr("user_id", "unix_micros(ts)").collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val expect = (for {
      a <- ev; b <- ev
      if a._1 < b._1 && math.abs(a._2 - b._2) <= 1000000L
    } yield ((a._1, b._1), math.abs(a._2 - b._2)))
      .groupBy(_._1).view
      .mapValues(vs => (vs.size.toLong, vs.map(_._2).min)).toMap
    val df = BandOps.eventCoincidence(spark, sf)
    val got = df.collect()
      .map(r => (r.getLong(0), r.getLong(1)) ->
        ((r.getLong(2), r.getLong(3)))).toMap
    assert(got == expect)
    // the band-join rule must have rewritten the self-join
    val opt = df.queryExecution.optimizedPlan.toString
    assert(opt.contains("graft_band_bl"), "rewrite did not fire")
    assert(!df.queryExecution.executedPlan.toString.contains("NestedLoop"))
  }

  test("q271 ≡ driver systematic walk; sample size ≈ target") {
    val o = spark.read.parquet(s"$sf/orders.parquet")
      .select("o_orderkey", "o_totalprice").collect()
      .map(r => (r.getLong(0), cents(r.getDouble(1)))).sortBy(_._1)
    val total = o.map(_._2).sum
    val step = total / 100; val start = step / 2
    var cum = 0L
    val expect = o.flatMap { case (k, w) =>
      def f(x: Long) = if (x < start) 0L else (x - start) / step + 1
      val m = f(cum + w) - f(cum)
      cum += w
      if (m > 0) Some(k -> ((w, m))) else None
    }.toMap
    val got = AllocOps.systematicSample(spark, sf).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(got == expect)
    val n = got.values.map(_._2).sum
    assert(n >= 99 && n <= 101) // f(total) sample points
  }

  test("q272 ≡ driver decay pairs; halving per day") {
    val ev = graft.Tables.events(spark, sf)
      .selectExpr("user_id", "event_type", "unix_micros(ts)", "value")
      .collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2),
        cents(r.getDouble(3))))
    val byUser = ev.groupBy(_._1)
    val expect = byUser.flatMap { case (u, es) =>
      val ps = es.filter(_._2 == "purchase")
      val cs = es.filter(_._2 == "click")
      val pairs = for {
        p <- ps; c <- cs
        if c._3 <= p._3 && p._3 - c._3 <= 7L * 86400000000L
      } yield {
        val age = (p._3 - c._3) / 86400000000L
        (p._4 * 1000 / (1L << age), age)
      }
      if (pairs.isEmpty) None
      else Some(u -> ((pairs.size.toLong, pairs.map(_._1).sum,
        pairs.map(_._2).max)))
    }
    val got = AllocOps.decayAttribution(spark, sf).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2),
        r.getLong(3)))).toMap
    assert(got == expect)
    assert(got.nonEmpty)
  }

  test("q273: classes partition parts; shares ordered A ≥ B-per-part") {
    val li = spark.read.parquet(s"$sf/lineitem.parquet")
      .select("l_partkey", "l_extendedprice").collect()
      .map(r => (r.getLong(0), cents(r.getDouble(1))))
    val rev = li.groupBy(_._1).view.mapValues(_.map(_._2).sum)
      .toSeq.sortBy { case (k, v) => (-v, k) }
    val total = rev.map(_._2).sum
    var cum = 0L
    val classes = rev.map { case (k, v) =>
      val c = if (cum * 5 < total * 4) "A"
        else if (cum * 20 < total * 19) "B" else "C"
      cum += v
      (k, v, c)
    }
    val expect = classes.groupBy(_._3).view.mapValues { vs =>
      (vs.size.toLong, vs.map(_._2).sum,
        vs.map(_._2).sum * 1000000L / total)
    }.toMap
    val got = AllocOps.abcClasses(spark, sf).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2),
        r.getLong(3)))).toMap
    assert(got == expect)
    assert(got.keySet == Set("A", "B", "C"))
    assert(got.values.map(_._1).sum == rev.size)
  }
}
