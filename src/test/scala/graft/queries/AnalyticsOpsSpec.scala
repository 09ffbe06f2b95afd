package graft.queries

import graft.TestSpark
import org.scalatest.funsuite.AnyFunSuite

/** q185–q190 contracts beyond the oracle: driver-side re-derivations
  * (paths, CMS cells, χ², estimator identity, Simpson) and the CMS
  * one-sided-error guarantee.
  */
class AnalyticsOpsSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  private val sf = "/root/testdata/sf0.001"

  /** The GramHash polynomial, restated from first principles. */
  private def poly(w: String): Long = {
    val P = 36028797018963913L
    w.codePoints().toArray.foldLeft(0L)((h, c) => (h * 131 + c % 256) % P)
  }
  private def cell(h: Long, a: Long, b: Long): Long =
    ((h % 2147483648L) * a + b) % 2147483647L % 256L
  private val salts =
    Seq((1103515245L, 12345L), (1299709L, 54321L), (7368787L, 99991L),
      (104729L, 7919L))

  private lazy val words: Seq[String] =
    spark.read.parquet(s"$sf/documents.parquet").select("text")
      .collect().toSeq.flatMap(_.getString(0).split(" ", -1))

  test("q185 paths ≡ driver-side journey re-derivation") {
    val ev = graft.Tables.events(spark, sf)
      .selectExpr("user_id", "unix_micros(ts) AS tsu", "event_id",
        "event_type").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3)))
    val expected = ev.groupBy(_._1).map { case (_, es) =>
      es.sortBy(e => (e._2, e._3)).take(5).map(_._4).mkString(">")
    }.toSeq.groupBy(identity).view.mapValues(_.size.toLong).toSeq
      .sortBy { case (p, n) => (-n, p) }.take(20)
    val got = AnalyticsOps.eventPaths(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(1))).toSeq
    assert(got == expected)
  }

  test("q186 cells ≡ driver CMS; every row sums to the token count") {
    val expected = salts.zipWithIndex.flatMap { case ((a, b), r) =>
      words.map(w => (r.toLong, cell(poly(w), a, b)))
    }.groupBy(identity).view.mapValues(_.size.toLong).toMap
    val got = AnalyticsOps.cmsCells(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(got == expected)
    // linearity: each of the 4 rows partitions the full stream
    (0L to 3L).foreach { r =>
      assert(got.collect { case ((`r`, _), n) => n }.sum == words.size)
    }
  }

  test("q187 estimates are one-sided: est ≥ exact, and ≡ driver CMS") {
    val cnt = words.groupBy(identity).view.mapValues(_.size.toLong)
    val cells = salts.zipWithIndex.flatMap { case ((a, b), r) =>
      words.map(w => (r, cell(poly(w), a, b)))
    }.groupBy(identity).view.mapValues(_.size.toLong).toMap
    val rows = AnalyticsOps.cmsEstimate(spark, sf).collect()
    assert(rows.length == 10)
    rows.foreach { r =>
      val (w, exact, est) = (r.getString(0), r.getLong(1), r.getLong(2))
      assert(cnt(w) == exact)
      assert(est >= exact) // CMS never underestimates
      val expectedEst = salts.zipWithIndex
        .map { case ((a, b), ri) => cells((ri, cell(poly(w), a, b))) }.min
      assert(est == expectedEst)
    }
  }

  test("q188 χ² milli-units match a double re-computation") {
    val r = AnalyticsOps.abTest(spark, sf).collect().head
    val (ua, ub) = (r.getLong(0), r.getLong(1))
    val (ca, cb) = (r.getLong(2), r.getLong(3))
    val (ma, mb) = (ua - ca, ub - cb)
    val n = (ua + ub).toDouble
    val delta = ca.toDouble * mb - cb.toDouble * ma
    val chi2 = n * delta * delta /
      (ua.toDouble * ub * (ca + cb) * (ma + mb))
    assert(math.abs(r.getLong(7) - math.floor(chi2 * 1000)) <= 1)
    // deterministic assignment really splits the population
    assert(ua > 0 && ub > 0 && ua + ub ==
      graft.Tables.events(spark, sf).select("user_id").distinct().count())
  }

  test("q189 histogram prediction ≡ the actual join size (identity)") {
    val actual = graft.Tables.orders(spark, sf)
      .join(graft.Tables.customer(spark, sf),
        org.apache.spark.sql.functions.col("o_custkey") ===
          org.apache.spark.sql.functions.col("c_custkey"))
      .selectExpr("o_custkey % 16 AS bucket").collect()
      .groupBy(_.getLong(0)).view.mapValues(_.length.toLong).toMap
    val got = AnalyticsOps.joinSizeAudit(spark, sf).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == actual)
  }

  private def lev(a: String, b: String): Int = {
    val d = Array.tabulate(a.length + 1, b.length + 1)((i, j) =>
      if (i == 0) j else if (j == 0) i else 0)
    for (i <- 1 to a.length; j <- 1 to b.length)
      d(i)(j) = math.min(math.min(d(i - 1)(j) + 1, d(i)(j - 1) + 1),
        d(i - 1)(j - 1) + (if (a(i - 1) == b(j - 1)) 0 else 1))
    d(a.length)(b.length)
  }

  test("q193 ≡ driver sorted-neighborhood scan (w=2, lev ≤ 2)") {
    val cust = spark.read.parquet(s"$sf/customer.parquet")
      .select("c_custkey", "c_name").collect()
      .map(r => (r.getLong(0), r.getString(1)))
    val expected = cust.groupBy(_._2.take(12)).values.flatMap { blk =>
      val sorted = blk.sortBy(c => (c._2, c._1))
      (1 to 2).flatMap { o =>
        sorted.dropRight(o).zip(sorted.drop(o)).map { case (x, y) =>
          (x._1, y._1, x._2, y._2, lev(x._2, y._2).toLong)
        }
      }
    }.filter(_._5 <= 2).toSet
    val got = AnalyticsOps.snmDedup(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2), r.getString(3),
        r.getLong(4))).toSet
    assert(got == expected)
    assert(got.nonEmpty)
  }

  test("q194 ≡ driver last-touch attribution fold") {
    import java.math.{BigDecimal => JBD, RoundingMode}
    val ev = graft.Tables.events(spark, sf)
      .selectExpr("user_id", "unix_micros(ts) AS tsu", "event_id",
        "event_type", "value").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3),
        r.getDouble(4)))
    val credited = ev.groupBy(_._1).values.flatMap { es =>
      var touch: String = null
      es.sortBy(e => (e._2, e._3)).flatMap { e =>
        val out = if (e._4 == "purchase")
          Some((if (touch == null) "none" else touch, e._5)) else None
        if (e._4 != "purchase") touch = e._4
        out
      }
    }.toSeq
    val expected = credited.groupBy(_._1).view.mapValues { vs =>
      (vs.size.toLong,
        vs.map(v => JBD.valueOf(v._2).setScale(2, RoundingMode.HALF_UP))
          .reduce(_.add(_)).doubleValue)
    }.toMap
    val got = AnalyticsOps.attribution(spark, sf).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getDouble(2)))).toMap
    assert(got == expected)
  }

  test("q190 Simpson ppm ≡ word-level driver re-derivation") {
    val bySource = spark.read.parquet(s"$sf/documents.parquet")
      .select("source", "text").collect()
      .groupBy(_.getString(0)).view
      .mapValues(_.toSeq.flatMap(_.getString(1).split(" ", -1)))
    val got = AnalyticsOps.simpsonDiversity(spark, sf).collect()
      .map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    bySource.foreach { case (src, ws) =>
      val n = ws.size.toLong
      val counts = ws.groupBy(identity).values.map(_.size.toLong)
      val coll = counts.map(c => BigInt(c) * (c - 1)).sum
      val ppm = (coll * 1000000 / (BigInt(n) * (n - 1))).toLong
      assert(got(src) == ((n, counts.size.toLong, ppm)), src)
    }
  }

  test("q223 conservation: credited cents across ALL buckets equal " +
    "total purchase cents exactly") {
    import java.math.{BigDecimal => JBD, RoundingMode}
    val rows = AnalyticsOps.linearAttribution(spark, sf).collect()
    val credited = rows.map(_.getLong(2)).sum
    val purchases = graft.Tables.events(spark, sf)
      .filter(org.apache.spark.sql.functions.col("event_type") === "purchase")
      .select("value").collect()
      .map(r => JBD.valueOf(r.getDouble(0)).setScale(2, RoundingMode.HALF_UP)
        .movePointRight(2).longValueExact).sum
    assert(credited == purchases,
      "integer splitting with remainder-to-earliest must conserve cents")
    assert(rows.map(_.getString(0)).contains("direct"))
  }

  test("q229 sweep: clickers constant, converted monotone in the limit, " +
    "and ≡ a driver funnel at each limit") {
    val ev = graft.Tables.events(spark, sf)
      .selectExpr("user_id", "event_type", "unix_micros(ts)").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    val byUser = ev.groupBy(_._1)
    val deltas = byUser.values.flatMap { es =>
      val clicks = es.filter(_._2 == "click").map(_._3)
      if (clicks.isEmpty) None
      else {
        val c = clicks.min
        val after = es.filter(e => e._2 == "purchase" && e._3 >= c)
        Some(after.map(e => (e._3 - c) / 1000000L).minOption)
      }
    }.toSeq
    val rows = AnalyticsOps.funnelSweep(spark, sf).collect()
    assert(rows.map(_.getLong(1)).distinct.length == 1)
    assert(rows.head.getLong(1) == deltas.length)
    val conv = rows.map(r => r.getLong(0) -> r.getLong(2)).toMap
    Seq(60L, 600L, 3600L).foreach { l =>
      assert(conv(l) == deltas.count(_.exists(_ <= l)), s"limit $l")
    }
    assert(conv(60L) <= conv(600L) && conv(600L) <= conv(3600L))
  }

  test("q364 fixture: CUPED adjustment hand-solved (θ = 3.2)") {
    import spark.implicits._
    // (arm, x, y): n=4, Σx=10, cov_xn=64, var_xn=20, θ=3.2, x̄=2.5;
    // arm0 ȳ=12 x̄=2 → 12+3.2·0.5 = 13.6; arm1 ȳ=16 x̄=3 → 16−1.6=14.4
    val per = Seq((0L, 1L, 10L), (0L, 3L, 14L), (1L, 2L, 12L),
      (1L, 4L, 20L)).toDF("arm", "x", "y")
    val got = AnalyticsOps.cupedOf(per).collect()
      .map(r => (r.getLong(0), r.getLong(5), r.getLong(6),
        r.getLong(7), r.getLong(8)))
    assert(got.toSeq === Seq((0L, 64L, 20L, 12000L, 13600L),
      (1L, 64L, 20L, 16000L, 14400L)))
  }

  test("q364 fixture: constant covariate → adjusted mean NULL") {
    import spark.implicits._
    val per = Seq((0L, 2L, 10L), (1L, 2L, 14L)).toDF("arm", "x", "y")
    val rows = AnalyticsOps.cupedOf(per).collect()
    assert(rows.forall(_.isNullAt(8)), "var_xn = 0 guards to NULL")
  }
}
