package graft.queries

import graft.TestSpark
import org.scalatest.funsuite.AnyFunSuite

/** q264/q265 — brute-force pair re-derivations of the rank statistics. */
class StatsRankSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  private val sf = "/root/testdata/sf0.001"

  private def cents(v: Double): Long =
    java.math.BigDecimal.valueOf(v)
      .setScale(2, java.math.RoundingMode.HALF_UP)
      .movePointRight(2).longValueExact

  test("q264 ≡ brute-force pair counts; U identity holds") {
    val cust = spark.read.parquet(s"$sf/customer.parquet")
      .select("c_custkey", "c_nationkey").collect()
      .map(r => (r.getLong(0), r.getInt(1))).toMap
    val nat = spark.read.parquet(s"$sf/nation.parquet")
      .select("n_nationkey", "n_regionkey").collect()
      .map(r => (r.getInt(0), r.getInt(1))).toMap
    val reg = spark.read.parquet(s"$sf/region.parquet")
      .select("r_regionkey", "r_name").collect()
      .map(r => (r.getInt(0), r.getString(1))).toMap
    val vals = spark.read.parquet(s"$sf/orders.parquet")
      .select("o_custkey", "o_totalprice").collect()
      .map(r => (reg(nat(cust(r.getLong(0)))), cents(r.getDouble(1))))
    val a = vals.filter(_._1 == "ASIA").map(_._2)
    val b = vals.filter(_._1 == "EUROPE").map(_._2)
    // brute force 2U_A = sum over pairs: 2 if a>b, 1 if tie
    val u2a = a.map(x => 2L * b.count(_ < x) + b.count(_ == x)).sum
    val u2b = b.map(x => 2L * a.count(_ < x) + a.count(_ == x)).sum
    val r = StatsOps.mannWhitney(spark, sf).collect().head
    assert(r.getLong(0) == a.length && r.getLong(1) == b.length)
    assert(r.getLong(2) == u2a && r.getLong(3) == u2b)
    assert(u2a + u2b == 2L * a.length * b.length)
  }

  test("q265 ≡ brute-force concordance census; counts partition pairs") {
    val daily = graft.Tables.events(spark, sf)
      .selectExpr("unix_micros(ts) div 86400000000 AS day", "value")
      .collect().map(r => (r.getLong(0), cents(r.getDouble(1))))
      .groupBy(_._1).view
      .mapValues(vs => (vs.length.toLong, vs.map(_._2).sum))
      .toSeq.sortBy(_._1)
    val pairs = for {
      i <- daily.indices; j <- daily.indices if i < j
    } yield (daily(i)._2._1 - daily(j)._2._1,
      daily(i)._2._2 - daily(j)._2._2)
    val c = pairs.count(p => p._1 * p._2 > 0).toLong
    val dd = pairs.count(p => p._1 * p._2 < 0).toLong
    val tx = pairs.count(p => p._1 == 0 && p._2 != 0).toLong
    val ty = pairs.count(p => p._2 == 0 && p._1 != 0).toLong
    val tb = pairs.count(p => p._1 == 0 && p._2 == 0).toLong
    val r = StatsOps.kendallTau(spark, sf).collect().head
    assert(r.getLong(0) == pairs.length)
    assert((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4),
      r.getLong(5)) == ((c, dd, tx, ty, tb)))
    assert(c + dd + tx + ty + tb == pairs.length)
    assert(r.getLong(6) == (c - dd) * 1000 / pairs.length ||
      r.getLong(6) == -((dd - c) * 1000 / pairs.length))
  }
}
