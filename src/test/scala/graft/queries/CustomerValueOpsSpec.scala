package graft.queries

import graft.TestSpark
import org.scalatest.funsuite.AnyFunSuite

/** q247/q248 — conservation + defining-inequality re-derivations. */
class CustomerValueOpsSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  private val sf = "/root/testdata/sf0.001"

  private def cents(v: Double): Long =
    java.math.BigDecimal.valueOf(v)
      .setScale(2, java.math.RoundingMode.HALF_UP)
      .movePointRight(2).longValueExact

  test("q247: curves conserve revenue, start at age 0, accumulate") {
    val orders = spark.read.parquet(s"$sf/orders.parquet")
      .select("o_custkey", "o_totalprice").collect()
    val total = orders.map(r => cents(r.getDouble(1))).sum
    val rows = CustomerValueOps.cohortLtv(spark, sf).collect()
      .map(r => (r.getInt(0), r.getInt(1), r.getLong(2), r.getLong(3),
        r.getLong(4)))
    assert(rows.map(_._4).sum == total) // revenue conservation
    val byCohort = rows.groupBy(_._1)
    byCohort.values.foreach { cs =>
      val sorted = cs.sortBy(_._2)
      assert(sorted.head._2 == 0) // cohort month itself is age 0
      // cumulative = running sum of rev, strictly non-decreasing
      var cum = 0L
      sorted.foreach { c => cum += c._4; assert(c._5 == cum) }
      sorted.foreach(c => assert(c._3 > 0))
    }
  }

  test("q248 ≡ driver weighted median per nation") {
    val li = spark.read.parquet(s"$sf/lineitem.parquet")
      .select("l_orderkey", "l_extendedprice", "l_quantity").collect()
      .map(r => (r.getLong(0), cents(r.getDouble(1)),
        r.getDouble(2).toLong))
    val o2c = spark.read.parquet(s"$sf/orders.parquet")
      .select("o_orderkey", "o_custkey").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toMap
    val c2n = spark.read.parquet(s"$sf/customer.parquet")
      .select("c_custkey", "c_nationkey").collect()
      .map(r => (r.getLong(0), r.getInt(1))).toMap
    val n2name = spark.read.parquet(s"$sf/nation.parquet")
      .select("n_nationkey", "n_name").collect()
      .map(r => (r.getInt(0), r.getString(1))).toMap
    val byNation = li.map { case (ok, c, w) =>
      (n2name(c2n(o2c(ok))), c, w)
    }.groupBy(_._1)
    val got = CustomerValueOps.weightedMedian(spark, sf).collect()
    assert(got.length == byNation.size)
    got.foreach { r =>
      val vs = byNation(r.getString(0))
      val total = vs.map(_._3).sum
      assert(r.getLong(1) == total)
      // defining inequalities of the lower weighted median
      val m = r.getLong(2)
      val below = vs.filter(_._2 < m).map(_._3).sum
      val upTo = vs.filter(_._2 <= m).map(_._3).sum
      assert(below * 2 < total, s"${r.getString(0)}: below mass")
      assert(upTo * 2 >= total, s"${r.getString(0)}: upTo mass")
      assert(vs.exists(_._2 == m)) // median is an observed value
    }
  }
}
