package graft.queries

import graft.TestSpark
import org.scalatest.funsuite.AnyFunSuite

/** q301/q302/q303 — driver re-derivations of the classic rollups. */
class TpchClassicsSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  private val sf = "/root/testdata/sf0.001"

  private def cents(v: Double): Long =
    java.math.BigDecimal.valueOf(v)
      .setScale(2, java.math.RoundingMode.HALF_UP)
      .movePointRight(2).longValueExact

  private lazy val li = spark.read.parquet(s"$sf/lineitem.parquet")
    .selectExpr("l_orderkey", "l_suppkey", "l_extendedprice",
      "l_discount", "l_returnflag",
      "unix_micros(CAST(l_shipdate AS TIMESTAMP))").collect()
    .map(r => (r.getLong(0), r.getLong(1),
      cents(r.getDouble(2)) * (100 - cents(r.getDouble(3))),
      r.getString(4), r.getLong(5)))

  private lazy val orders = spark.read.parquet(s"$sf/orders.parquet")
    .selectExpr("o_orderkey", "o_custkey",
      "unix_micros(CAST(o_orderdate AS TIMESTAMP))",
      "year(o_orderdate)", "o_orderpriority").collect()
    .map(r => (r.getLong(0), (r.getLong(1), r.getLong(2), r.getInt(3),
      r.getString(4)))).toMap

  private lazy val cust = spark.read.parquet(s"$sf/customer.parquet")
    .select("c_custkey", "c_mktsegment", "c_nationkey", "c_name")
    .collect()
    .map(r => (r.getLong(0), (r.getString(1), r.getInt(2),
      r.getString(3)))).toMap

  test("q301 ≡ driver top-10 shipped-late revenue (BUILDING)") {
    val rev = li.filter { l =>
      val o = orders(l._1)
      cust(o._1)._1 == "BUILDING" && l._5 > o._2
    }.groupBy(_._1).view.mapValues(_.map(_._3).sum).toMap
    val expect = rev.toSeq.sortBy { case (k, v) => (-v, k) }.take(10)
    val got = TpchClassics.shippingPriority(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(3)))
    assert(got.map(_._1).toSeq == expect.map(_._1))
    assert(got.map(_._2).toSeq == expect.map(_._2))
  }

  test("q302 ≡ driver same-nation revenue census") {
    val sup = spark.read.parquet(s"$sf/supplier.parquet")
      .select("s_suppkey", "s_nationkey").collect()
      .map(r => (r.getLong(0), r.getInt(1))).toMap
    val nat = spark.read.parquet(s"$sf/nation.parquet")
      .select("n_nationkey", "n_name").collect()
      .map(r => (r.getInt(0), r.getString(1))).toMap
    val expect = li.flatMap { l =>
      val o = orders(l._1)
      val cn = cust(o._1)._2
      if (cn == sup(l._2)) Some(((nat(cn), o._3), l._3)) else None
    }.groupBy(_._1).view
      .mapValues(vs => (vs.length.toLong, vs.map(_._2).sum)).toMap
    val got = TpchClassics.localSupplierVolume(spark, sf).collect()
      .map(r => (r.getString(0), r.getInt(1)) ->
        ((r.getLong(2), r.getLong(3)))).toMap
    assert(got == expect)
    assert(got.nonEmpty)
  }

  test("q304 + q302 partition the joined revenue (flow conservation)") {
    val sup = spark.read.parquet(s"$sf/supplier.parquet")
      .select("s_suppkey", "s_nationkey").collect()
      .map(r => (r.getLong(0), r.getInt(1))).toMap
    val total = li.map { l =>
      (cust(orders(l._1)._1)._2 == sup(l._2), l._3)
    }
    val localRev = total.filter(_._1).map(_._2).sum
    val crossRev = total.filterNot(_._1).map(_._2).sum
    val gotLocal = TpchClassics.localSupplierVolume(spark, sf).collect()
      .map(_.getLong(3)).sum
    val gotCross = TpchClassics.tradeFlows(spark, sf).collect()
      .map(_.getLong(3)).sum
    assert(gotLocal == localRev && gotCross == crossRev)
    assert(gotLocal + gotCross == li.map(_._3).sum)
  }

  test("q305 ≡ driver EXISTS census; at most one count per order") {
    val lateOrders = li.filter(l => l._5 > orders(l._1)._2)
      .map(_._1).distinct.toSet
    val expect = lateOrders.toSeq.map(o => orders(o)._4)
      .groupBy(identity).view.mapValues(_.size.toLong).toMap
    val got = TpchClassics.priorityExists(spark, sf).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got == expect)
    assert(got.values.sum == lateOrders.size.toLong)
  }

  test("q303 ≡ driver returned-revenue top-20 (1997)") {
    val expect = li.filter(_._4 == "R").flatMap { l =>
      val o = orders(l._1)
      if (o._3 == 1997) Some((o._1, l._3)) else None
    }.groupBy(_._1).view
      .mapValues(vs => (vs.length.toLong, vs.map(_._2).sum)).toSeq
      .sortBy { case (k, (_, v)) => (-v, k) }.take(20)
    val got = TpchClassics.returnedCustomers(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(3), r.getLong(4)))
    assert(got.map(_._1).toSeq == expect.map(_._1))
    got.zip(expect).foreach { case (g, (_, (n, v))) =>
      assert(g._2 == n && g._3 == v)
    }
  }
}
