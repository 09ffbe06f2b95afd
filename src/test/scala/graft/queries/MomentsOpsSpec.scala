package graft.queries

import graft.TestSpark
import org.scalatest.funsuite.AnyFunSuite

/** q282/q283/q284 — BigInt driver re-derivations of the moment forms. */
class MomentsOpsSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  private val sf = "/root/testdata/sf0.001"

  private def cents(v: Double): Long =
    java.math.BigDecimal.valueOf(v)
      .setScale(2, java.math.RoundingMode.HALF_UP)
      .movePointRight(2).longValueExact

  private def regionOf: Map[Long, String] = {
    val cust = spark.read.parquet(s"$sf/customer.parquet")
      .select("c_custkey", "c_nationkey").collect()
      .map(r => (r.getLong(0), r.getInt(1))).toMap
    val nat = spark.read.parquet(s"$sf/nation.parquet")
      .select("n_nationkey", "n_regionkey").collect()
      .map(r => (r.getInt(0), r.getInt(1))).toMap
    val reg = spark.read.parquet(s"$sf/region.parquet")
      .select("r_regionkey", "r_name").collect()
      .map(r => (r.getInt(0), r.getString(1))).toMap
    cust.map { case (c, n) => c -> reg(nat(n)) }
  }

  test("q282 ≡ BigInt moments; SS decomposition law holds") {
    val r = regionOf
    val xs = spark.read.parquet(s"$sf/orders.parquet")
      .select("o_custkey", "o_totalprice").collect()
      .map(x => (r(x.getLong(0)), BigInt(cents(x.getDouble(1)))))
    val per = xs.groupBy(_._1).view.mapValues { vs =>
      val v = vs.map(_._2)
      (v.size, v.sum, v.map(x => x * x).sum)
    }.toMap
    // sum_x2/ss_xn ship as canonical decimal strings (driver float64
    // compare contract) — parse them back to BigInt here
    val got = MomentsOps.anovaMoments(spark, sf).collect()
      .map(x => x.getString(0) -> ((x.getLong(1),
        BigInt(x.getLong(2)),
        BigInt(x.getString(3)),
        BigInt(x.getString(4))))).toMap
    per.foreach { case (name, (n, s1, s2)) =>
      assert(got(name) == ((n.toLong, s1, s2, n * s2 - s1 * s1)))
    }
    val all = got("ALL")
    assert(all._1 == xs.length)
    assert(all._2 == xs.map(_._2).sum)
    // SS_total*n >= sum over groups of (n/n_g)-weighted within SS --
    // check the exact decomposition on BigInt: SS_tot = SS_within +
    // SS_between where SS forms are mean-relative; with the n-scaled
    // forms the law is checked through the raw moments instead:
    assert(all._4 == all._1 * all._3 - all._2 * all._2)
  }

  test("q283 ≡ BigInt chi-square terms") {
    val r = regionOf
    val cells = spark.read.parquet(s"$sf/orders.parquet")
      .select("o_custkey", "o_orderstatus").collect()
      .map(x => (r(x.getLong(0)), x.getString(1)))
    val byCell = cells.groupBy(identity).view.mapValues(_.length).toMap
    val rowN = cells.groupBy(_._1).view.mapValues(_.length).toMap
    val colN = cells.groupBy(_._2).view.mapValues(_.length).toMap
    val n = BigInt(cells.length)
    val got = MomentsOps.chi2Independence(spark, sf).collect()
    assert(got.length == byCell.size)
    got.foreach { x =>
      val key = (x.getString(0), x.getString(1))
      val obs = BigInt(byCell(key))
      assert(x.getLong(2) == obs.toLong)
      val num = n * obs - BigInt(rowN(key._1)) * BigInt(colN(key._2))
      val expect = num * num * 1000 /
        (n * BigInt(rowN(key._1)) * BigInt(colN(key._2)))
      assert(BigInt(x.getLong(3)) == expect, key)
    }
  }

  test("q284 ≡ BigInt covariance moments") {
    val li = spark.read.parquet(s"$sf/lineitem.parquet")
      .select("l_quantity", "l_extendedprice", "l_discount").collect()
      .map(x => (BigInt(x.getDouble(0).toLong),
        BigInt(cents(x.getDouble(1))), BigInt(cents(x.getDouble(2)))))
    val n = BigInt(li.length)
    def check(pair: String, fx: ((BigInt, BigInt, BigInt)) => BigInt,
        fy: ((BigInt, BigInt, BigInt)) => BigInt,
        row: org.apache.spark.sql.Row): Unit = {
      val sx = li.map(fx).sum; val sy = li.map(fy).sum
      val sxy = li.map(v => fx(v) * fy(v)).sum
      assert(row.getLong(1) == li.length.toLong)
      assert(BigInt(row.getLong(2)) == sx)
      assert(BigInt(row.getLong(3)) == sy)
      // sum_xy/cov_xn ship as canonical decimal strings (driver contract)
      assert(BigInt(row.getString(4)) == sxy)
      assert(BigInt(row.getString(5)) == n * sxy - sx * sy)
    }
    val got = MomentsOps.covMatrix(spark, sf).collect()
      .map(r0 => r0.getString(0) -> r0).toMap
    check("qty_price", _._1, _._2, got("qty_price"))
    check("qty_disc", _._1, _._3, got("qty_disc"))
    check("price_disc", _._2, _._3, got("price_disc"))
    // (no sign assumption: on this synthetic data the variables are
    // independent draws — qty_price covariance is in fact slightly
    // negative; the exact-equality checks above are the contract)
  }
}
