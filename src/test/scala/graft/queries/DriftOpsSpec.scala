package graft.queries

import graft.TestSpark
import org.scalatest.funsuite.AnyFunSuite

/** q285/q286 — driver re-derivations. */
class DriftOpsSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  private val sf = "/root/testdata/sf0.001"

  private def cents(v: Double): Long =
    java.math.BigDecimal.valueOf(v)
      .setScale(2, java.math.RoundingMode.HALF_UP)
      .movePointRight(2).longValueExact

  test("q285 ≡ driver pooled deciles; buckets near-balanced pooled") {
    val o = spark.read.parquet(s"$sf/orders.parquet")
      .selectExpr("unix_micros(CAST(o_orderdate AS TIMESTAMP))" +
        " div 86400000000 AS day", "o_totalprice").collect()
      .map(r => (r.getLong(0), cents(r.getDouble(1))))
    val mid = (o.map(_._1).min + o.map(_._1).max) / 2
    val sorted = o.map(_._2).sorted
    val total = sorted.length.toLong
    val below = sorted.distinct.map(v =>
      v -> sorted.count(_ < v).toLong).toMap
    def bucket(v: Long) = below(v) * 10 / total + 1
    val n1 = o.count(_._1 <= mid).toLong
    val n2 = total - n1
    val expect = o.groupBy(x => bucket(x._2)).view.mapValues { vs =>
      val c1 = vs.count(_._1 <= mid).toLong
      val c2 = vs.length - c1
      (c1, c2.toLong, c1 * 1000000L / n1, c2 * 1000000L / n2,
        math.abs(c1 * 1000000L / n1 - c2 * 1000000L / n2))
    }.toMap
    val got = DriftOps.psiBuckets(spark, sf).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getLong(5)))).toMap
    assert(got == expect)
    // pooled decile balance: each bucket holds total/10 ± 1 values
    got.foreach { case (_, c) =>
      val pooled = c._1 + c._2
      assert(math.abs(pooled - total / 10) <= 1)
    }
  }

  test("q286 ≡ driver return-rate census") {
    val li = spark.read.parquet(s"$sf/lineitem.parquet")
      .select("l_orderkey", "l_returnflag", "l_extendedprice").collect()
      .map(r => (r.getLong(0), r.getString(1), cents(r.getDouble(2))))
    val o = spark.read.parquet(s"$sf/orders.parquet")
      .selectExpr("o_orderkey", "o_orderpriority",
        "year(o_orderdate)").collect()
      .map(r => (r.getLong(0), (r.getString(1), r.getInt(2)))).toMap
    val expect = li.groupBy(x => o(x._1)).view.mapValues { vs =>
      val n = vs.length.toLong
      val nr = vs.count(_._2 == "R").toLong
      val rev = vs.map(_._3).sum
      val rrev = vs.filter(_._2 == "R").map(_._3).sum
      (n, nr, nr * 1000000L / n, rrev * 1000000L / rev)
    }.toMap
    val got = DriftOps.returnRates(spark, sf).collect()
      .map(r => (r.getString(0), r.getInt(1)) -> ((r.getLong(2),
        r.getLong(3), r.getLong(4), r.getLong(5)))).toMap
    assert(got == expect)
    assert(got.values.exists(_._2 > 0), "returns must occur")
  }
}
