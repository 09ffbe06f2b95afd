package graft.queries

import graft.TestSpark
import org.scalatest.funsuite.AnyFunSuite

/** q205/q206/q210 re-derivations against literal driver-side scans. */
class AuditOpsSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  private val sf = "/root/testdata/sf0.001"

  test("q205 ≡ driver set-difference orphan census per edge") {
    def keys(t: String, c: String): Seq[Long] =
      spark.read.parquet(s"$sf/$t.parquet").select(c).collect()
        .map(r => r.get(0) match {
          case l: java.lang.Long => l.longValue
          case i: java.lang.Integer => i.longValue
        }).toSeq
    val edges = Seq(
      ("lineitem.l_orderkey->orders", keys("lineitem", "l_orderkey"),
        keys("orders", "o_orderkey")),
      ("orders.o_custkey->customer", keys("orders", "o_custkey"),
        keys("customer", "c_custkey")),
      ("nation.n_regionkey->region", keys("nation", "n_regionkey"),
        keys("region", "r_regionkey")))
    val got = AuditOps.fkIntegrity(spark, sf).collect()
      .map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    assert(got.size == 6)
    edges.foreach { case (name, child, parent) =>
      val ps = parent.toSet
      val orphans = child.filterNot(ps)
      assert(got(name) ==
        ((child.length.toLong, orphans.length.toLong,
          orphans.distinct.length.toLong)), name)
    }
  }

  test("q206 ≡ driver tie-sharing rank percentiles; source means bounded") {
    val docs = spark.read.parquet(s"$sf/documents.parquet")
      .select("source", "n_chars").collect()
      .map(r => (r.getString(0), r.getLong(1)))
    val n = docs.length.toLong
    val freq = docs.groupBy(_._2).view.mapValues(_.length.toLong).toMap
    val below = freq.keys
      .map(v => (v, freq.filter(_._1 < v).values.sum)).toMap
    val exp = docs.groupBy(_._1).map { case (src, ds) =>
      val prs = ds.map(d => below(d._2) * 1000000L / (n - 1))
      (src, (ds.length.toLong, prs.sum / ds.length,
        prs.min, prs.max))
    }
    val got = AuditOps.quantileNormalize(spark, sf).collect()
      .map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))).toMap
    assert(got == exp)
  }

  test("q210 quotas sum EXACTLY to the budget and stay within ±1 of " +
    "proportional") {
    val rows = AuditOps.sampleAllocation(spark, sf).collect()
    val total = rows.map(_.getLong(2)).sum
    assert(rows.map(_.getLong(3)).sum == 10000L)
    rows.foreach { r =>
      val floorQ = 10000L * r.getLong(2) / total
      assert(r.getLong(3) == floorQ || r.getLong(3) == floorQ + 1)
    }
  }

  test("q214 ≡ driver cascade census over the deletion cohort") {
    def col0(t: String, c: String) =
      spark.read.parquet(s"$sf/$t.parquet").select(c).collect()
    val custs = col0("customer", "c_custkey").map(_.getLong(0))
      .filter(_ % 100 == 0).toSet
    val orders = col0("orders", "o_custkey").map(_.getLong(0))
    val ordersK = spark.read.parquet(s"$sf/orders.parquet")
      .select("o_orderkey", "o_custkey").collect()
      .map(r => (r.getLong(0), r.getLong(1))).filter(p => custs(p._2))
    val ordKeys = ordersK.map(_._1).toSet
    val li = col0("lineitem", "l_orderkey").map(_.getLong(0))
      .filter(ordKeys)
    val ev = col0("events", "user_id").map(_.getLong(0))
      .filter(_ % 100 == 0)
    val got = AuditOps.forgetCascade(spark, sf).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(got("customer") == ((custs.size.toLong, custs.size.toLong)))
    assert(got("orders") ==
      ((ordersK.map(_._2).distinct.length.toLong, ordersK.length.toLong)))
    assert(got("lineitem") ==
      ((li.distinct.length.toLong, li.length.toLong)))
    assert(got("events") ==
      ((ev.distinct.length.toLong, ev.length.toLong)))
  }

  test("q237 ≡ driver recurring-amount scan") {
    import java.math.{BigDecimal => JBD, RoundingMode}
    val o = spark.read.parquet(s"$sf/orders.parquet")
      .selectExpr("o_orderkey", "o_custkey",
        "unix_micros(CAST(o_orderdate AS TIMESTAMP)) div 86400000000",
        "o_totalprice").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        JBD.valueOf(r.getDouble(3)).setScale(2, RoundingMode.HALF_UP)
          .movePointRight(2).longValueExact / 100000L))
    val exp = (for {
      a <- o; b <- o
      if a._2 == b._2 && a._4 == b._4 && a._1 < b._1 &&
        math.abs(a._3 - b._3) <= 365
    } yield (a._2, a._4, a._1, b._1, math.abs(a._3 - b._3)))
      .sortBy(t => (t._1, t._2, t._3, t._4)).toSeq
    val got = AuditOps.dupInvoices(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4))).toSeq
    assert(got == exp)
    assert(got.nonEmpty, "parameters must produce signal on this data")
  }

  test("q238 Benford: census partitions orders; constants are Benford") {
    val rows = AuditOps.benford(spark, sf).collect()
    assert(rows.map(_.getLong(0)).toSeq == (1L to 9L))
    val n = spark.read.parquet(s"$sf/orders.parquet").count()
    assert(rows.map(_.getLong(1)).sum == n)
    rows.foreach { r =>
      val d = r.getLong(0).toInt
      assert(r.getLong(2) == (math.log10(1.0 + 1.0 / d) * 1e6).toLong)
      val (obs, exp) = (BigInt(r.getLong(1)), BigInt(r.getLong(2)))
      val dev = obs * 1000000 - BigInt(n) * exp
      assert(r.getLong(4) == dev * dev / (BigInt(n) * exp * 1000))
    }
  }
}
