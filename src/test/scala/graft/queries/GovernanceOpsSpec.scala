package graft.queries

import graft.TestSpark
import org.scalatest.funsuite.AnyFunSuite

/** q244/q245/q246 — driver re-derivations + contract properties. */
class GovernanceOpsSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  private val sf = "/root/testdata/sf0.001"

  private def cents(v: Double): Long =
    java.math.BigDecimal.valueOf(v)
      .setScale(2, java.math.RoundingMode.HALF_UP)
      .movePointRight(2).longValueExact

  test("q244 ≡ driver class census; generalization can only raise k") {
    val qi = spark.read.parquet(s"$sf/customer.parquet")
      .select("c_mktsegment", "c_nationkey", "c_acctbal").collect()
      .map(r => (r.getString(0), r.getInt(1),
        cents(r.getDouble(2)) / 100000))
    def census(classes: Map[_, Int]): (Long, Long, Long) =
      (classes.size.toLong, classes.values.min.toLong,
        classes.values.filter(_ < 5).map(_.toLong).sum)
    val l0 = census(qi.groupBy(identity).view.mapValues(_.length).toMap)
    val l1 = census(qi.map(t => (t._1, t._2))
      .groupBy(identity).view.mapValues(_.length).toMap)
    val rows = GovernanceOps.kAnonymity(spark, sf).collect()
      .map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    assert(rows("L0_segment_nation_balance") == l0)
    assert(rows("L1_segment_nation") == l1)
    assert(l1._2 >= l0._2) // dropping a QI column cannot shrink classes
  }

  test("q245: contract rules hold, screening rules fire, counts exact") {
    val rows = GovernanceOps.dqRules(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(2), r.getLong(3),
        r.getBoolean(4)))
    val byId = rows.map(r => r._1 -> r).toMap
    // contract rules must pass on the synthetic data
    Seq("R01_price_positive", "R02_status_domain", "R03_qty_range")
      .foreach(id => assert(byId(id)._4, s"$id should pass"))
    // screening thresholds must fire — a zero-count audit is vacuous
    Seq("R04_price_outlier", "R05_qty_high")
      .foreach(id => assert(byId(id)._3 > 0, s"$id should fire"))
    rows.foreach(r => assert(r._4 == (r._3 == 0L)))
    // one rule fully re-derived
    val hi = spark.read.parquet(s"$sf/lineitem.parquet")
      .select("l_quantity").collect().count(_.getDouble(0) > 45)
    assert(byId("R05_qty_high")._3 == hi)
  }

  test("q246: merge emits 1 row per unchanged, 2 per changed customer") {
    val cust = spark.read.parquet(s"$sf/customer.parquet")
      .select("c_custkey", "c_mktsegment").collect()
      .map(r => (r.getLong(0), r.getString(1)))
    val changed = cust.filter(_._1 % 10 == 3)
    val rows = GovernanceOps.scd2Merge(spark, sf).collect()
    assert(rows.length == cust.length + changed.length)
    val byKey = rows.groupBy(_.getLong(0))
    changed.foreach { case (k, seg) =>
      val vs = byKey(k).sortBy(_.getLong(2))
      assert(vs.length == 2)
      val closed = vs.head; val opened = vs.last
      assert(closed.getString(1) == seg && !closed.getBoolean(4) &&
        closed.getLong(3) == 10500L)
      assert(opened.getString(1) == "UPGRADED" &&
        opened.getBoolean(4) && opened.isNullAt(3) &&
        opened.getLong(2) == 10500L)
    }
    cust.filter(_._1 % 10 != 3).foreach { case (k, seg) =>
      val vs = byKey(k)
      assert(vs.length == 1 && vs.head.getString(1) == seg &&
        vs.head.getBoolean(4) && vs.head.isNullAt(3))
    }
  }
}
