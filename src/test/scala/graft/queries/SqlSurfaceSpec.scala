package graft.queries

import graft.TestSpark
import org.scalatest.funsuite.AnyFunSuite

/** q216/q217/q218 re-derivations + decorrelation plan evidence. */
class SqlSurfaceSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  private val sf = "/root/testdata/sf0.001"

  test("q216 grouping sets: each granularity partitions the corpus") {
    val rows = SqlSurface.groupingSets(spark, sf).collect()
    val total = spark.read.parquet(s"$sf/documents.parquet").count()
    Seq(1, 2).foreach { gid =>
      assert(rows.filter(_.getInt(0) == gid).map(_.getLong(3)).sum == total)
    }
    val grand = rows.filter(_.getInt(0) == 3)
    assert(grand.length == 1 && grand.head.getLong(3) == total)
    assert(grand.head.isNullAt(1) && grand.head.isNullAt(2))
  }

  test("q217 ≡ driver above-average census; plan is DECORRELATED") {
    val cents = spark.read.parquet(s"$sf/customer.parquet")
      .selectExpr("c_nationkey",
        "CAST(CAST(c_acctbal AS DECIMAL(12,2)) * 100 AS BIGINT)")
      .collect().map(r => (r.getInt(0), r.getLong(1)))
    val exp = cents.groupBy(_._1).flatMap { case (nk, cs) =>
      val n = cs.length; val s1 = cs.map(_._2).sum
      val above = cs.map(_._2).filter(c => BigInt(c) * n > s1)
      if (above.nonEmpty) Some(nk -> ((above.length.toLong, above.sum)))
      else None
    }
    val df = SqlSurface.correlatedSubquery(spark, sf)
    val got = df.collect()
      .map(r => r.getInt(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(got == exp)
    // Catalyst rewrote both correlated scalars into aggregates + joins:
    // the optimized plan carries no subquery expression at all
    val optimized = df.queryExecution.optimizedPlan
    assert(!optimized.toString.contains("scalar-subquery"),
      "correlated scalar subqueries must decorrelate into joins")
  }

  test("q218 ≡ driver top-2 orders per nation") {
    val nat = spark.read.parquet(s"$sf/nation.parquet")
      .select("n_nationkey", "n_name").collect()
      .map(r => (r.getInt(0), r.getString(1))).toMap
    val cust = spark.read.parquet(s"$sf/customer.parquet")
      .select("c_custkey", "c_nationkey").collect()
      .map(r => (r.getLong(0), r.getInt(1))).toMap
    val exp = spark.read.parquet(s"$sf/orders.parquet")
      .select("o_orderkey", "o_custkey", "o_totalprice").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
      .groupBy(o => cust(o._2)).toSeq.flatMap { case (nk, os) =>
        os.sortBy(o => (-o._3, o._1)).take(2)
          .map(o => (nat(nk), o._1, o._3))
      }.sortBy(t => (t._1, -t._3, t._2))
    val got = SqlSurface.lateralTopOrders(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(2))).toSeq
    assert(got == exp)
  }
}
