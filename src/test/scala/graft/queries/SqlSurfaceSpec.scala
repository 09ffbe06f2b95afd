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

  test("q250: window-function surface obeys its defining identities") {
    val rows = SqlSurface.windowSurface(spark, sf).collect()
    val byCust = rows.groupBy(_.getLong(0))
    assert(byCust.nonEmpty)
    byCust.foreach { case (_, rs) =>
      val sorted = rs.sortBy(_.getInt(3))
      val n = sorted.length
      assert(n >= 2)
      // rn is 1..n; first/last frame values match the sequence ends
      assert(sorted.map(_.getInt(3)).toSeq == (1 to n))
      val cents = sorted.map(_.getLong(2))
      assert(sorted.forall(_.getLong(9) == cents.head))  // first_cents
      assert(sorted.forall(_.getLong(10) == cents.last)) // last_cents
      // nth_value(2) null on row 1, then the 2nd cents
      assert(sorted.head.isNullAt(11))
      sorted.tail.foreach(r => assert(r.getLong(11) == cents(1)))
      // lag/lead stitch the sequence
      assert(sorted.head.isNullAt(7) && sorted.last.isNullAt(8))
      sorted.sliding(2).foreach {
        case Array(a, b) =>
          assert(b.getLong(7) == a.getLong(2))
          assert(a.getLong(8) == b.getLong(2))
        case _ =>
      }
      // rank census: dense_rank is a gapless relabeling of rank;
      // ntile buckets differ by at most one, non-increasing
      val rnk = sorted.map(_.getInt(4)).sorted
      val drnk = sorted.map(_.getInt(5)).sorted
      assert(drnk.distinct.length == rnk.distinct.length)
      assert(drnk.distinct.toSeq == (1 to drnk.distinct.length))
      val tiles = sorted.map(_.getInt(6)).groupBy(identity).view
        .mapValues(_.length).toMap
      val sizes = tiles.toSeq.sortBy(_._1).map(_._2)
      assert(sizes.max - sizes.min <= 1)
      assert(sizes.zip(sizes.tail).forall(p => p._1 >= p._2))
      // exact relative positions
      sorted.foreach { r =>
        assert(r.getDouble(12) == (r.getInt(3) - 1).toDouble / (n - 1))
        assert(r.getDouble(13) == r.getInt(3).toDouble / n)
      }
    }
  }

  test("q263 array surface ≡ driver fold/extremes/adjacent gaps") {
    val cents = spark.read.parquet(s"$sf/orders.parquet")
      .selectExpr("o_custkey",
        "CAST(CAST(o_totalprice AS DECIMAL(12,2)) * 100 AS BIGINT)")
      .collect().map(r => (r.getLong(0), r.getLong(1)))
      .groupBy(_._1).view.mapValues(_.map(_._2).sorted.toSeq)
      .filter(_._2.length >= 2).toMap
    val got = SqlSurface.arraySurface(spark, sf).collect()
    assert(got.length == cents.size)
    got.foreach { r =>
      val arr = cents(r.getLong(0))
      assert(r.getInt(1) == arr.length)
      assert(r.getLong(2) == arr.sum)
      assert(r.getLong(3) == arr.max && r.getLong(4) == arr.min)
      assert(r.getLong(5) == arr(arr.length - 1) - arr(arr.length - 2))
      assert(r.getLong(6) ==
        arr.zip(arr.tail).map(p => p._2 - p._1).max)
    }
  }

  test("q262 multiset ops ≡ driver multiplicity arithmetic") {
    val o = spark.read.parquet(s"$sf/orders.parquet")
      .select("o_custkey", "o_orderpriority", "o_orderstatus").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2)))
    def multi(st: String) = o.filter(_._3 == st)
      .groupBy(x => (x._1, x._2)).view.mapValues(_.length).toMap
    val f = multi("F"); val p = multi("O")
    // .toSeq first: mapping a Map to (priority -> n) collapses keys
    // (the NOTES_r8 Map-view dedup trap)
    val inter = f.toSeq.map { case (k, n) =>
      k._2 -> math.min(n, p.getOrElse(k, 0)) }
      .groupBy(_._1).view.mapValues(_.map(_._2.toLong).sum).toMap
    val diff = f.toSeq.map { case (k, n) =>
      k._2 -> math.max(0, n - p.getOrElse(k, 0)) }
      .groupBy(_._1).view.mapValues(_.map(_._2.toLong).sum).toMap
    val got = SetOps.multisetOps(spark, sf).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    got.foreach { case (pri, (ni, ne)) =>
      assert(ni == inter.getOrElse(pri, 0L), s"$pri intersect")
      assert(ne == diff.getOrElse(pri, 0L), s"$pri except")
    }
    assert(inter.filter(_._2 > 0).keySet.subsetOf(got.keySet))
    assert(diff.filter(_._2 > 0).keySet.subsetOf(got.keySet))
    assert(got.values.exists(v => v._1 > 0 && v._2 > 0))
  }
}
