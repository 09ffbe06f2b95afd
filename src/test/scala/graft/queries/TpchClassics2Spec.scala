package graft.queries

import graft.TestSpark
import org.scalatest.funsuite.AnyFunSuite

/** Fixture pins for the TPC-H completion pack — the cases the oracle
  * compare can't isolate on production data: q328's only-late-supplier
  * flag logic, q316's packed argmin tiebreak, q321's zero-order bucket
  * (vacuous on this testdata — every customer has orders — so the left
  * join's reason to exist is witnessed here). */
class TpchClassics2Spec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def tmp(): String =
    java.nio.file.Files.createTempDirectory("graft_tpch2").toString

  test("q328 fixture: only-late supplier on multi-supplier orders") {
    val dir = tmp()
    val base = java.sql.Timestamp.valueOf("1997-01-01 00:00:00")
    def ship(days: Int) = new java.sql.Timestamp(
      base.getTime + days * 86400000L)
    // o1: two suppliers, only s1 late -> s1 counted
    // o2: two suppliers, both late  -> nobody counted
    // o3: one supplier, late        -> not counted (single-supplier)
    // o4: two suppliers, none late  -> nobody counted
    Seq(
      (1L, 10L, ship(40)), (1L, 20L, ship(5)),
      (2L, 10L, ship(40)), (2L, 20L, ship(45)),
      (3L, 10L, ship(40)),
      (4L, 10L, ship(5)), (4L, 20L, ship(6)))
      .toDF("l_orderkey", "l_suppkey", "l_shipdate")
      .selectExpr("l_orderkey", "l_suppkey", "l_shipdate",
        "1.0 AS l_extendedprice", "0.0 AS l_discount",
        "1.0 AS l_quantity")
      .write.parquet(s"$dir/lineitem.parquet")
    Seq((1L, base), (2L, base), (3L, base), (4L, base))
      .toDF("o_orderkey", "o_orderdate")
      .write.parquet(s"$dir/orders.parquet")
    Seq((10L, "S#10", 0, 1.0), (20L, "S#20", 0, 1.0))
      .toDF("s_suppkey", "s_name", "s_nationkey", "s_acctbal")
      .write.parquet(s"$dir/supplier.parquet")
    val got = TpchClassics2.waitingSupplier(spark, dir).collect()
      .map(r => (r.getString(0), r.getLong(1)))
    assert(got.toSeq == Seq(("S#10", 1L)))
  }

  test("q316 fixture: packed argmin picks min offer, ties to min suppkey") {
    val dir = tmp()
    // part 1: s20 cheaper; part 2: tie at 500 cents -> s10 wins
    Seq(
      (1L, 10L, 7.00), (1L, 20L, 6.00),
      (2L, 10L, 5.00), (2L, 20L, 5.00))
      .toDF("l_partkey", "l_suppkey", "l_extendedprice")
      .selectExpr("l_partkey", "l_suppkey", "l_extendedprice",
        "1.0 AS l_quantity", "0.0 AS l_discount")
      .write.parquet(s"$dir/lineitem.parquet")
    Seq((1L, "p1", 15), (2L, "p2", 15))
      .toDF("p_partkey", "p_name", "p_size")
      .selectExpr("p_partkey", "p_name", "p_size",
        "'Brand#9' AS p_brand", "'PROMO' AS p_type",
        "900.0 AS p_retailprice")
      .write.parquet(s"$dir/part.parquet")
    Seq((10L, "S#10", 0, 1.0), (20L, "S#20", 1, 1.0))
      .toDF("s_suppkey", "s_name", "s_nationkey", "s_acctbal")
      .write.parquet(s"$dir/supplier.parquet")
    Seq((0, "N0", 0), (1, "N1", 0))
      .toDF("n_nationkey", "n_name", "n_regionkey")
      .write.parquet(s"$dir/nation.parquet")
    val got = TpchClassics2.minCostSupplier(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(2), r.getString(3))).toSet
    assert(got == Set((1L, 600L, "S#20"), (2L, 500L, "S#10")))
  }

  test("q321 fixture: zero-order customers land in the 0 bucket") {
    val dir = tmp()
    Seq((1L, "c1", 0, 1.0, "BUILDING"), (2L, "c2", 0, 1.0, "BUILDING"),
      (3L, "c3", 0, 1.0, "BUILDING"))
      .toDF("c_custkey", "c_name", "c_nationkey", "c_acctbal",
        "c_mktsegment")
      .write.parquet(s"$dir/customer.parquet")
    val base = java.sql.Timestamp.valueOf("1997-01-01 00:00:00")
    Seq((1L, 1L, base), (2L, 1L, base), (3L, 2L, base))
      .toDF("o_orderkey", "o_custkey", "o_orderdate")
      .write.parquet(s"$dir/orders.parquet")
    val got = TpchClassics2.orderCountDist(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(got == Map(2L -> 1L, 1L -> 1L, 0L -> 1L))
  }
}
