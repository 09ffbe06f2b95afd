package graft.queries

import graft.TestSpark
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Sinks.writeBucketed: two tables bucketed+sorted by the join key into
  * the same bucket count must join with ZERO shuffle exchanges — the
  * write-time shuffle amortizes across every downstream join, the core
  * co-location trick for repeated fact-fact joins at 100 TB. */
class BucketedJoinSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  test("bucketed join plans with no Exchange and matches the plain join") {
    val d = "/root/testdata/sf0.001"
    val prevThreshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    // disable broadcast so the join-strategy choice is SMJ/SHJ — the
    // co-location claim is about the exchange, not the join algorithm
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      graft.sinks.Sinks.writeBucketed(graft.Tables.lineitem(spark, d),
        "li_bucketed", "/tmp/graft_bucketed/li", "l_orderkey", buckets = 8)
      graft.sinks.Sinks.writeBucketed(graft.Tables.orders(spark, d),
        "ord_bucketed", "/tmp/graft_bucketed/ord", "o_orderkey", buckets = 8)
      val joined = spark.table("li_bucketed")
        .join(spark.table("ord_bucketed"),
          col("l_orderkey") === col("o_orderkey"))
      val plan = joined.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange"), plan.take(3000))
      // same answer as the unbucketed join
      val expected = graft.Tables.lineitem(spark, d)
        .join(graft.Tables.orders(spark, d),
          col("l_orderkey") === col("o_orderkey")).count()
      assert(joined.count() == expected)
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThreshold)
      spark.sql("DROP TABLE IF EXISTS li_bucketed")
      spark.sql("DROP TABLE IF EXISTS ord_bucketed")
    }
  }

  test("approx_count_distinct tracks exact distinct within its rsd bound") {
    // the documented 100 TB fallback for A4 exact-distinct: verify the
    // estimator's error on real data before trusting it at scale
    val d = "/root/testdata/sf0.01"
    val r = graft.Tables.orders(spark, d)
      .agg(countDistinct(col("o_custkey")).as("exact"),
        approx_count_distinct(col("o_custkey"), 0.02).as("approx"))
      .head()
    val exact = r.getAs[Long]("exact").toDouble
    val approx = r.getAs[Long]("approx").toDouble
    assert(math.abs(approx - exact) / exact < 0.06,
      s"approx $approx vs exact $exact")
  }
}
