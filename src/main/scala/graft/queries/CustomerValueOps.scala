package graft.queries

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Customer-value analytics:
  *
  *  - q247: cohort LTV curves — customers cohorted by first-order
  *    month, revenue accumulated by cohort age in exact integer cents;
  *    the cumulative column is the LTV curve a growth dashboard plots.
  *  - q248: exact weighted median unit price per nation — weighted by
  *    quantity, computed join-free on the bounded (nation, distinct
  *    price) frame with a cumulative-weight window: the lower weighted
  *    median is the smallest price whose cumulative weight reaches
  *    half the total (2·cum ≥ total avoids any division).
  *
  * Ref: the reference's trade-stats serving queries aggregate revenue
  * by date (publisher TradeStatsController); q247 is that rollup
  * re-keyed to cohort age, q248 the robust-center companion to its
  * averages.
  *
  * Scale (100 TB): q247 is two grouped aggregations (first-order month
  * is a per-customer min; the curve frame is cohorts × ages, bounded by
  * the calendar) plus a window over that bounded frame. q248's window
  * runs on the distinct-price-per-nation frame — price domains are
  * bounded, the corpus-scale table is only scanned and pre-aggregated
  * map-side. Neither sorts the fact table.
  *
  * Determinism: all sums are integer cents (decimal-cast raw columns,
  * never computed doubles); weights are integral doubles cast to long
  * (identical in both engines on integral values).
  */
object CustomerValueOps {

  /** q247: cohort-month × age revenue + cumulative LTV, integer cents. */
  def cohortLtv(s: SparkSession, d: String): DataFrame = {
    val o = Tables.orders(s, d).select(col("o_custkey"),
      (year(col("o_orderdate")) * 12 + month(col("o_orderdate")))
        .as("omonth"),
      expr("CAST(CAST(o_totalprice AS DECIMAL(12,2)) * 100 AS BIGINT)")
        .as("cents"))
    val cohort = o.groupBy(col("o_custkey"))
      .agg(min(col("omonth")).as("cohort_month"))
    val curve = o.join(cohort, "o_custkey")
      .withColumn("age_months", col("omonth") - col("cohort_month"))
      .groupBy(col("cohort_month"), col("age_months"))
      .agg(count_distinct(col("o_custkey")).as("n_active"),
        sum(col("cents")).as("rev_cents"))
    curve.withColumn("cum_rev_cents", sum(col("rev_cents")).over(
        Window.partitionBy(col("cohort_month")).orderBy(col("age_months"))
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .orderBy(col("cohort_month"), col("age_months"))
  }

  /** q248: exact lower weighted median of unit price per nation. */
  def weightedMedian(s: SparkSession, d: String): DataFrame = {
    val li = Tables.lineitem(s, d)
      .join(Tables.orders(s, d), col("l_orderkey") === col("o_orderkey"))
      .join(Tables.customer(s, d), col("o_custkey") === col("c_custkey"))
      .join(broadcast(Tables.nation(s, d)),
        col("c_nationkey") === col("n_nationkey"))
      .select(col("n_name"),
        expr("CAST(CAST(l_extendedprice AS DECIMAL(12,2)) * 100" +
          " AS BIGINT)").as("cents"),
        expr("CAST(l_quantity AS BIGINT)").as("wt"))
    val freq = li.groupBy(col("n_name"), col("cents"))
      .agg(sum(col("wt")).as("w"))
    val w = Window.partitionBy(col("n_name")).orderBy(col("cents"))
    val cum = freq.withColumn("cum_w", sum(col("w")).over(
        w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .withColumn("total_w", sum(col("w")).over(
        Window.partitionBy(col("n_name"))))
    cum.filter(col("cum_w") * 2 >= col("total_w"))
      .groupBy(col("n_name"))
      .agg(max(col("total_w")).as("total_weight"),
        min(col("cents")).as("w_median_cents"))
      .orderBy(col("n_name"))
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q247_cohort_ltv" -> cohortLtv,
    "q248_weighted_median" -> weightedMedian)

  val oracle: Map[String, String] = Map(
    "q247_cohort_ltv" ->
      """WITH o AS (
        |  SELECT o_custkey,
        |    year(o_orderdate) * 12 + month(o_orderdate) AS omonth,
        |    CAST(CAST(o_totalprice AS DECIMAL(12,2)) * 100 AS BIGINT)
        |      AS cents
        |  FROM orders),
        |cohort AS (
        |  SELECT o_custkey, MIN(omonth) AS cohort_month
        |  FROM o GROUP BY o_custkey),
        |curve AS (
        |  SELECT cohort_month, omonth - cohort_month AS age_months,
        |    COUNT(DISTINCT o.o_custkey) AS n_active,
        |    CAST(SUM(cents) AS BIGINT) AS rev_cents
        |  FROM o JOIN cohort ON o.o_custkey = cohort.o_custkey
        |  GROUP BY 1, 2)
        |SELECT cohort_month, age_months, n_active, rev_cents,
        |  CAST(SUM(rev_cents) OVER (PARTITION BY cohort_month
        |    ORDER BY age_months
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
        |    AS cum_rev_cents
        |FROM curve ORDER BY cohort_month, age_months""".stripMargin,
    "q248_weighted_median" ->
      """WITH li AS (
        |  SELECT n_name,
        |    CAST(CAST(l_extendedprice AS DECIMAL(12,2)) * 100 AS BIGINT)
        |      AS cents,
        |    CAST(l_quantity AS BIGINT) AS wt
        |  FROM lineitem
        |  JOIN orders ON l_orderkey = o_orderkey
        |  JOIN customer ON o_custkey = c_custkey
        |  JOIN nation ON c_nationkey = n_nationkey),
        |freq AS (
        |  SELECT n_name, cents, CAST(SUM(wt) AS BIGINT) AS w
        |  FROM li GROUP BY n_name, cents),
        |cum AS (
        |  SELECT n_name, cents, w,
        |    CAST(SUM(w) OVER (PARTITION BY n_name ORDER BY cents
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
        |      AS BIGINT) AS cum_w,
        |    CAST(SUM(w) OVER (PARTITION BY n_name) AS BIGINT) AS total_w
        |  FROM freq)
        |SELECT n_name, MAX(total_w) AS total_weight,
        |  MIN(cents) AS w_median_cents
        |FROM cum WHERE cum_w * 2 >= total_w
        |GROUP BY n_name ORDER BY n_name""".stripMargin)
}
