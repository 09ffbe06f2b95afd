package graft.queries

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Business-analytics operators over the event/order streams:
  *
  *  - q196: time-to-convert distribution — hours from a user's first
  *    touch (view/click) to their first high-value purchase, with
  *    exact p50/p90 from a counts-of-counts frame (the q161 device —
  *    never a global sort of users).
  *  - q198: co-purchase part pairs ("frequently bought together") —
  *    the self-join-within-order market-basket primitive; the
  *    per-order line cap (TPC-H ≤ 7) is what bounds the pair
  *    explosion, and the join is co-partitioned on the order key (one
  *    shuffle each side, AQE-broadcastable).
  *  - q199: revenue concentration — the exact Gini coefficient over
  *    per-customer revenue in integer cents,
  *    G = (2·Σi·xᵢ − (n+1)·Σxᵢ) / (n·Σxᵢ) with xᵢ sorted ascending;
  *    rank products in DECIMAL(38,0). Ties don't disturb the sum
  *    (equal x under any tie order contribute identically).
  *
  * Ref: the reference's trade-stats endpoints (PublisherController)
  * chart conversion and GMV concentration; these add the
  * distributional math.
  *
  * Scale (100 TB): q196 reduces the event scan to two per-user MINs
  * (one map-side-combinable aggregate), then works on the bounded
  * delta-hours frame. q198's only corpus-scale stage is the
  * orderkey-partitioned self-join; pair counts are vocabulary-bounded
  * (parts²) with map-side combine. q199 sorts the CUSTOMER aggregate
  * (dim-scale, not fact-scale) once; at extreme customer counts the
  * same statistic is computable from a cents-granularity
  * counts-of-counts frame (documented trade).
  */
object BusinessOps {

  /** q196: one row — conversion-lag distribution in whole hours. */
  def timeToConvert(s: SparkSession, d: String): DataFrame = {
    val perUser = Tables.events(s, d)
      .groupBy(col("user_id"))
      .agg(
        min(when(col("event_type").isin("view", "click"), col("ts")))
          .as("first_touch"),
        min(when(col("event_type") === "purchase" && col("value") > 90,
          col("ts"))).as("first_conv"))
      .filter(col("first_touch").isNotNull && col("first_conv").isNotNull &&
        col("first_conv") >= col("first_touch"))
      .select(expr(
        "(unix_micros(first_conv) - unix_micros(first_touch))" +
          " div 3600000000 AS lag_h"))
    val coc = perUser.groupBy(col("lag_h")).agg(count(lit(1)).as("freq"))
      .withColumn("cum", sum(col("freq")).over(
        Window.orderBy(col("lag_h"))
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
    coc.crossJoin(broadcast(
        perUser.agg(count(lit(1)).as("n_converted"))))
      .agg(max(col("n_converted")).as("n_converted"),
        min(when(col("cum") >= expr("((n_converted - 1) * 50) div 100") + 1,
          col("lag_h"))).as("p50_hours"),
        min(when(col("cum") >= expr("((n_converted - 1) * 90) div 100") + 1,
          col("lag_h"))).as("p90_hours"),
        max(col("lag_h")).as("max_hours"))
  }

  /** q198: top-20 part pairs bought within the same order. */
  def copurchasePairs(s: SparkSession, d: String): DataFrame = {
    val li = Tables.lineitem(s, d)
      .select(col("l_orderkey").as("ok"), col("l_partkey").as("pk"))
      .distinct()
    li.as("x").join(li.as("y"),
        col("x.ok") === col("y.ok") && col("x.pk") < col("y.pk"))
      .groupBy(col("x.pk").as("part_a"), col("y.pk").as("part_b"))
      .agg(count(lit(1)).as("n_orders"))
      .orderBy(col("n_orders").desc, col("part_a"), col("part_b"))
      .limit(20)
  }

  /** q199: one row — exact revenue Gini over per-customer cents. */
  def revenueGini(s: SparkSession, d: String): DataFrame = {
    val rev = Tables.orders(s, d)
      .groupBy(col("o_custkey"))
      .agg(sum(expr("CAST(CAST(o_totalprice AS DECIMAL(12,2)) * 100" +
        " AS BIGINT)")).as("cents"))
    rev
      .withColumn("i", row_number().over(
        Window.orderBy(col("cents"), col("o_custkey"))))
      .agg(count(lit(1)).as("n_customers"),
        sum(col("cents")).as("total_cents"),
        sum(expr("CAST(i AS DECIMAL(38,0)) * cents")).as("ri"))
      .selectExpr("n_customers", "total_cents",
        "CAST((2 * ri - CAST(n_customers + 1 AS DECIMAL(38,0)) * total_cents)" +
          " * 1000000 div (CAST(n_customers AS DECIMAL(38,0)) * total_cents)" +
          " AS BIGINT) AS gini_ppm")
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q196_time_to_convert" -> timeToConvert,
    "q198_copurchase_pairs" -> copurchasePairs,
    "q199_revenue_gini" -> revenueGini)

  val oracle: Map[String, String] = Map(
    "q196_time_to_convert" ->
      """WITH ev AS (
        |  SELECT user_id, event_type, value,
        |    date_trunc('microseconds', ts) AS ts
        |  FROM events),
        |pu AS (
        |  SELECT user_id,
        |    MIN(CASE WHEN event_type IN ('view', 'click') THEN ts END)
        |      AS first_touch,
        |    MIN(CASE WHEN event_type = 'purchase' AND value > 90 THEN ts END)
        |      AS first_conv
        |  FROM ev GROUP BY user_id),
        |lags AS (
        |  SELECT (epoch_us(first_conv) - epoch_us(first_touch))
        |      // 3600000000 AS lag_h
        |  FROM pu
        |  WHERE first_touch IS NOT NULL AND first_conv IS NOT NULL
        |    AND first_conv >= first_touch),
        |coc AS (SELECT lag_h, COUNT(*) AS freq FROM lags GROUP BY lag_h),
        |cum AS (
        |  SELECT lag_h, SUM(freq) OVER (ORDER BY lag_h
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
        |  FROM coc),
        |n AS (SELECT COUNT(*) AS n_converted FROM lags)
        |SELECT MAX(n_converted) AS n_converted,
        |  MIN(CASE WHEN cum >= ((n_converted - 1) * 50) // 100 + 1
        |    THEN lag_h END) AS p50_hours,
        |  MIN(CASE WHEN cum >= ((n_converted - 1) * 90) // 100 + 1
        |    THEN lag_h END) AS p90_hours,
        |  MAX(lag_h) AS max_hours
        |FROM cum CROSS JOIN n""".stripMargin,
    "q198_copurchase_pairs" ->
      """WITH li AS (
        |  SELECT DISTINCT l_orderkey AS ok, l_partkey AS pk FROM lineitem)
        |SELECT x.pk AS part_a, y.pk AS part_b, COUNT(*) AS n_orders
        |FROM li x JOIN li y ON x.ok = y.ok AND x.pk < y.pk
        |GROUP BY x.pk, y.pk
        |ORDER BY n_orders DESC, part_a, part_b LIMIT 20""".stripMargin,
    "q199_revenue_gini" ->
      """WITH rev AS (
        |  SELECT o_custkey,
        |    CAST(SUM(CAST(CAST(o_totalprice AS DECIMAL(12,2)) * 100
        |      AS BIGINT)) AS BIGINT) AS cents
        |  FROM orders GROUP BY o_custkey),
        |ranked AS (
        |  SELECT cents,
        |    row_number() OVER (ORDER BY cents, o_custkey) AS i
        |  FROM rev)
        |SELECT COUNT(*) AS n_customers,
        |  CAST(SUM(cents) AS BIGINT) AS total_cents,
        |  CAST((2 * SUM(CAST(i AS HUGEINT) * cents)
        |      - CAST(COUNT(*) + 1 AS HUGEINT) * SUM(cents))
        |    * 1000000
        |    // (CAST(COUNT(*) AS HUGEINT) * SUM(cents)) AS BIGINT)
        |    AS gini_ppm
        |FROM ranked""".stripMargin)
}
