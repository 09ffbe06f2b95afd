package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}

/** SQL-surface completeness pack — features a user of a full SQL engine
  * expects beyond the operator inventory, each exercising a distinct
  * Catalyst capability:
  *
  *  - q216: GROUP BY GROUPING SETS with explicit GROUPING() flags —
  *    completes the q42 ROLLUP / q51 CUBE family with the free-form
  *    set list (Expand-based plan: one scan, one shuffle for all
  *    three groupings).
  *  - q217: CORRELATED scalar subqueries — Catalyst decorrelates the
  *    two per-nation aggregates into joins (RewriteCorrelatedScalarSubquery);
  *    the above-average predicate stays integral by cross-multiplying
  *    cents·count > sum instead of comparing against a fractional AVG
  *    (float averages differ across engines in the last ulp; integers
  *    cannot).
  *  - q218: LATERAL subquery with per-row LIMIT — top-2 orders per
  *    nation through the join chain, the "top-N per outer row"
  *    idiom stated as SQL rather than a window (DecorrelateInnerQuery
  *    turns it into a ranked join).
  *
  * All three run through `spark.sql` over `parquet.`…`` table refs —
  * the pure-SQL entry path (the reference's FlinkSQL jobs are this
  * shape; ref gmall-realtime DwdTradeOrderDetail SQL jobs).
  *
  * Scale: q216 is one Expand + one shuffle; q217's decorrelated
  * aggregates are map-side combinable per nation (dim-scale join
  * back); q218's lateral is nation-dim × ranked orders — Spark plans
  * it as a window-ranked join, never a per-row rescan.
  */
object SqlSurface {

  private def tbl(d: String, t: String) = s"parquet.`$d/$t.parquet`"

  /** q216: doc census at (lang), (source) and () granularities. */
  def groupingSets(s: SparkSession, d: String): DataFrame =
    s.sql(
      s"""SELECT grouping(lang) * 2 + grouping(source) AS gid,
         |  lang, source, COUNT(*) AS n_docs,
         |  SUM(n_chars) AS total_chars
         |FROM ${tbl(d, "documents")}
         |GROUP BY lang, source GROUPING SETS ((lang), (source), ())
         |ORDER BY gid, lang, source""".stripMargin)

  /** q217: per-nation census of above-nation-average balances. */
  def correlatedSubquery(s: SparkSession, d: String): DataFrame =
    s.sql(
      s"""WITH c AS (
         |  SELECT c_custkey, c_nationkey,
         |    CAST(CAST(c_acctbal AS DECIMAL(12,2)) * 100 AS BIGINT)
         |      AS cents
         |  FROM ${tbl(d, "customer")})
         |SELECT c_nationkey, COUNT(*) AS n_above,
         |  SUM(cents) AS above_cents
         |FROM c
         |WHERE cents * (SELECT COUNT(*) FROM c c2
         |                WHERE c2.c_nationkey = c.c_nationkey)
         |    > (SELECT SUM(c2.cents) FROM c c2
         |        WHERE c2.c_nationkey = c.c_nationkey)
         |GROUP BY c_nationkey
         |ORDER BY c_nationkey""".stripMargin)

  /** q218: top-2 orders per nation via a LATERAL subquery. */
  def lateralTopOrders(s: SparkSession, d: String): DataFrame =
    s.sql(
      s"""SELECT n.n_name, t.o_orderkey, t.o_totalprice
         |FROM ${tbl(d, "nation")} n,
         |LATERAL (
         |  SELECT o.o_orderkey, o.o_totalprice
         |  FROM ${tbl(d, "orders")} o
         |  JOIN ${tbl(d, "customer")} c ON o.o_custkey = c.c_custkey
         |  WHERE c.c_nationkey = n.n_nationkey
         |  ORDER BY o.o_totalprice DESC, o.o_orderkey LIMIT 2) t
         |ORDER BY n.n_name, t.o_totalprice DESC, t.o_orderkey""".stripMargin)

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q216_grouping_sets" -> groupingSets,
    "q217_correlated_subquery" -> correlatedSubquery,
    "q218_lateral_topn" -> lateralTopOrders)

  val oracle: Map[String, String] = Map(
    "q216_grouping_sets" ->
      """SELECT GROUPING(lang) * 2 + GROUPING(source) AS gid,
        |  lang, source, COUNT(*) AS n_docs,
        |  CAST(SUM(n_chars) AS BIGINT) AS total_chars
        |FROM documents
        |GROUP BY GROUPING SETS ((lang), (source), ())
        |ORDER BY gid, lang, source""".stripMargin,
    "q217_correlated_subquery" ->
      """WITH c AS (
        |  SELECT c_custkey, c_nationkey,
        |    CAST(CAST(c_acctbal AS DECIMAL(12,2)) * 100 AS BIGINT)
        |      AS cents
        |  FROM customer)
        |SELECT c_nationkey, COUNT(*) AS n_above,
        |  CAST(SUM(cents) AS BIGINT) AS above_cents
        |FROM c
        |WHERE cents * (SELECT COUNT(*) FROM c c2
        |                WHERE c2.c_nationkey = c.c_nationkey)
        |    > (SELECT SUM(c2.cents) FROM c c2
        |        WHERE c2.c_nationkey = c.c_nationkey)
        |GROUP BY c_nationkey
        |ORDER BY c_nationkey""".stripMargin,
    "q218_lateral_topn" ->
      """SELECT n.n_name, t.o_orderkey, t.o_totalprice
        |FROM nation n,
        |LATERAL (
        |  SELECT o.o_orderkey, o.o_totalprice
        |  FROM orders o
        |  JOIN customer c ON o.o_custkey = c.c_custkey
        |  WHERE c.c_nationkey = n.n_nationkey
        |  ORDER BY o.o_totalprice DESC, o.o_orderkey LIMIT 2) t
        |ORDER BY n.n_name, t.o_totalprice DESC, t.o_orderkey""".stripMargin)
}
