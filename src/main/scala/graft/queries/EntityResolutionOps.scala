package graft.queries

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** q251: entity resolution END-TO-END — the three verified pieces
  * composed into the classic ER pipeline (Fellegi–Sunter shape):
  *
  *   1. BLOCK: distinct customer names, prefix-16 equi-blocks (the
  *      q65/q226 rule — block on the key's stable prefix so candidate
  *      pairs are vocabulary-pairs within a block, never row-pairs).
  *   2. MATCH: the native banded Levenshtein (q226's
  *      `edit_dist_bounded`, Ukkonen O(k·L)) keeps pairs at distance
  *      ≤ 2 — the saturating contract makes the filter exact.
  *   3. CLUSTER: transitive closure by the q159 large-star/small-star
  *      algorithm (string labels — the star device is label-type
  *      agnostic), singletons kept as their own entity.
  *
  * Output: one row per resolved entity (canonical rep = lexicographic
  * min member) with member count. The DuckDB oracle runs the OPPOSITE
  * cluster algorithm (full levenshtein + a recursive-CTE reachability
  * closure), so the hash match proves block+band+closure end-to-end.
  *
  * On this synthetic corpus names differ only in trailing digits, so
  * every ≤2-distance clique coincides with its block — the pipeline's
  * value is the verified composition; the spec pins a fixture where
  * clusters are strictly smaller than blocks.
  *
  * Scale (100 TB): candidate pairs are per-block cliques over DISTINCT
  * names (vocabulary-scale); the q226 block-size rule applies — size
  * the prefix to the key density (prefix-16 → ~100-name blocks here).
  * The star closure is O(log n) rounds of shuffles on the edge list,
  * never a driver-side union-find.
  */
object EntityResolutionOps {

  private val EditK = 2

  /** Block + match over a one-column (`c_name`) frame of entity names. */
  private[queries] def nameEdges(s: SparkSession, raw: DataFrame)
      : DataFrame = {
    graft.functions.EditDistOps.register(s)
    val names = raw.select(col("c_name")).distinct()
      .select(col("c_name"), substring(col("c_name"), 1, 16).as("blk"))
    names.as("a").join(names.as("b"),
        col("a.blk") === col("b.blk") && col("a.c_name") < col("b.c_name"))
      .filter(
        expr(s"edit_dist_bounded(a.c_name, b.c_name, $EditK) <= $EditK"))
      .select(col("a.c_name").as("doc_a"), col("b.c_name").as("doc_b"))
  }

  /** The full pipeline over any one-column name frame. */
  private[queries] def resolve(s: SparkSession, raw: DataFrame)
      : DataFrame = {
    val cc = GraphOps.largeSmallStar(s, nameEdges(s, raw))
    val all = raw.select(col("c_name").as("doc_id")).distinct()
    all.join(cc.select(col("doc_id"), col("cluster_rep")),
        Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("cluster_rep"), col("doc_id")).as("entity_rep"))
      .groupBy(col("entity_rep"))
      .agg(count(lit(1)).as("n_members"))
      .orderBy(col("entity_rep"))
  }

  def erPipeline(s: SparkSession, d: String): DataFrame =
    resolve(s, Tables.customer(s, d))

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q251_er_pipeline" -> erPipeline)

  val oracle: Map[String, String] = Map(
    "q251_er_pipeline" ->
      s"""WITH RECURSIVE names AS (
         |  SELECT DISTINCT c_name FROM customer),
         |blk AS (
         |  SELECT c_name, substr(c_name, 1, 16) AS blk FROM names),
         |pairs AS (
         |  SELECT a.c_name AS doc_a, b.c_name AS doc_b
         |  FROM blk a JOIN blk b
         |    ON a.blk = b.blk AND a.c_name < b.c_name
         |  WHERE levenshtein(a.c_name, b.c_name) <= $EditK),
         |edges AS (
         |  SELECT doc_a AS u, doc_b AS v FROM pairs
         |  UNION SELECT doc_b, doc_a FROM pairs),
         |nodes AS (SELECT DISTINCT u AS doc_id FROM edges),
         |reach(u, v) AS (
         |  SELECT u, v FROM edges
         |  UNION
         |  SELECT r.u, e.v FROM reach r JOIN edges e ON r.v = e.u),
         |labels AS (
         |  SELECT n.doc_id, LEAST(n.doc_id, MIN(r.v)) AS entity
         |  FROM nodes n JOIN reach r ON r.u = n.doc_id
         |  GROUP BY n.doc_id),
         |lab2 AS (
         |  SELECT a.c_name AS doc_id, COALESCE(l.entity, a.c_name)
         |    AS entity
         |  FROM names a LEFT JOIN labels l ON a.c_name = l.doc_id)
         |SELECT entity AS entity_rep, COUNT(*) AS n_members
         |FROM lab2 GROUP BY entity ORDER BY entity""".stripMargin)
}
