package graft.queries

import graft.Tables
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** The last pre-tokenization stages of a training-data pipeline: packing
  * curated documents into fixed-capacity training sequences, and mixing
  * sources against per-source token budgets.
  *
  *  - q127: GPT-style sequence packing — concatenate docs in a
  *    deterministic order and cut every `SeqCap` tokens; report per
  *    shard how many sequences the corpus packs into and how many docs
  *    straddle a cut. The shard is the parallel unit: packing is order-
  *    dependent WITHIN a sequence stream but streams are independent,
  *    so a 100 TB corpus packs as thousands of independent shards, each
  *    a partition-local sort — never a global one.
  *  - q128: token-budget source mixing — admit docs per source, in
  *    deterministic salted-hash order, until the source's token budget
  *    is spent (the "sample X tokens of each source" step of corpus
  *    mixing). Implemented with a two-phase prefix sum so the corpus
  *    never global-sorts: per-(source, hash-bucket) token totals (tiny,
  *    map-side combinable) locate the single bucket where the budget
  *    runs out; whole buckets before it admit wholesale, the straddle
  *    bucket alone (1/256 of the source) pays a window sort. Same
  *    result as the naive per-source window cumsum — PackingOpsSpec
  *    proves the equivalence — but the expensive path touches only
  *    budget-boundary rows at any scale.
  *
  * All emitted measures are integer arithmetic (counts, token sums,
  * div/mod sequence indices) — engine-exact at any parallelism.
  */
object PackingOps {

  private val SeqCap = 512L // tokens per packed training sequence
  private val MixBudget = 600L // token budget per source (binds at sf0.001+)

  private def wsTokens: Column = size(split(col("text"), " ")).cast("long")

  // ---- q127 sequence packing ----

  /** Per-shard packing stats: `n_sequences` = ceil(tokens/SeqCap) of the
    * concatenated shard stream, `boundary_docs` = docs cut by a sequence
    * boundary (they span floor(before/cap) ≠ floor((end−1)/cap)). The
    * pack order inside a shard is (md5 priority, doc_id) — reproducible
    * across runs, engines and repartitionings, like every other
    * hash-ordered device here (q49/q115/q125). 16 shards at test scale;
    * the shard count is the 100 TB knob (one shard ≈ one executor's
    * worth of sequences), and each shard's window sorts only its own
    * partition. */
  def sequencePacking(s: SparkSession, d: String): DataFrame = {
    val pri = md5(concat(col("doc_id").cast("string"), lit(":pack")))
    val docs = Tables.documents(s, d)
      .select(col("doc_id"), wsTokens.as("toks"), pri.as("pri"),
        substring(pri, 1, 1).as("shard"))
    // explicit ROWS frame: the default RANGE frame hands every peer
    // group (duplicate (pri, doc_id) rows, e.g. a replicated corpus)
    // the whole peer-group sum — ROWS gives each row its own prefix,
    // which is both the packing semantics and the oracle's stated frame
    val w = Window.partitionBy("shard").orderBy(col("pri"), col("doc_id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    docs
      .withColumn("cum_end", sum(col("toks")).over(w))
      .withColumn("cum_before", col("cum_end") - col("toks"))
      .groupBy("shard")
      .agg(count(lit(1)).as("n_docs"),
        sum(col("toks")).as("shard_tokens"),
        // `div`, not `/`: Spark's / on longs is IEEE double division
        expr(s"(max(cum_end) + ${SeqCap - 1}L) div ${SeqCap}L")
          .as("n_sequences"),
        sum(when(expr(s"cum_before div ${SeqCap}L") =!=
          expr(s"(cum_end - 1L) div ${SeqCap}L"), 1L).otherwise(0L))
          .as("boundary_docs"))
  }

  // ---- q128 token-budget mix ----

  /** Admission rule shared by both formulations: a doc is admitted iff
    * the token sum of all strictly-prior docs of its source (in
    * (priority, doc_id) order) is < budget — so the doc that crosses
    * the budget line is still admitted and admission never depends on
    * a doc's own length. */
  private def mixPriority = md5(concat(col("doc_id").cast("string"), lit(":mix")))

  /** Naive single-window formulation (one window sort per source — the
    * oracle twin and the spec's equivalence reference; correct anywhere
    * but sorts the whole corpus in |sources| partitions). */
  private[queries] def tokenBudgetMixNaive(s: SparkSession, d: String): DataFrame = {
    val w = Window.partitionBy("source").orderBy(col("pri"), col("doc_id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    Tables.documents(s, d)
      .select(col("source"), col("doc_id"), wsTokens.as("toks"),
        mixPriority.as("pri"))
      .withColumn("cum_before", sum(col("toks")).over(w) - col("toks"))
      .filter(col("cum_before") < MixBudget)
      .groupBy("source")
      .agg(count(lit(1)).as("admitted_docs"),
        sum(col("toks")).as("admitted_tokens"))
  }

  /** Two-phase prefix-sum formulation. Bucket = first hex char of the
    * priority (16 buckets; bucket-major order IS priority order, so
    * per-bucket totals are contiguous prefix segments). Phase 1
    * aggregates (source, bucket) token totals — tiny and map-side
    * combinable. Phase 2 windows over that ~|sources|·16-row frame to
    * find each source's straddle bucket. Wholesale buckets admit with
    * no sort; only straddle-bucket rows (≈ 1/16 of each source here,
    * 1/256+ with a wider bucket key at scale) window-sort, with the
    * bucket's prefix offset added back. */
  def tokenBudgetMix(s: SparkSession, d: String): DataFrame = {
    val docs = Tables.documents(s, d)
      .select(col("source"), col("doc_id"), wsTokens.as("toks"),
        mixPriority.as("pri"), substring(mixPriority, 1, 1).as("bucket"))
      .localCheckpoint() // feeds the totals agg + both admission branches
    val wb = Window.partitionBy("source").orderBy("bucket")
    val totals = docs.groupBy("source", "bucket")
      .agg(sum(col("toks")).as("btoks"))
      .withColumn("cum_before_b", coalesce(sum(col("btoks"))
        .over(wb.rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
    val wholesale = docs
      .join(totals.filter(col("cum_before_b") + col("btoks") <= MixBudget)
        .select("source", "bucket"), Seq("source", "bucket"), "left_semi")
    val straddle = totals
      .filter(col("cum_before_b") < MixBudget &&
        col("cum_before_b") + col("btoks") > MixBudget)
      .select(col("source"), col("bucket"), col("cum_before_b"))
    val wd = Window.partitionBy("source", "bucket")
      .orderBy(col("pri"), col("doc_id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val fromStraddle = docs
      .join(broadcast(straddle), Seq("source", "bucket"))
      .withColumn("cum_before",
        col("cum_before_b") + sum(col("toks")).over(wd) - col("toks"))
      .filter(col("cum_before") < MixBudget)
      .select(docs.columns.map(col): _*)
    wholesale.unionByName(fromStraddle)
      .groupBy("source")
      .agg(count(lit(1)).as("admitted_docs"),
        sum(col("toks")).as("admitted_tokens"))
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q127_sequence_packing" -> sequencePacking,
    "q128_token_budget_mix" -> tokenBudgetMix)

  val oracle: Map[String, String] = Map(
    "q127_sequence_packing" ->
      s"""WITH t AS (
         |  SELECT doc_id, CAST(len(string_split(text, ' ')) AS BIGINT) AS toks,
         |    md5(doc_id || ':pack') AS pri,
         |    substr(md5(doc_id || ':pack'), 1, 1) AS shard
         |  FROM documents),
         |c AS (
         |  SELECT shard, toks,
         |    SUM(toks) OVER (PARTITION BY shard ORDER BY pri, doc_id
         |      ROWS UNBOUNDED PRECEDING) AS cum_end
         |  FROM t)
         |SELECT shard, COUNT(*) AS n_docs,
         |  CAST(SUM(toks) AS BIGINT) AS shard_tokens,
         |  CAST((MAX(cum_end) + ${SeqCap - 1}) // $SeqCap AS BIGINT)
         |    AS n_sequences,
         |  CAST(SUM(CASE WHEN (cum_end - toks) // $SeqCap
         |    <> (cum_end - 1) // $SeqCap THEN 1 ELSE 0 END) AS BIGINT)
         |    AS boundary_docs
         |FROM c GROUP BY shard""".stripMargin,
    "q128_token_budget_mix" ->
      s"""WITH t AS (
         |  SELECT source, doc_id,
         |    CAST(len(string_split(text, ' ')) AS BIGINT) AS toks,
         |    md5(doc_id || ':mix') AS pri
         |  FROM documents),
         |c AS (
         |  SELECT source, toks,
         |    SUM(toks) OVER (PARTITION BY source ORDER BY pri, doc_id
         |      ROWS UNBOUNDED PRECEDING) - toks AS cum_before
         |  FROM t)
         |SELECT source, COUNT(*) AS admitted_docs,
         |  CAST(SUM(toks) AS BIGINT) AS admitted_tokens
         |FROM c WHERE cum_before < $MixBudget
         |GROUP BY source""".stripMargin)
}
