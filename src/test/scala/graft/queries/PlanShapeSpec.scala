package graft.queries

import graft.{SparkEntry, TestSpark}
import org.scalatest.funsuite.AnyFunSuite

/** Physical-plan shape assertions for the scale-critical queries: the
  * candidates→verifier rewires (q35/q65/q67) must plan as equi-joins —
  * any BroadcastNestedLoopJoin or CartesianProduct would mean the
  * all-pairs shape crept back — and q55 must still execute through the
  * native TopKBy aggregate after the posexplode reshape. */
class PlanShapeSpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  private val d = "/root/testdata/sf0.001"

  private def planOf(q: String): String =
    SparkEntry.queries(q)(spark, d).queryExecution.executedPlan.toString

  for (q <- Seq("q35_cosine_pairs", "q65_fuzzy_name_match",
      "q67_simhash_hamming", "q100_range_join", "q118_semdedup")) {
    test(s"$q plans with no nested-loop/cartesian join") {
      val plan = planOf(q)
      assert(!plan.contains("BroadcastNestedLoopJoin"), plan.take(4000))
      assert(!plan.contains("CartesianProduct"), plan.take(4000))
    }
  }

  test("q55_topk_agg keeps the TopKBy aggregate in the plan") {
    val plan = planOf("q55_topk_agg").toLowerCase
    assert(plan.contains("topk"), plan.take(4000))
  }

  test("q113_dup_ngram_stats plans with no join at all") {
    // the duplicated-span statistic is linear by construction: per-gram
    // counts come from a window over the gram partition, never a
    // self-join — if a Join node appears, the pair trap crept back
    val plan = planOf("q113_dup_ngram_stats")
    assert(!plan.contains("Join"), plan.take(4000))
  }

  test("q116_decontamination joins benchmark grams as a LEFT SEMI join") {
    // the contamination check must stay a semi join: a plain inner join
    // would multiply a boilerplate gram shared by the corpus into a
    // pair-like blow-up before the doc_id distinct
    val plan = planOf("q116_decontamination")
    assert(plan.contains("LeftSemi"), plan.take(4000))
    assert(!plan.contains("BroadcastNestedLoopJoin"), plan.take(4000))
    assert(!plan.contains("CartesianProduct"), plan.take(4000))
  }

  test("q125_source_quota never window-sorts the corpus") {
    // the quota must come from the bounded topk_by aggregate + a
    // broadcast semi-join back; a WindowExec (row_number per source)
    // would mean the 20-partition full-corpus sort crept back
    val plan = SparkEntry.queries("q125_source_quota")(spark, d)
      .queryExecution.executedPlan
    val windows = plan.collect {
      case w: org.apache.spark.sql.execution.window.WindowExec => w
    }
    assert(windows.isEmpty, plan.toString.take(4000))
    assert(plan.toString.toLowerCase.contains("topk"), plan.toString.take(4000))
    assert(plan.toString.contains("LeftSemi"), plan.toString.take(4000))
  }

  test("q126_bloom_blocklist anti-joins with an equi-join, suspects only") {
    val plan = planOf("q126_bloom_blocklist")
    assert(plan.contains("LeftAnti"), plan.take(4000))
    assert(!plan.contains("BroadcastNestedLoopJoin"), plan.take(4000))
    assert(!plan.contains("CartesianProduct"), plan.take(4000))
  }

  test("q130_grouped_heavy_hitters plans with no join at all") {
    // the production sketch shape: one map-side-combinable aggregate —
    // q124's exact-count join (the bounds exhibit) must NOT appear here;
    // if a Join node shows up, the every-distinct-token shuffle is back
    val plan = planOf("q130_grouped_heavy_hitters")
    assert(!plan.contains("Join"), plan.take(4000))
    assert(plan.toLowerCase.contains("heavyhitters"), plan.take(4000))
  }

  test("q134_dsir_select broadcasts both histograms and heap-selects") {
    // the DSIR scale shape: the 64-row histograms must reach the
    // occurrence stream as broadcast hash joins (a shuffled join here
    // would re-shuffle the whole exploded corpus twice), and the top-k
    // must be TakeOrderedAndProject (per-partition heaps), never a
    // global sort
    val plan = SparkEntry.queries("q134_dsir_select")(spark, d)
      .queryExecution.executedPlan
    val s = plan.toString
    assert(s.contains("TakeOrderedAndProject"), s.take(4000))
    assert(!s.contains("SortMergeJoin") && !s.contains("ShuffledHashJoin"),
      s.take(4000))
    assert("BroadcastHashJoin".r.findAllIn(s).length == 2, s.take(4000))
  }

  test("q135_bpe_pair_counts explodes only the vocabulary") {
    // phase 1 must reduce the corpus to (word, cnt) BEFORE the 2-char
    // window explode — the generator must sit above the word aggregate,
    // so the plan has exactly two aggregate pairs and one Generate whose
    // child already aggregated; a Generate below the first aggregate
    // would mean per-occurrence explosion (corpus-scale pair strings)
    // NOTE: collect() does not see through AdaptiveSparkPlanExec (AQE
    // nodes have no children), so the check reads the tree string —
    // parent lines precede child lines, so "above" = smaller index
    val lines = SparkEntry.queries("q135_bpe_pair_counts")(spark, d)
      .queryExecution.executedPlan.toString.linesIterator.toSeq
    val pairGen = lines.indexWhere(l =>
      l.contains("Generate") && l.contains("substring"))
    val wordAgg = lines.indexWhere(l =>
      l.contains("HashAggregate(keys=[word"))
    assert(pairGen >= 0, lines.mkString("\n").take(4000))
    assert(wordAgg >= 0, lines.mkString("\n").take(4000))
    assert(pairGen < wordAgg,
      "pair explode must run above the word-count aggregate:\n" +
        lines.mkString("\n").take(4000))
  }

  test("q271_systematic_sample has no unpartitioned window (two-phase cumsum)") {
    // the r7 verdict's one named scale-killer: the cumulative-weight
    // line must come from the per-bucket window + broadcast offsets
    // (the q127/q128 device), never Window.orderBy over the whole fact
    // table — an empty partitionSpec anywhere means the global
    // single-partition sort crept back
    val plan = SparkEntry.queries("q271_systematic_sample")(spark, d)
      .queryExecution.optimizedPlan
    val unpartitioned = plan.collect {
      case w: org.apache.spark.sql.catalyst.plans.logical.Window
        if w.partitionSpec.isEmpty => w
    }
    assert(unpartitioned.isEmpty, plan.toString.take(4000))
  }

  test("q112_tfidf_topk sorts only within doc partitions (no global sort)") {
    val plan = SparkEntry.queries("q112_tfidf_topk")(spark, d)
      .queryExecution.executedPlan
    val globalSorts = plan.collect {
      case s: org.apache.spark.sql.execution.SortExec if s.global => s
    }
    assert(globalSorts.isEmpty, plan.toString.take(4000))
  }
}
