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

  // ===== round-14 pins: the top-10 wall-time queries (VERDICT r13 #1) =====
  // Each pin asserts the LOAD-BEARING plan property that makes the query's
  // 100 TB scale story true — previously prose in PLANS.md, now failing
  // `sbt test` on regression. Checks read the LOGICAL optimizedPlan for
  // window/join structure (collect() is AQE-blind on the physical tree —
  // the q135 lesson) and the physical tree STRING for join/sort/pushdown
  // node presence (string survives AQE wrapping).

  import org.apache.spark.sql.catalyst.expressions.IntegerLiteral
  import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, Generate,
    GlobalLimit, Join, LogicalPlan, UnaryNode, Window => LWindow}

  private def qe(q: String) = SparkEntry.queries(q)(spark, d).queryExecution

  private def unpartWindows(plan: LogicalPlan): Seq[LWindow] =
    plan.collect { case w: LWindow if w.partitionSpec.isEmpty => w }

  /** Physical global sorts: SortExec prints `Sort [keys], true, 0` when
    * global (an SMJ's per-partition sort prints `false`). */
  private def globalSortLines(physical: String): Seq[String] =
    physical.linesIterator
      .filter(l => l.contains("Sort [") && l.contains("], true,")).toSeq

  /** A plan provably tiny BY CONSTRUCTION: a scalar aggregate or a
    * literal limit at its ROOT (modulo unary wrappers that cannot grow
    * the row count — Generate excluded: explode can blow a tiny frame
    * up), or a join of two tiny inputs. Root-anchored on purpose: a
    * GlobalLimit buried under a corpus-scale join (e.g.
    * big.join(x.limit(10))) must NOT qualify (code-review r14). */
  private def provablyTiny(p: LogicalPlan): Boolean = p match {
    case a: Aggregate if a.groupingExpressions.isEmpty => true
    // "literal limit" means LITERAL AND SMALL: a limit(10_000_000) side
    // is not a scalar-attachment frame — only genuinely tiny literal
    // limits admit a condition-free join (ADVICE r14)
    case GlobalLimit(IntegerLiteral(n), _) if n <= 4096 => true
    case j: Join => provablyTiny(j.left) && provablyTiny(j.right)
    case _: Generate => false
    case u: UnaryNode => provablyTiny(u.child)
    case _ => false
  }

  /** A no-condition (cross) join is admissible only when one ENTIRE
    * side is provably tiny by construction. */
  private def unboundedCrossJoins(plan: LogicalPlan): Seq[Join] =
    plan.collect {
      case j: Join if j.condition.isEmpty &&
        !provablyTiny(j.left) && !provablyTiny(j.right) => j
    }

  // --- the suffix-array family (q139/q145/q152/q280): the two-phase
  // prefix sum must stay two-phase — the ONLY unpartitioned windows are
  // the per-4096-bucket TOTALS pass (orders by `bkt`, input is the
  // bucket aggregate), never a full-corpus cumsum ordered by position
  // `i`; and the candidate machinery stays equi-join (no pair trap).
  for (q <- Seq("q139_span_dedup_exact", "q145_span_dedup_rebuild",
      "q152_contamination_span", "q280_contamination_compare")) {
    test(s"$q: unpartitioned windows are bucket-totals only, no pair joins") {
      val e = qe(q)
      val ws = unpartWindows(e.optimizedPlan)
      assert(ws.nonEmpty, "expected the bucket-totals window pass")
      ws.foreach { w =>
        val orderCols = w.orderSpec.flatMap(_.references.map(_.name)).distinct
        assert(orderCols == Seq("bkt"),
          s"unpartitioned window orders by ${orderCols.mkString(",")} — " +
            "the full-corpus single-partition cumsum crept back:\n" +
            w.toString.take(2000))
        assert(w.child.collectFirst { case a: Aggregate => a }.isDefined,
          "bucket-totals window must read the per-bucket AGGREGATE " +
            "(tiny), not the corpus rows:\n" + w.child.toString.take(2000))
      }
      val s = e.executedPlan.toString
      assert(!s.contains("BroadcastNestedLoopJoin") &&
        !s.contains("CartesianProduct"), s.take(4000))
    }
  }

  test("q145/q139 push the doc cap into the parquet scan") {
    // the caps bound the suffix corpus at the SOURCE; a scan without the
    // pushed range reads every document before filtering
    for ((q, cap) <- Seq("q139_span_dedup_exact" -> 100,
        "q145_span_dedup_rebuild" -> 250)) {
      val s = qe(q).executedPlan.toString
      assert(s.contains(s"LessThan(doc_id,$cap)"),
        s"$q: doc cap $cap not pushed to the scan:\n" +
          s.linesIterator.filter(_.contains("FileScan"))
            .mkString("\n").take(3000))
    }
  }

  test("q280_contamination_compare: gram containment is a LEFT SEMI join, " +
    "presentation sort only") {
    val e = qe("q280_contamination_compare")
    val s = e.executedPlan.toString
    assert(s.contains("LeftSemi"), s.take(4000))
    // the lone global sort is the ORDER BY over the <=4-row cross-tab
    val sorts = globalSortLines(s)
    assert(sorts.size <= 1 && sorts.forall(_.contains("gram_flag")),
      sorts.mkString("\n"))
  }

  // --- the ER family (q251/q269): candidates must come from the
  // prefix-16 equi-block join over DISTINCT names (vocabulary-pairs,
  // never row-pairs), survivorship ranks only WITHIN an entity, and the
  // only global sort is the final presentation ORDER BY on the
  // entity-level aggregate.
  for (q <- Seq("q251_er_pipeline", "q269_golden_record")) {
    test(s"$q: blocked equi-join candidates, entity-partitioned windows only") {
      val e = qe(q)
      val s = e.executedPlan.toString
      assert(!s.contains("BroadcastNestedLoopJoin") &&
        !s.contains("CartesianProduct"), s.take(4000))
      assert(unpartWindows(e.optimizedPlan).isEmpty,
        "survivorship/rank windows must be partitioned by entity")
      val sorts = globalSortLines(s)
      assert(sorts.size <= 1 && sorts.forall(_.contains("entity_rep")),
        sorts.mkString("\n"))
    }
  }

  test("q251's candidate generator plans the name self-join as an equi-join") {
    // the load-bearing piece lives BEHIND the closure's checkpoints in the
    // final plan, so pin it at its own root: block key equality must reach
    // the join (a missing equi key = all-pairs BNLJ over the vocabulary)
    val edges = EntityResolutionOps.nameEdges(spark,
      graft.Tables.customer(spark, d))
    val s = edges.queryExecution.executedPlan.toString
    assert(!s.contains("BroadcastNestedLoopJoin") &&
      !s.contains("CartesianProduct"), s.take(4000))
    assert(s.contains("Join") && s.contains("blk"), s.take(4000))
  }

  // --- q295: the per-threshold stats may cross-join ONLY scalar
  // aggregates (1-row frames); the candidate pair frame underneath is
  // q31's banded equi-join (pinned at its own root — it sits behind a
  // checkpoint in the final plan).
  test("q295_dedup_curve: cross joins are scalar-aggregate-bounded") {
    val e = qe("q295_dedup_curve")
    assert(unboundedCrossJoins(e.optimizedPlan).isEmpty,
      e.optimizedPlan.toString.take(4000))
    val pairs = TextOps.ngramJaccard(spark, d)
    val ps = pairs.queryExecution.executedPlan.toString
    assert(!ps.contains("BroadcastNestedLoopJoin") &&
      !ps.contains("CartesianProduct"),
      "q295's candidate pair frame lost its banded equi-join:\n" +
        ps.take(4000))
  }

  // --- q144: rules + learned-classifier curation stays one linear pass —
  // no joins beyond equi, no windows at all, no global sort.
  test("q144_curated_learned: linear plan (no pair joins, no windows, " +
    "no global sort)") {
    val e = qe("q144_curated_learned")
    val s = e.executedPlan.toString
    assert(!s.contains("BroadcastNestedLoopJoin") &&
      !s.contains("CartesianProduct"), s.take(4000))
    assert(unpartWindows(e.optimizedPlan).isEmpty)
    assert(globalSortLines(s).isEmpty, globalSortLines(s).mkString("\n"))
  }

  // --- q155: both retrieval arms must end in TakeOrderedAndProject
  // heaps (plus the fused top-10) — never a global sort — and every
  // unpartitioned rank window must read a LIMIT-bounded (<= FuseK-row)
  // frame; the only cross join broadcasts the 1-row query embedding.
  test("q155_hybrid_rrf: heap-bounded arms, limit-bounded rank windows") {
    val e = qe("q155_hybrid_rrf")
    val s = e.executedPlan.toString
    assert("TakeOrderedAndProject".r.findAllIn(s).length >= 3, s.take(4000))
    assert(globalSortLines(s).isEmpty, globalSortLines(s).mkString("\n"))
    val ws = unpartWindows(e.optimizedPlan)
    assert(ws.nonEmpty, "expected the two rank windows")
    ws.foreach { w =>
      assert(provablyTiny(w.child),
        "rank window over an UNBOUNDED frame (the FuseK limit is gone " +
          "or no longer bounds the window input):\n" +
          w.child.toString.take(2000))
    }
    assert(unboundedCrossJoins(e.optimizedPlan).isEmpty)
  }

  // --- q67 (pinned no-BNLJ above): also pin that nothing global-sorts
  // and no window runs unpartitioned — the simhash band join keeps the
  // whole plan shuffle-bounded.
  test("q67_simhash_hamming: no global sort, no unpartitioned window") {
    val e = qe("q67_simhash_hamming")
    assert(globalSortLines(e.executedPlan.toString).isEmpty)
    assert(unpartWindows(e.optimizedPlan).isEmpty)
  }

  // ===== round-15 pins: the rest of the >2 s tier (VERDICT r14 #5) =====

  import org.apache.spark.sql.catalyst.plans.{Inner, LeftOuter, LeftSemi}
  import org.apache.spark.sql.catalyst.plans.logical.HintInfo
  import org.apache.spark.sql.catalyst.plans.logical.{BROADCAST => BHint}

  // q84_dwd_order_detail: the 4-table order-detail wide row. The 100 TB
  // story is a LEFT-DEEP, FACT-FIRST hand-ordered join chain (detail ⋈
  // info ⋈ act ⋈ cou ⋈ dic) with the dic join DECLARED broadcast — at
  // sf0.001 AQE broadcasts everything, so the pin reads the logical
  // structure, not the physical strategy picks.
  test("q84_dwd_order_detail: left-deep fact-first joins, dic declared broadcast") {
    val e = qe("q84_dwd_order_detail")
    val joins = e.optimizedPlan.collect { case j: Join => j }
    assert(joins.size == 4, s"expected the 4-join chain, got ${joins.size}")
    // left-deep: no join's RIGHT side contains another join — the fact
    // stream stays on the left, dims attach one at a time
    joins.foreach { j =>
      assert(j.right.collect { case x: Join => x }.isEmpty,
        "join tree is not left-deep (a dim side grew a join):\n" +
          j.right.toString.take(1500))
    }
    // innermost join (detail ⋈ info) is INNER; the three dim attaches
    // are LEFT OUTER (absence of an activity/coupon/dic row must not
    // drop the fact row)
    assert(joins.count(_.joinType == Inner) == 1 &&
      joins.count(_.joinType == LeftOuter) == 3,
      s"join types drifted: ${joins.map(_.joinType)}")
    // the dic attach is DECLARED broadcast (the outermost join's build
    // side carries the hint) — broadcast by hint, not by AQE luck
    val root = joins.head
    assert(root.hint.rightHint.exists(_.strategy.contains(BHint)),
      s"dic join lost its broadcast hint: ${root.hint}")
    val s = e.executedPlan.toString
    assert(!s.contains("BroadcastNestedLoopJoin") &&
      !s.contains("CartesianProduct"), s.take(4000))
  }

  // q340_kcore_census: iterative peeling. The final plan is
  // checkpoint-truncated, so pin the two production building blocks
  // directly: the pair-frame self-join must be an EQUI-join on the
  // order key, and one peel round must be exactly two LEFT-SEMI
  // equi-joins — a rewrite to inner-join+distinct or a nested-loop
  // membership probe breaks the per-round cost model.
  test("q340_kcore_census: pair frame is an equi self-join, no BNLJ") {
    val e = graft.queries.GraphOps.repeatCoPurchaseEdges(spark, d)
      .queryExecution
    val s = e.executedPlan.toString
    assert(!s.contains("BroadcastNestedLoopJoin") &&
      !s.contains("CartesianProduct"), s.take(4000))
    val joins = e.optimizedPlan.collect { case j: Join => j }
    assert(joins.size == 1 && joins.head.joinType == Inner,
      s"expected the single inner self-join: ${joins.map(_.joinType)}")
  }

  test("q340_kcore_census: a peel round is two left-semi equi-joins") {
    import spark.implicits._
    val edges = Seq((1L, 2L), (2L, 3L), (1L, 3L), (3L, 4L))
      .toDF("u", "v")
    val e = graft.queries.GraphOps.peelRound(edges).queryExecution
    val semis = e.optimizedPlan.collect {
      case j: Join if j.joinType == LeftSemi => j }
    assert(semis.size == 2,
      s"peel round must keep both endpoint filters as LEFT SEMI joins: " +
        e.optimizedPlan.toString.take(2000))
    val s = e.executedPlan.toString
    assert(!s.contains("BroadcastNestedLoopJoin") &&
      !s.contains("CartesianProduct"), s.take(4000))
  }

  // q57/q107 (dedup clusters): below the driver cutoff the final frame
  // is a local union-find result, so pin the CANDIDATE chain — the
  // ngramJaccard pair generation must stay equi-join-blocked (no
  // all-pairs/nested-loop shape) in both the uncapped and the
  // df-capped (100 TB) configuration.
  for ((label, cap) <- Seq(("q57 uncapped", Int.MaxValue),
      ("q107 dfCap=3", 3))) {
    test(s"dedup-cluster candidates ($label): equi-join-blocked, no BNLJ") {
      val e = graft.queries.TextOps.ngramJaccard(spark, d, cap)
        .queryExecution
      val s = e.executedPlan.toString
      assert(!s.contains("BroadcastNestedLoopJoin") &&
        !s.contains("CartesianProduct"), s.take(4000))
      assert(unboundedCrossJoins(e.optimizedPlan).isEmpty)
    }
  }
}
