package graft.queries

import graft.TestSpark
import org.scalatest.funsuite.AnyFunSuite

/** Fixture pins for the evaluation & selection pack (q348–q350):
  * the k-center greedy trace on a hand-solvable 1-D corpus, ARI in
  * three regimes (perfect agreement = 1.000, single-cluster chance
  * level = 0, degenerate undefined = NULL), and the RAKE deg/freq
  * arithmetic on the canonical two-phrase example. */
class EvalOpsSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("q348 fixture: greedy trace and coverage radii exact") {
    // 1-D points at 0, 10, 4, 7, 1 → seed id 1 (q=0); farthest is
    // id 2 (d²=100); then id 3 (min(16, 36) = 16 beats id 4's 9)
    val qv = Seq((1L, 0, Seq(0L)), (2L, 0, Seq(10L)), (3L, 1, Seq(4L)),
      (4L, 1, Seq(7L)), (5L, 0, Seq(1L)))
      .toDF("vec_id", "label", "q")
    val got = EvalOps.kcenterOf(qv, 3).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getInt(3)))
    assert(got.toSeq === Seq((1L, 1L, 0L, 0), (2L, 2L, 100L, 0),
      (3L, 3L, 16L, 1)))
  }

  private def ari(assign: Seq[(Long, Int)]) =
    EvalOps.ariOf(assign.toDF("cluster", "label")).collect().head

  test("q350 fixture: perfect agreement reads ARI 1.000, purity 1.0") {
    val r = ari(Seq((0L, 0), (0L, 0), (0L, 0), (1L, 1), (1L, 1)))
    assert(r.getLong(6) == 1000L && r.getLong(7) == 1000000L)
  }

  test("q350 fixture: one-cluster assignment reads ARI 0 (chance)") {
    val r = ari(Seq((0L, 0), (0L, 0), (0L, 1)))
    assert(r.getLong(6) == 0L)
    assert(r.getLong(7) == 666666L)
  }

  test("q350 fixture: degenerate two-equal-rows case is NULL-guarded") {
    val r = ari(Seq((0L, 0), (0L, 0)))
    assert(r.isNullAt(6), "max-index = expected-index ⇒ ARI undefined")
  }

  test("q351 fixture: reliability rows and the ECE total exact") {
    // 4 scores → thresholds [100×4, 200×3, 300×2] → buckets 4/7/9/9;
    // gaps 100, 999800, 499650; ECE = 1999200/4 = 499800
    val scored = Seq((100L, false), (200L, true), (300L, false),
      (400L, true)).toDF("score_ppm", "keep")
    val got = EvalOps.eceOf(scored).collect().map(r =>
      (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4)))
    assert(got.toSeq === Seq(
      (-1L, 4L, 250L, 500000L, 499800L),
      (4L, 1L, 100L, 0L, 100L),
      (7L, 1L, 200L, 1000000L, 999800L),
      (9L, 2L, 350L, 500000L, 499650L)))
  }

  test("q349 fixture: RAKE deg/freq scores on the two-phrase doc") {
    val dir = java.nio.file.Files.createTempDirectory("graft_eval").toString
    val text = "red apple the red apple pie"
    Seq((1L, text, "en", "fix", text.length.toLong))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.parquet(s"$dir/documents.parquet")
    val got = EvalOps.rakeKeywords(spark, dir).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    // freq(red)=2 deg(red)=2+3=5 → 2500 milli; apple likewise; pie
    // freq 1 deg 3 → 3000. Phrase scores: 2500+2500+3000 vs 2500+2500.
    assert(got.toSeq === Seq(("red apple pie", 3L, 1L, 8000L),
      ("red apple", 2L, 1L, 5000L)))
  }

  test("q362 fixture: perfect predictor — Brier 0, REL 0, RES = UNC·N") {
    // scores {0,0,1e6,1e6} matching keep exactly: ȳ = 500000,
    // UNC = 25e10; two buckets each n=2 with res_xn = 2·(5e5)² = 5e11;
    // total: brier 0, rel 0, res 1e12 → REL/N − RES/N + UNC = Brier ✓
    val scored = Seq((0L, false), (0L, false),
      (1000000L, true), (1000000L, true)).toDF("score_ppm", "keep")
    val rows = EvalOps.brierOf(scored).collect()
    val total = rows.find(_.getLong(0) == -1L).get
    assert((total.getLong(1), total.getLong(4), total.getLong(5),
      total.getLong(6), total.getLong(7)) ===
      ((4L, 0L, 0L, 1000000000000L, 250000000000L)))
    val perBucket = rows.filter(_.getLong(0) >= 0)
    assert(perBucket.length === 2)
    assert(perBucket.forall(r => r.getLong(4) == 0L && r.getLong(5) == 0L
      && r.getLong(6) == 500000000000L))
  }

  test("q362 fixture: anti-predictor — Brier 1e12, REL dominates") {
    val scored = Seq((0L, true), (0L, true),
      (1000000L, false), (1000000L, false)).toDF("score_ppm", "keep")
    val total = EvalOps.brierOf(scored).collect()
      .find(_.getLong(0) == -1L).get
    // every row errs by 1e6 → brier 1e12; per bucket rel = 2·(1e6)²
    assert(total.getLong(4) === 1000000000000L)
    assert(total.getLong(5) === 4000000000000L, "ΣREL = 2·2e12")
  }

  test("q348 guard: empty embeddings yields an empty trace, not a throw") {
    // ADVICE r9: the seed read must not ArrayIndexOutOfBounds on a
    // degenerate corpus — the greedy trace of nothing is nothing.
    val empty = Seq.empty[(Long, Int, Seq[Long])]
      .toDF("vec_id", "label", "q")
    val got = EvalOps.kcenterOf(empty, 3)
    assert(got.count() === 0L)
    assert(got.columns.toSeq ===
      Seq("round", "vec_id", "coverage_d2", "label"))
  }
}
