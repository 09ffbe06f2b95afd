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
}
