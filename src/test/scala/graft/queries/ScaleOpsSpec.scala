package graft.queries

import graft.TestSpark
import org.scalatest.funsuite.AnyFunSuite

/** Fixture pins for the scale-diagnostics pack (q352–q356): the skew
  * algebra on hand-solvable key multisets, bucket-balance arithmetic,
  * the byte estimator, and the split fan-out formula. */
class ScaleOpsSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("q352 fixture: skew profile of a 10-1-1 key multiset") {
    // counts {a:10, b:1, c:1}: n=12, keys=3, top1 = 10/12 → 833333
    // ppm, skew = 10·3/12 → 2500 milli, eff = 144 div 102 = 1,
    // heavy: only a (10·3 = 30 > 24)
    val f = (Seq.fill(10)("a") ++ Seq("b", "c")).toDF("k0")
    val r = ScaleOps.keyAuditOf(f, "k0", "fix").collect().head
    assert((r.getLong(1), r.getLong(2), r.getLong(3)) === ((12L, 3L, 10L)))
    assert(r.getLong(4) === 833333L, "top1_share_ppm")
    assert(r.getLong(5) === 2500L, "skew_factor_milli")
    assert(r.getLong(6) === 1L, "eff_keys collapses toward the hot key")
    assert(r.getLong(7) === 1L, "heavy census")
  }

  test("q352 fixture: a uniform key reads eff_keys = n_keys, 0 heavy") {
    val f = (1 to 40).map(i => (i % 4).toString).toDF("k0")
    val r = ScaleOps.keyAuditOf(f, "k0", "fix").collect().head
    assert(r.getLong(6) === 4L && r.getLong(7) === 0L)
    assert(r.getLong(5) === 1000L, "max = mean → skew factor 1.000")
  }

  test("q353 fixture: bucket occupancy and imbalance at P=2") {
    // keys 0,2,4,6 → bucket 0; 1 → bucket 1: max 4, min 1,
    // imbalance = 4·2·1000 div 5 = 1600
    val f = Seq(0L, 2L, 4L, 6L, 1L).toDF("k0")
    val r = ScaleOps.balanceOf(f, "k0", Seq(2L)).collect().head
    assert((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4),
      r.getLong(5)) === ((2L, 5L, 4L, 1L, 1600L)))
  }

  test("q354 fixture: byte estimator and threshold flag") {
    import org.apache.spark.sql.functions._
    val t = Seq(("ab"), ("cdef")).toDF("s")
    val r = ScaleOps.bcastRowOf(t, "fix", lit(8) + length(col("s")))
      .collect().head
    // rows 2, bytes (8+2)+(8+4) = 22, avg 11, under 10 MiB
    assert((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))
      === ((2L, 22L, 11L, 1L)))
  }

  test("q352 property: audit ≡ driver reference on 10 seeded multisets") {
    for (seed <- 1 to 10) {
      val rnd = new scala.util.Random(seed)
      val xs = Seq.fill(20 + rnd.nextInt(60))(
        ('a' + rnd.nextInt(2 + seed)).toChar.toString)
      val r = ScaleOps.keyAuditOf(xs.toDF("k0"), "k0", "p").collect().head
      val counts = xs.groupBy(identity).view.mapValues(_.size.toLong)
      val n = xs.size.toLong
      val keys = counts.size.toLong
      val mx = counts.values.max
      val ss = counts.values.map(c => c * c).sum
      val heavy = counts.values.count(c => c * keys > 2 * n).toLong
      assert((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4),
        r.getLong(5), r.getLong(6), r.getLong(7)) ===
        ((n, keys, mx, mx * 1000000L / n, mx * keys * 1000L / n,
          n * n / ss, heavy)), s"seed=$seed")
      assert(r.getLong(6) >= 1L && r.getLong(6) <= keys,
        "1 ≤ eff_keys ≤ n_keys")
    }
  }

  test("q356 fixture: ceil-division fan-out at target 32") {
    val f = (Seq.fill(96)(7L) ++ Seq.fill(33)(8L) ++ Seq(9L))
      .toDF("k0")
    val got = ScaleOps.splitPlanOf(f, "k0", "fix", 32L).collect()
      .map(r => (r.getLong(1), r.getLong(2), r.getLong(3)))
    // 96 → 3 tasks, 33 → 2, 1 → 1; ordered by fan-out
    assert(got.toSeq === Seq((7L, 96L, 3L), (8L, 33L, 2L),
      (9L, 1L, 1L)))
  }
}
