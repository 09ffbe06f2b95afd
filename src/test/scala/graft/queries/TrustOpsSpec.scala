package graft.queries

import graft.TestSpark
import org.scalatest.funsuite.AnyFunSuite

/** Fixture pins for the trust & audit pack (q342–q347). The channels
  * the shipped corpus leaves vacuous are witnessed here per the
  * q237/q321 discipline: an l=1 class with a MISSING global category
  * (q343's absent-category term), a blocking scheme with completeness
  * strictly between 0 and 1 (q345), and a `sub_dup` containment pair
  * (q346 — the corpus classifies everything partial_overlap/near_dup).
  * q344's κ formula is additionally cross-checked against a BigInt
  * re-derivation over many vote mixes (both κ signs covered). */
class TrustOpsSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def qiFixture = Seq(
    (1, 0L, "A"), (1, 0L, "A"), (1, 0L, "B"), (1, 0L, "B"),
    (2, 0L, "A"), (2, 0L, "A"), (2, 0L, "A"))
    .toDF("c_nationkey", "bal_bucket", "c_mktsegment")

  test("q342 fixture: l census separates the l=1 class") {
    val got = TrustOps.lDiversityOf(qiFixture).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(got === Map(1L -> (1L, 3L), 2L -> (1L, 4L)))
  }

  test("q343 fixture: TV exact incl. the absent-category mass") {
    // global: A=5, B=2, N=7. class (1,0) {A:2,B:2}: Σ|cnt·N−g·n| =
    // 6+6, no absent term → 12e6 div 56 = 214285. class (2,0) {A:3}:
    // present 6, ABSENT B adds n·(N−g_present) = 3·2 = 6 → 12e6 div
    // 42 = 285714 — dropping the absent term would read 142857.
    val got = TrustOps.tClosenessOf(qiFixture).collect()
      .map(r => (r.getInt(0), r.getLong(1)) ->
        (r.getLong(2), r.getLong(3), r.getLong(4))).toMap
    assert(got === Map((1, 0L) -> (4L, 2L, 214285L),
      (2, 0L) -> (3L, 1L, 285714L)))
  }

  private def fleissRow(votes: Seq[Long]) =
    TrustOps.fleissOf(votes.toDF("v")).collect().head

  test("q344 fixture: hand-computed Fleiss kappa (3 raters)") {
    // votes [3,0,1,2,3]: N=5 T1=9 A=22 S=81+36=117 →
    // P̄=22/30, Pe=117/225, κ=(330−234)/(2·108)=96/216=0.4444
    val r = fleissRow(Seq(3L, 0L, 1L, 2L, 3L))
    assert(r.getLong(0) == 5L && r.getLong(1) == 9L && r.getLong(2) == 22L)
    assert(r.getLong(3) == 733333L) // pbar_ppm
    assert(r.getLong(4) == 520000L) // pe_ppm
    assert(r.getLong(5) == 444L)    // kappa_milli
  }

  test("q344: kappa NULL-guarded when every vote is unanimous-same") {
    val r = fleissRow(Seq(3L, 3L))
    assert(r.isNullAt(5), "9N² = S ⇒ κ undefined ⇒ NULL")
  }

  test("q344 property: integer formula equals BigInt re-derivation") {
    // covers negative κ (e.g. all-split votes) and both parities
    val mixes = Seq(
      Seq(1L, 2L), Seq(1L, 2L, 1L, 2L, 3L), Seq(0L, 3L, 0L, 3L),
      (0L to 30L).map(i => i % 4).toSeq,
      (0L to 17L).map(i => (i * 7 + 3) % 4).toSeq)
    for (votes <- mixes) {
      val n = BigInt(votes.size)
      val t1 = BigInt(votes.sum)
      val a = BigInt(votes.map(v => if (v == 1L || v == 2L) 2L else 6L).sum)
      val sS = t1 * t1 + (3 * n - t1) * (3 * n - t1)
      val r = fleissRow(votes)
      assert(BigInt(r.getLong(3)) == a * 1000000 / (6 * n))
      assert(BigInt(r.getLong(4)) == sS * 1000000 / (9 * n * n))
      if (9 * n * n == sS) assert(r.isNullAt(5))
      else {
        // BigInt / truncates toward zero — the Spark div ≡ DuckDB //
        // semantics (pinned empirically; the q244 negative-bucket
        // precedent)
        val k = (3 * a * n - 2 * sS) * 1000 / (2 * (9 * n * n - sS))
        assert(BigInt(r.getLong(5)) == k, s"votes=$votes")
      }
    }
  }

  test("q345 fixture: RR and PC exact; PC strictly between 0 and 1") {
    val base = Seq(
      ("n1", "g1", "a", "1"), ("n2", "g1", "b", "1"), ("n3", "g1", "c", "2"),
      ("n4", "g2", "d", "3"), ("n5", "g2", "e", "4"),
      ("n6", "g3", "f", "5"))
      .toDF("c_name", "k_prefix16", "k_suffix2", "k_nation")
    val got = TrustOps.blockingQualityOf(base).collect()
      .map(r => r.getString(0) -> r).toMap
    // truth: C(3,2)+C(2,2) = 4 pairs; all-pairs C(6,2) = 15
    val a = got("A_prefix16")
    assert(a.getLong(1) == 3L && a.getLong(2) == 3L && a.getLong(3) == 4L)
    assert(a.getLong(4) == (15L - 4L) * 1000000L / 15L) // rr 733333
    assert(a.getLong(6) == 4L && a.getLong(7) == 1000000L)
    val b = got("B_nationkey")
    assert(b.getLong(3) == 1L)       // one candidate pair (n1,n2)
    assert(b.getLong(4) == 933333L)
    assert(b.getLong(6) == 1L && b.getLong(7) == 250000L) // 1/4 truth
    val c = got("C_suffix2")
    assert(c.getLong(3) == 0L && c.getLong(4) == 1000000L)
    assert(c.getLong(6) == 0L && c.getLong(7) == 0L) // wrong key: PC 0
  }

  test("q346 fixture: embedded doc classifies sub_dup") {
    val dir = java.nio.file.Files.createTempDirectory("graft_trust").toString
    val big = (1 to 12).map(i => s"w$i").mkString(" ")
    val sub = (1 to 6).map(i => s"w$i").mkString(" ")
    Seq((1L, big, "en", "fix", big.length.toLong),
      (2L, sub, "en", "fix", sub.length.toLong))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.parquet(s"$dir/documents.parquet")
    val got = TrustOps.jaccardContainment(spark, dir).collect()
    assert(got.length == 1)
    val r = got.head
    // A=doc 1 (10 shingles), B=doc 2 (4 shingles, all shared)
    assert(r.getLong(2) == 4L && r.getLong(3) == 10L && r.getLong(4) == 4L)
    assert(r.getLong(5) == 400000L)  // cont_a
    assert(r.getLong(6) == 1000000L) // cont_b: fully contained
    assert(r.getLong(7) == 400000L)  // jaccard — BELOW a 0.5 dedup bar
    assert(r.getString(8) == "sub_dup")
  }

  test("q347 fixture: risk ladder exact and monotone in QI width") {
    val dir = java.nio.file.Files.createTempDirectory("graft_trust").toString
    Seq(("A", 1, 100.0), ("A", 1, 100.0), ("A", 2, 5000.0), ("B", 1, 100.0))
      .toDF("c_mktsegment", "c_nationkey", "c_acctbal")
      .write.parquet(s"$dir/customer.parquet")
    val got = TrustOps.qiUniqueness(spark, dir).collect()
      .map(r => r.getLong(0) ->
        (r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5))).toMap
    assert(got(3L) == (2L, 1L, 1L, 250000L)) // segment only
    assert(got(5L) == (2L, 1L, 1L, 250000L)) // nation only
    assert(got(1L) == (3L, 1L, 2L, 500000L)) // segment+nation
    assert(got(0L) == (3L, 1L, 2L, 500000L)) // + balance bucket
    // widening the QI never decreases uniqueness risk
    assert(got(0L)._4 >= got(1L)._4 && got(1L)._4 >= got(3L)._4)
  }
}
