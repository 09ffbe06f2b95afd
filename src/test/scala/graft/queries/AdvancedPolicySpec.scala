package graft.queries

import graft.TestSpark
import org.scalatest.funsuite.AnyFunSuite

/** q338/q339 pins. The shipped corpus rarely makes the two dedup keep
  * policies diverge (duplicate families mostly sit inside one source
  * at the small SFs), so the divergence is witnessed on a controlled
  * cluster — the q151 convention. */
class AdvancedPolicySpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("q338 fixture: balanced keep picks the small source over min-id") {
    val dir = java.nio.file.Files.createTempDirectory("graft_bal").toString
    def uniq(seed: Int) =
      (1 to 15).map(i => s"u${seed}w$i").mkString(" ")
    val dup = (1 to 15).map(i => s"dup$i").mkString(" ")
    val rows = Seq(
      (1L, uniq(1), "big"), (2L, uniq(2), "big"), (3L, uniq(3), "big"),
      (4L, dup, "big"),
      (9L, dup, "small"))
    rows.map { case (id, t, src) => (id, t, "en", src, t.length.toLong) }
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.parquet(s"$dir/documents.parquet")
    val got = Advanced.sourceBalancedDedup(spark, dir).collect()
      .map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    // cluster {4, 9}: naive keeps 4 (big); balanced keeps 9 (small has
    // 1 doc vs big's 4)
    assert(got("big") == ((1L, 1L, 0L)), got.toString)
    assert(got("small") == ((1L, 0L, 1L)), got.toString)
  }

  test("q339: confusion partitions n; kappa matches the BigInt formula") {
    val sf = "/root/testdata/sf0.001"
    val r = PipelineOps.scorerAgreement(spark, sf).collect().head
    val Seq(n, n11, n10, n01, n00) =
      (0 to 4).map(i => BigInt(r.getLong(i)))
    assert(n == n11 + n10 + n01 + n00)
    assert(BigInt(r.getLong(5)) == (n11 + n00) * 1000000 / n)
    val src = (n11 + n10) * (n11 + n01) + (n00 + n01) * (n00 + n10)
    if (n * n != src) {
      val expect = (n * (n11 + n00) - src) * 1000 / (n * n - src)
      assert(BigInt(r.getLong(6)) == expect)
    } else assert(r.isNullAt(6))
    // both scorers must actually vary on this corpus (vacuity rule)
    assert(n11 + n10 > 0 && n01 + n00 > 0, "rules verdict varies")
    assert(n11 + n01 > 0 && n10 + n00 > 0, "LM verdict varies")
  }
}
