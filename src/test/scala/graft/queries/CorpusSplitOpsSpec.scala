package graft.queries

import graft.TestSpark
import org.scalatest.funsuite.AnyFunSuite

/** Fixture pins for the split-hygiene pack. The production corpus has
  * NO exact cross-split twins (verified: 0 at both SFs), so q337's
  * exact-twin channel is witnessed here — the q321-zero-bucket
  * pattern: the reason a channel exists must be provable even when
  * the shipped data never exercises it. */
class CorpusSplitOpsSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def writeDocs(docs: Seq[(Long, String)]): String = {
    val dir = java.nio.file.Files.createTempDirectory("graft_split").toString
    docs.map { case (id, t) =>
      (id, t, "en", "fix", t.length.toLong) }
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.parquet(s"$dir/documents.parquet")
    dir
  }

  // doc_ids chosen by their md5 first hex char: 0→'c' (val), 3→'e'
  // (test), 6→'1' (train), 9→'0' (train)  [java md5 of "0","3","6","9"]
  private def hex1(id: Long): Char = {
    val d = java.security.MessageDigest.getInstance("MD5")
      .digest(id.toString.getBytes("UTF-8"))
    "%02x".format(d(0)).charAt(0)
  }

  test("q337 fixture: exact twin and gram contamination both fire") {
    val train = (0L to 50L).filter(hex1(_) < 'c')
    val evals = (0L to 50L).filter(hex1(_) >= 'c')
    assert(train.nonEmpty && evals.nonEmpty)
    val twinText = (1 to 12).map(i => s"tw$i").mkString(" ")
    val cleanText = (1 to 12).map(i => s"cl$i").mkString(" ")
    // one eval doc duplicates a train doc exactly; one shares an
    // 8-gram prefix; one is clean
    val contamText = (1 to 8).map(i => s"tw$i").mkString(" ") +
      " zz1 zz2 zz3 zz4"
    val docs = Seq(
      (train.head, twinText), (train(1), cleanText.replace("cl", "tr")),
      (evals.head, twinText),          // exact twin
      (evals(1), contamText),          // gram-contaminated only
      (evals(2), cleanText))           // clean
    val dir = writeDocs(docs)
    val got = CorpusSplitOps.splitLeakage(spark, dir).collect()
      .map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    val twinSplit = if (hex1(evals.head) < 'e') "val" else "test"
    assert(got(twinSplit)._2 >= 1L, s"exact twin must fire: $got")
    val totals = got.values.toSeq
    assert(totals.map(_._3).sum >= 2L,
      s"twin + gram-contaminated docs both count as contaminated: $got")
    assert(totals.map(_._1).sum == 3L)
  }

  test("q336 fixture: W1 of identical distributions is 0; shift is exact") {
    // sources A/B identical values; C shifted by +100000 ppm
    val mk = (src: String, off: Int) => (0 until 4).map { i =>
      // diversity = distinct/total: craft texts with controlled ratios
      (src, i, off)
    }
    val dir = java.nio.file.Files.createTempDirectory("graft_w1").toString
    // 4 docs per source; diversity 1e6 (all distinct) for A and B;
    // C: 12 tokens with 6 distinct -> 500000
    def distinctText(seed: Int) =
      (1 to 12).map(i => s"w${seed}_$i").mkString(" ")
    def halfText(seed: Int) =
      ((1 to 6) ++ (1 to 6)).map(i => s"h${seed}_$i").mkString(" ")
    val rows =
      (0 until 4).map(i => (100L + i, distinctText(i), "en", "A")) ++
      (0 until 4).map(i => (200L + i, distinctText(10 + i), "en", "B")) ++
      (0 until 4).map(i => (300L + i, halfText(i), "en", "C"))
    rows.map { case (id, t, l, s0) => (id, t, l, s0, t.length.toLong) }
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.parquet(s"$dir/documents.parquet")
    val got = CorpusSplitOps.w1DriftMatrix(spark, dir).collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    assert(got(("A", "B")) == 0L)
    // A (all mass at 1e6) vs C (all at 5e5): W1 = 5e5 -> 5e8 milli
    assert(got(("A", "C")) == 500000000L)
    assert(got(("B", "C")) == 500000000L)
  }

  test("q335 fixture: shared segments counted by doc reach") {
    val boiler = (1 to 12).map(i => s"b$i").mkString(" ")
    val dir = writeDocs(Seq(
      (1L, boiler + " " + (1 to 12).map(i => s"x$i").mkString(" ")),
      (2L, boiler + " " + (1 to 12).map(i => s"y$i").mkString(" ")),
      (3L, (1 to 12).map(i => s"z$i").mkString(" "))))
    val got = CorpusSplitOps.boilerplateCensus(spark, dir).collect()
    assert(got.length == 1)
    assert(got.head.getString(0) == boiler)
    assert(got.head.getLong(1) == 2L && got.head.getLong(2) == 2L)
  }
}
