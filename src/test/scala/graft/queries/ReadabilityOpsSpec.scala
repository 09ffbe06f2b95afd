package graft.queries

import graft.TestSpark
import org.scalatest.funsuite.AnyFunSuite

/** q249 — driver re-derivation via java.util.regex + a hand-computed
  * fixture sentence. */
class ReadabilityOpsSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  private val sf = "/root/testdata/sf0.001"

  private def count(s: String, pat: String): Long = {
    val m = java.util.regex.Pattern.compile(pat).matcher(s)
    var n = 0L
    while (m.find()) n += 1
    n
  }

  private def flesch(text: String): Long = {
    val w = math.max(count(text, "\\S+"), 1L)
    val se = math.max(count(text, "[.!?]+"), 1L)
    val sy = math.max(count(text.toLowerCase, "[aeiouy]+"), 1L)
    206835L - (1015L * w) / se - (84600L * sy) / w
  }

  test("q249 ≡ driver regex re-derivation per (lang, source)") {
    val docs = spark.read.parquet(s"$sf/documents.parquet")
      .select("lang", "source", "text").collect()
      .map(r => ((r.getString(0), r.getString(1)), flesch(r.getString(2))))
    val expect = docs.groupBy(_._1).map { case (k, vs) =>
      val scores = vs.map(_._2)
      k -> (scores.length.toLong, scores.sum / scores.length,
        scores.count(_ < 30000L).toLong,
        scores.count(v => v >= 30000L && v < 70000L).toLong,
        scores.count(_ >= 70000L).toLong)
    }
    val got = ReadabilityOps.readability(spark, sf).collect()
    assert(got.length == expect.size)
    got.foreach { r =>
      val e = expect((r.getString(0), r.getString(1)))
      assert((r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5),
        r.getLong(6)) == e, s"${r.getString(0)}/${r.getString(1)}")
    }
  }

  test("fixture: known sentence scores match hand arithmetic") {
    // "The cat sat on the mat." — 6 words, 1 sentence run, vowel
    // groups: e,a,a,o,e,a = 6. 206835 − 6090/1 − 507600/6
    assert(flesch("The cat sat on the mat.") ==
      206835L - 1015L * 6 - 84600L * 6 / 6)
  }
}
