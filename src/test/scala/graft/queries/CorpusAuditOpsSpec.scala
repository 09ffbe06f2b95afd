package graft.queries

import graft.TestSpark
import org.scalatest.funsuite.AnyFunSuite

/** q254/q255 — driver re-derivations (independent md5 + prefix sums). */
class CorpusAuditOpsSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  private val sf = "/root/testdata/sf0.001"

  private def md5hex(s: String): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString

  test("q254 ≡ driver chunking + md5 census per source") {
    val docs = spark.read.parquet(s"$sf/documents.parquet")
      .select("doc_id", "source", "text").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2)))
    val chunks = docs.flatMap { case (id, src, text) =>
      val ws = text.split(" ", -1)
      val nChunks = (ws.length - 1) / 24 + 1
      (0 until nChunks).map { k =>
        (src, md5hex(ws.slice(k * 24, k * 24 + 32).mkString(" ")), id)
      }
    }
    val expect = chunks.groupBy(_._1).map { case (src, cs) =>
      val perMd5 = cs.groupBy(_._2)
      val n = cs.length.toLong
      val dist = perMd5.size.toLong
      src -> (n, dist, n - dist,
        perMd5.values.count(_.map(_._3).distinct.length > 1).toLong,
        (n - dist) * 1000000L / n)
    }
    val got = CorpusAuditOps.chunkDedup(spark, sf).collect()
    assert(got.length == expect.size)
    got.foreach { r =>
      assert((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4),
        r.getLong(5)) == expect(r.getString(0)), r.getString(0))
    }
  }

  test("q255 ≡ driver prefix sums; coverage is monotone") {
    val words = spark.read.parquet(s"$sf/documents.parquet")
      .select("text").collect()
      .flatMap(_.getString(0).split(" ", -1))
    val freq = words.groupBy(identity).view.mapValues(_.length.toLong)
      .toSeq.sortBy { case (w, f) => (-f, w) }
    val total = freq.map(_._2).sum
    val got = CorpusAuditOps.vocabCoverage(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .sortBy(_._1)
    assert(got.map(_._1).toSeq == Seq(1000L, 2000L, 4000L, 8000L, 16000L))
    got.foreach { case (v, inVocab, covered, ppm) =>
      val exp = freq.take(v.toInt).map(_._2).sum
      assert(covered == exp, s"V=$v")
      assert(inVocab == math.min(v, freq.size.toLong))
      assert(ppm == covered * 1000000L / total)
    }
    assert(got.map(_._3).toSeq == got.map(_._3).sorted.toSeq)
    assert(got.last._3 <= total)
  }
}
