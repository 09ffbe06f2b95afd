package graft.queries

import graft.TestSpark
import org.scalatest.funsuite.AnyFunSuite

/** q146 invariants beyond the oracle rows: the whole BM25 fixed-point
  * pipeline is re-derived independently driver-side on the real corpus,
  * and controlled fixtures pin the ranking-function contracts (idf
  * favors rare terms, tf saturates, length norm penalizes long docs,
  * more matched terms beat fewer at equal length).
  */
class RetrievalOpsSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  private val sf = "/root/testdata/sf0.001"
  private val terms = Seq("spark", "join", "window")

  /** The exact integer formula, computed a second way (plain Scala). */
  private def score(docs: Seq[(Long, String)]): Seq[(Long, Long, Long)] = {
    val prof = docs.map { case (id, text) =>
      val ws = text.split(" ", -1)
      (id, ws.length.toLong, terms.map(t => ws.count(_ == t).toLong))
    }
    val n = prof.size.toLong
    val tt = prof.map(_._2).sum
    val dfs = terms.indices.map(i => prof.count(_._3(i) > 0).toLong)
    prof.map { case (id, dl, tfs) =>
      val s = terms.indices.map { i =>
        val tf = tfs(i)
        if (tf == 0) 0L
        else ((2 * (n - dfs(i)) + 1) * 1000000L / (2 * dfs(i) + 1)) * tf * 2200L /
          (tf * 1000L + 300L + 900L * dl * n / tt)
      }.sum
      (id, tfs.count(_ > 0).toLong, s)
    }.filter(_._3 > 0)
      .sortBy { case (id, _, s) => (-s, id) }
      .take(20)
  }

  test("q146 matches an independent driver-side re-derivation") {
    val docs = spark.read.parquet(s"$sf/documents.parquet")
      .select("doc_id", "text").collect()
      .map(r => (r.getLong(0), r.getString(1))).toSeq
    val want = score(docs)
    val got = RetrievalOps.bm25TopK(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    assert(got == want)
    assert(want.nonEmpty, "the corpus matches the fixed query")
  }

  private def runOn(docs: Seq[(Long, String)]): Seq[(Long, Long, Long)] = {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_bm25").toString
    docs.map { case (id, t) => (id, t, "en", "fix", t.length.toLong) }
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.parquet(s"$dir/documents.parquet")
    RetrievalOps.bm25TopK(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
  }

  test("q146 fixture: more matched terms wins at equal length; filler-only absent") {
    val got = runOn(Seq(
      (0L, "spark join window pad"), // all three terms, dl=4
      (1L, "spark join pad pad"),    // two terms, dl=4
      (2L, "spark pad pad pad"),     // one term, dl=4
      (3L, "pad pad pad pad")))      // no term -> filtered out
    assert(got.map(_._1) == Seq(0L, 1L, 2L), "rank by matched-term count")
    assert(got.map(_._2) == Seq(3L, 2L, 1L))
  }

  test("q146 fixture: rarer term outranks common term at equal tf/length") {
    // "join" in 1 of 4 docs, "spark" in 3 of 4: doc 0 (rare term only)
    // must outscore doc 1 (common term only).
    val got = runOn(Seq(
      (0L, "join pad pad pad"),
      (1L, "spark pad pad pad"),
      (2L, "spark x y z"),
      (3L, "spark a b c"))).map(r => r._1 -> r._3).toMap
    assert(got(0L) > got(1L), s"idf: rare > common, got $got")
  }

  test("q146 fixture: longer doc with same tf scores lower") {
    val got = runOn(Seq(
      (0L, "spark pad"),
      (1L, "spark pad pad pad pad pad pad pad pad pad"),
      (2L, "quiet r s t u v w x y z"))).map(r => r._1 -> r._3).toMap
    assert(got(0L) > got(1L), s"length norm, got $got")
  }

  test("q146 fixture: tf saturates (diminishing returns, still monotone)") {
    val got = runOn(Seq(
      (0L, "spark pad pad pad pad pad pad pad"),
      (1L, "spark spark pad pad pad pad pad pad"),
      (2L, "spark spark spark spark pad pad pad pad"),
      (3L, "quiet a b c d e f g"))).map(r => r._1 -> r._3).toMap
    assert(got(1L) > got(0L) && got(2L) > got(1L), "monotone in tf")
    assert(got(1L) - got(0L) > got(2L) - got(1L),
      s"saturating: tf 1->2 gains more than 2->4, got $got")
  }
}
