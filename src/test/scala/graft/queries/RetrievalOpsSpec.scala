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

  private def writeDocs(docs: Seq[(Long, String)]): String = {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_ret").toString
    docs.map { case (id, t) => (id, t, "en", "fix", t.length.toLong) }
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.parquet(s"$dir/documents.parquet")
    dir
  }

  test("q148 fixture: postings truncate to the 16 smallest doc ids; tf vs df") {
    // term "a b" in docs 0..19 (once each) and TWICE in doc 20
    val docs = (0L to 19L).map(i => i -> "a b pad") :+
      (20L -> "a b x a b")
    val dir = writeDocs(docs)
    // postings ship as a CSV string (driver scalar-only contract) —
    // split back to ids here
    val rows = RetrievalOps.postingLists(spark, dir).collect()
      .map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2),
          r.getString(3).split(',').toSeq.map(_.toLong))).toMap
    val (df, tf, postings) = rows("a b")
    assert(df == 21L && tf == 22L, "doc 20 counts once in df, twice in tf")
    assert(postings == (0L to 15L), "first 16 doc ids, sorted")
    // a singleton term keeps its full (short) posting list
    assert(rows("b x") == ((1L, 1L, Seq(20L))))
  }

  test("q149 fixture: chunk count, overlap, and boundary clamping") {
    // 50 tokens -> starts at 0,24,48 (1-based 1,25,49): lens 32,26,2
    val toks = (1 to 50).map(i => s"t$i")
    val dir = writeDocs(Seq(0L -> toks.mkString(" "), 1L -> "solo"))
    val got = RetrievalOps.chunkDocs(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> (r.getLong(2), r.getString(3)))
      .toMap
    assert(got.keys.count(_._1 == 0L) == 3)
    assert(got((0L, 0L))._1 == 32L && got((0L, 1L))._1 == 26L &&
      got((0L, 2L))._1 == 2L)
    def h(s: String) = java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    // stride 24 < len 32: chunk k starts at token 24k, so chunks 0 and 1
    // share tokens 25..32 — re-derive each chunk text independently
    assert(got((0L, 0L))._2 == h(toks.slice(0, 32).mkString(" ")))
    assert(got((0L, 1L))._2 == h(toks.slice(24, 50).mkString(" ")))
    assert(got((0L, 2L))._2 == h(toks.slice(48, 50).mkString(" ")))
    assert(got((1L, 0L)) == ((1L, h("solo"))), "sub-chunk doc: one chunk")
  }

  test("q155 real corpus: RRF arithmetic holds row-by-row, ordered, top-10") {
    val rows = RetrievalOps.hybridRrf(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(rows.length == 10)
    rows.foreach { case (_, lr, vr, rrf) =>
      val want = (if (lr > 0) 1000000L / (60 + lr) else 0L) +
        (if (vr > 0) 1000000L / (60 + vr) else 0L)
      assert(rrf == want, s"rrf arithmetic: $lr/$vr -> $rrf != $want")
      assert(lr > 0 || vr > 0, "every fused doc came from some list")
    }
    assert(rows.map(r => (-r._4, r._1)).sorted.toSeq ==
      rows.map(r => (-r._4, r._1)).toSeq, "sorted by (rrf desc, doc_id)")
  }

  test("q155 fixture: a doc in BOTH lists outranks each single-list winner") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_rrf").toString
    // lexical: doc 1 strongest, doc 3 weaker; doc 2 has no query term
    Seq(
      (1L, "spark join window spark join window spark join"),
      (2L, "pad pad pad pad pad pad pad pad"),
      (3L, "spark join pad pad pad pad pad pad"))
      .map { case (id, t) => (id, t, "en", "fix", t.length.toLong) }
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.parquet(s"$dir/documents.parquet")
    // dense: vec 0 = query; doc 2 closest, doc 3 second; doc 1 has NO
    // embedding (absent from the dense list entirely)
    Seq(
      (0L, Array(1.0f, 0.0f), 0),
      (2L, Array(1.0f, 0.1f), 0),
      (3L, Array(0.9f, 0.5f), 0))
      .toDF("vec_id", "embedding", "label")
      .write.parquet(s"$dir/embeddings.parquet")
    val got = RetrievalOps.hybridRrf(spark, dir).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3)))
      .toMap
    assert(got(1L) == ((1L, 0L, 1000000L / 61)), "lex-only winner, vec 0")
    assert(got(2L) == ((0L, 1L, 1000000L / 61)), "vec-only winner, lex 0")
    assert(got(3L)._1 == 2L && got(3L)._2 == 2L, "doc 3 second in both")
    assert(got(3L)._3 > got(1L)._3 && got(3L)._3 > got(2L)._3,
      s"fusion: second-in-both beats first-in-one, got $got")
  }

  test("q175 metrics re-derive from the literal qrel definition") {
    val docs = spark.read.parquet(s"$sf/documents.parquet")
      .select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1).split(" ", -1)).toMap
    val expected = (0L until 5L).map { q =>
      val terms = docs(q).take(3).distinct.toSet
      val matches = docs.toSeq.filter(_._1 != q).map { case (id, ws) =>
        (id, terms.count(t => ws.contains(t)).toLong,
          ws.count(terms.contains).toLong)
      }.filter(_._2 > 0)
      val rel = matches.filter(_._2 >= 2).map(_._1).toSet
      val ranked = matches.sortBy { case (id, nt, tf) => (-nt, -tf, id) }
        .map(_._1)
      val rel10 = ranked.take(10).count(rel.contains).toLong
      val firstRel = ranked.zipWithIndex.collectFirst {
        case (id, i) if rel.contains(id) => i + 1L }
      q -> ((rel.size.toLong, rel10 * 1000000L / rel.size,
        firstRel.map(1000000L / _).getOrElse(0L)))
    }.toMap
    val got = RetrievalOps.retrievalEval(spark, sf).collect()
      .map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    assert(got == expected)
    assert(expected.values.exists(_._2 > 0), "some recall is non-zero")
  }

  test("q253 NDCG re-derives from the literal qrels + log table") {
    val disc = (1 to 10).map(i =>
      (1e6 / (math.log(i + 1.0) / math.log(2.0))).toLong)
    val docs = spark.read.parquet(s"$sf/documents.parquet")
      .select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1).split(" ", -1)).toMap
    val expected = (0L until 5L).flatMap { q =>
      val terms = docs(q).take(3).distinct.toSet
      val matches = docs.toSeq.filter(_._1 != q).map { case (id, ws) =>
        (id, terms.count(t => ws.contains(t)).toLong,
          ws.count(terms.contains).toLong)
      }.filter(_._2 > 0)
      val rel = matches.filter(_._2 >= 2).map(_._1).toSet
      if (rel.isEmpty) None
      else {
        val ranked = matches.sortBy { case (id, nt, tf) => (-nt, -tf, id) }
          .map(_._1)
        val dcg = ranked.take(10).zipWithIndex.collect {
          case (id, i) if rel.contains(id) => disc(i)
        }.sum
        val idcg = disc.take(math.min(rel.size, 10)).sum
        Some(q -> ((rel.size.toLong, dcg, idcg,
          dcg * 1000000L / idcg)))
      }
    }.toMap
    val got = RetrievalOps.ndcgEval(spark, sf).collect()
      .map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))).toMap
    assert(got == expected)
    // sanity: NDCG bounded by 1e6 and positive somewhere
    assert(got.values.forall(_._4 <= 1000000L))
    assert(got.values.exists(_._4 > 0L))
  }

  test("q261 hard negatives: disjoint from qrels, ranked, top-5") {
    val docs = spark.read.parquet(s"$sf/documents.parquet")
      .select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1).split(" ", -1)).toMap
    val expected = (0L until 5L).flatMap { q =>
      val terms = docs(q).take(3).distinct.toSet
      val matches = docs.toSeq.filter(_._1 != q).map { case (id, ws) =>
        (id, terms.count(t => ws.contains(t)).toLong,
          ws.count(terms.contains).toLong)
      }.filter(_._2 > 0)
      matches.filter(_._2 < 2) // non-relevant only
        .sortBy { case (id, nt, tf) => (-nt, -tf, id) }
        .take(5).zipWithIndex
        .map { case ((id, nt, tf), i) => (q, i + 1L, id, nt, tf) }
    }
    val got = RetrievalOps.hardNegatives(spark, sf).collect()
      .map(r => (r.getLong(0), r.getInt(1).toLong, r.getLong(2),
        r.getLong(3), r.getLong(4))).toSeq
    assert(got.sorted == expected.sorted)
    // hard negatives are never relevant: every negative has < 2 terms
    assert(got.forall(_._4 < 2))
  }
}
