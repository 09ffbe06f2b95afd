package graft.queries

import graft.TestSpark
import org.scalatest.funsuite.AnyFunSuite

/** q136/q137 invariants beyond the oracle rows. The oracle already
  * checks the suffix ranks against DuckDB's string sort; here the whole
  * pipeline is re-derived a THIRD way (plain Scala suffix sort on the
  * collected capped corpus) and on crafted fixtures where the answers
  * are known by construction — contained docs, exact duplicates, and a
  * repeat-free corpus.
  */
class SuffixOpsSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  private val sf = "/root/testdata/sf0.001"

  private def cappedDocs(d: String): Array[(Long, String)] =
    spark.read.parquet(s"$d/documents.parquet")
      .filter("doc_id < 100 AND length(text) > 0")
      .select("doc_id", "text").collect()
      .map(r => (r.getLong(0), r.getString(1)))

  /** (doc, pos, suffix) sorted lexicographically, ties by (doc, pos). */
  private def sortedSuffixes(docs: Array[(Long, String)]) =
    docs.flatMap { case (id, t) =>
      (0 until t.length).map(p => (id, p.toLong, t.substring(p)))
    }.sortBy(s => (s._3, s._1, s._2))

  test("q136 matches a driver-side suffix sort exactly") {
    val sorted = sortedSuffixes(cappedDocs(sf))
    // dense rank: identical suffixes share a rank
    val want = collection.mutable.Map.empty[(Long, Long), Long]
    var rank = 0L
    var prev: String = null
    sorted.foreach { case (id, p, suf) =>
      if (suf != prev) { rank += 1; prev = suf }
      want((id, p)) = rank
    }
    val got = SuffixOps.suffixRanks(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(got.size == want.size)
    assert(got == want)
  }

  test("q137 matches a driver-side adjacent-LCP scan exactly") {
    def lcp(a: String, b: String): Long = {
      var i = 0
      val n = math.min(a.length, b.length)
      while (i < n && a.charAt(i) == b.charAt(i)) i += 1
      i.toLong
    }
    val sorted = sortedSuffixes(cappedDocs(sf))
    val lNext = sorted.indices.map { i =>
      if (i + 1 < sorted.length) lcp(sorted(i)._3, sorted(i + 1)._3) else 0L
    }
    val perDoc = collection.mutable.Map.empty[Long, (Long, Long)]
    sorted.indices.foreach { i =>
      val v = math.max(lNext(i), if (i > 0) lNext(i - 1) else 0L)
      val (mx, cnt) = perDoc.getOrElse(sorted(i)._1, (0L, 0L))
      perDoc(sorted(i)._1) =
        (math.max(mx, v), cnt + (if (v >= 20L) 1L else 0L))
    }
    val got = SuffixOps.longestRepeat(spark, sf).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(got == perDoc.toMap)
  }

  test("q139 matches a driver-side keep-first span removal exactly") {
    def lcp(a: String, b: String): Long = {
      var i = 0
      val n = math.min(a.length, b.length)
      while (i < n && a.charAt(i) == b.charAt(i)) i += 1
      i.toLong
    }
    val docs = cappedDocs(sf)
    val sorted = sortedSuffixes(docs)
    // runs of rank-adjacent suffixes with adjacent lcp >= 20
    val covered = collection.mutable.Map.empty[Long, collection.mutable.Set[Long]]
    var runStart = 0
    def closeRun(endExcl: Int): Unit = {
      val run = sorted.slice(runStart, endExcl)
      if (run.length > 1) {
        val keeper = run.minBy(t => (t._1, t._2))
        run.filter(_ != keeper).foreach { case (id, p, _) =>
          val set = covered.getOrElseUpdate(id, collection.mutable.Set.empty)
          ((p + 1) to (p + 20)).foreach(set += _)
        }
      }
      runStart = endExcl
    }
    (1 until sorted.length).foreach { i =>
      if (lcp(sorted(i - 1)._3, sorted(i)._3) < 20L) closeRun(i)
    }
    closeRun(sorted.length)
    val want = docs.map { case (id, t) =>
      val cov = covered.getOrElse(id, collection.mutable.Set.empty)
      val clean = (1 to t.length).filterNot(j => cov.contains(j.toLong))
        .map(j => t.charAt(j - 1)).mkString
      id -> (t.length.toLong, cov.size.toLong,
        java.security.MessageDigest.getInstance("MD5").digest(
          clean.getBytes("UTF-8")).map("%02x".format(_)).mkString)
    }.toMap
    val got = SuffixOps.spanDedupExact(spark, sf).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getString(3)))
      .toMap
    assert(got == want)
    assert(got.values.exists(_._2 > 0L), "the corpus has real repeats")
  }

  test("q139 fixture: an exact duplicate of an earlier doc erases itself") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_sfx139").toString
    val long = "the quick brown fox jumps over the lazy dog again and again"
    Seq(
      (0L, long, "en", "src0", long.length.toLong), // kept intact
      (1L, long, "en", "src1", long.length.toLong), // exact duplicate
      (2L, "entirely unrelated words here", "en", "src2", 29L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.parquet(s"$dir/documents.parquet")
    val got = SuffixOps.spanDedupExact(spark, dir).collect()
      .map(r => r.getLong(0) -> (r.getLong(2), r.getString(3))).toMap
    val md5empty = java.security.MessageDigest.getInstance("MD5")
      .digest(Array.emptyByteArray).map("%02x".format(_)).mkString
    assert(got(0L)._1 == 0L, "first occurrence keeps every char")
    assert(got(1L) == (long.length.toLong, md5empty),
      "the duplicate must erase itself entirely")
    assert(got(2L)._1 == 0L, "the unrelated doc is untouched")
  }

  test("fixtures: containment, duplication, and repeat-free corpora") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_sfx").toString
    Seq(
      (0L, "abcdefgh", "en", "src0", 8L), // contains doc 1's text
      (1L, "cdef", "en", "src1", 4L), // fully contained in doc 0
      (2L, "abcdefgh", "en", "src2", 8L), // exact duplicate of doc 0
      (3L, "zyxw", "en", "src3", 4L)) // shares nothing
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.parquet(s"$dir/documents.parquet")
    val got = SuffixOps.longestRepeat(spark, dir).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    // duplicates repeat their whole text; the contained doc repeats all
    // of itself; the disjoint doc repeats nothing
    assert(got == Map(0L -> 8L, 1L -> 4L, 2L -> 8L, 3L -> 0L))
    // and the suffix ranks tie exactly on the duplicated suffixes:
    // every suffix of doc 0 has an identical twin in doc 2
    val ranks = SuffixOps.suffixRanks(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val byRank = ranks.groupBy(_._3)
    ranks.filter(_._1 == 0L).foreach { case (_, pos, rk) =>
      assert(byRank(rk).exists(t => t._1 == 2L && t._2 == pos),
        s"suffix at pos $pos of doc 0 must tie with doc 2")
    }
  }

  test("q152: run membership catches docs with no ADJACENT cross-set pair") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_sfx152").toString
    // one ≥20-char span shared by corpus docs 1, 2 AND bench doc 10
    // (doc_id % 10 == 0). In suffix-rank order the doc-1 suffix sits
    // next to doc 2's (tie broken by doc_id), NOT next to the bench
    // suffix — an adjacent-pairs-only formulation would miss doc 1.
    val span = "the quick brown fox jumps over it"
    Seq(
      (1L, s"aa $span", "en", "s", 3L + span.length),
      (2L, s"bb $span", "en", "s", 3L + span.length),
      (10L, s"cc $span", "en", "s", 3L + span.length),
      (3L, "totally unrelated words here live", "en", "s", 33L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.parquet(s"$dir/documents.parquet")
    val got = SuffixOps.contaminationSpan(spark, dir).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(got.contains(1L) && got.contains(2L),
      s"both corpus sharers are contaminated, got $got")
    assert(!got.contains(3L) && !got.contains(10L),
      "disjoint doc clean; bench docs never reported")
    // every contaminated position starts a >=20-char span present in
    // the bench doc — re-check doc 1's count against a direct scan
    val t1 = s"aa $span"
    val bench = s"cc $span"
    val direct = (0 until t1.length).count(p =>
      t1.length - p >= 20 && bench.contains(t1.substring(p, p + 20)))
    assert(got(1L)._1 == direct.toLong,
      s"exact position count (direct scan says $direct)")
  }

  test("q152 equals a brute-force scan on seeded random corpora") {
    import spark.implicits._
    // position p of corpus doc t is contaminated ⟺ t[p, p+20) occurs
    // in some bench doc: LCP(suffix p, bench suffix q) ≥ 20 for some q
    // ⟺ p's 20-char prefix is a prefix of some bench suffix. The
    // pipeline must reproduce the count per doc EXACTLY.
    val rnd = new scala.util.Random(42)
    for (trial <- 1 to 3) {
      val words = Vector("aa", "ab", "ba", "bb", "ca")
      def text() = Seq.fill(12 + rnd.nextInt(10))(
        words(rnd.nextInt(words.size))).mkString(" ")
      val base = (0L until 12L).map(i => i -> text()).toMap
      // plant verbatim 20–35 char slices of bench docs (ids 0, 10)
      // into some corpus docs to force cross-set spans
      val planted = base.map { case (id, t) =>
        if (id % 10 != 0 && rnd.nextBoolean()) {
          val src = base(if (rnd.nextBoolean()) 0L else 10L)
          val len = 20 + rnd.nextInt(math.max(1, math.min(16, src.length - 20)))
          val off = rnd.nextInt(math.max(1, src.length - len))
          id -> (t + " " + src.substring(off, off + len))
        } else id -> t
      }
      val dir = java.nio.file.Files
        .createTempDirectory(s"graft_sfx152p$trial").toString
      planted.toSeq.map { case (id, t) => (id, t, "en", "s", t.length.toLong) }
        .toDF("doc_id", "text", "lang", "source", "n_chars")
        .write.parquet(s"$dir/documents.parquet")
      val bench = planted.filter(_._1 % 10 == 0).values.toSeq
      val want = planted.filter(_._1 % 10 != 0).flatMap { case (id, t) =>
        val n = (0 until t.length).count(p =>
          t.length - p >= 20 && bench.exists(_.contains(t.substring(p, p + 20))))
        if (n > 0) Some(id -> n.toLong) else None
      }
      val got = SuffixOps.contaminationSpan(spark, dir).collect()
        .map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(got == want, s"trial $trial: got $got want $want")
    }
  }
}
