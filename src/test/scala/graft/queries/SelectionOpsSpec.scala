package graft.queries

import graft.TestSpark
import org.apache.spark.unsafe.types.UTF8String
import org.scalatest.funsuite.AnyFunSuite

/** q134/q135 invariants beyond the oracle rows.
  *
  * q134: the whole DSIR pipeline (bigram hash → bucket → smoothed
  * histograms → integer scores → top-k) is re-derived independently in
  * plain Scala from the raw parquet and must agree EXACTLY — the same
  * belt-and-braces posture as QuantizedIvfSpec. Plus the ordering
  * contracts: no target-source rows, scores positive, ratio_ppm
  * descending with doc_id tie-break.
  *
  * q135/bpeTrain: the merge loop learns the textbook merge sequence on
  * the classic BPE fixture (hug/pug/pun/bun/hugs — Sennrich-style
  * worked example), and applying learned merges never increases a
  * word's token count.
  */
class SelectionOpsSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  private val sf = "/root/testdata/sf0.001"

  private def bigramBuckets(text: String): Seq[Long] = {
    val arr = graft.functions.GramHash.hashes(UTF8String.fromString(text), 2)
    (0 until arr.numElements()).map(i => arr.getLong(i) % 64)
  }

  test("q134 matches an independent driver-side re-derivation") {
    val docs = spark.read.parquet(s"$sf/documents.parquet")
      .select("doc_id", "source", "text").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2)))
    val occ = docs.flatMap { case (id, src, text) =>
      bigramBuckets(text).map(b => (id, src, b))
    }
    val cntT = occ.filter(_._2 == "src0").groupBy(_._3).view.mapValues(_.length.toLong).toMap
    val cntR = occ.filter(_._2 != "src0").groupBy(_._3).view.mapValues(_.length.toLong).toMap
    val want = occ.filter(_._2 != "src0").groupBy(o => (o._1, o._2)).map {
      case ((id, src), os) =>
        val n = os.length.toLong
        val tgt = os.map(o => cntT.getOrElse(o._3, 0L) + 1L).sum
        val raw = os.map(o => cntR.getOrElse(o._3, 0L) + 1L).sum
        (id, src, n, tgt, raw, tgt * 1000000L / raw)
    }.toSeq.sortBy(t => (-t._6, t._1)).take(20)

    val got = SelectionOps.dsirSelect(spark, sf).collect().map(r =>
      (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5))).toSeq
    assert(got === want)
  }

  test("q134 ordering contract: raw-only, positive, sorted, tie-broken") {
    val rows = SelectionOps.dsirSelect(spark, sf).collect()
    assert(rows.length == 20)
    rows.foreach { r =>
      assert(r.getString(1) != "src0", "target docs must not be selected")
      assert(r.getLong(3) > 0 && r.getLong(4) > 0)
      // smoothing floor: each occurrence contributes ≥ 1 to both sums
      assert(r.getLong(3) >= r.getLong(2) && r.getLong(4) >= r.getLong(2))
    }
    val keys = rows.map(r => (-r.getLong(5), r.getLong(0))).toSeq
    assert(keys == keys.sorted, "(ratio_ppm DESC, doc_id ASC) total order")
  }

  test("q135 pair counts: every pair is a 2-char window with plausible mass") {
    val rows = SelectionOps.bpePairCounts(spark, sf).collect()
    assert(rows.length == 15)
    val counts = rows.map(_.getLong(1)).toSeq
    assert(counts == counts.sorted.reverse, "descending by count")
    rows.foreach(r => assert(r.getString(0).length == 2))
  }

  test("bpeTrain learns the textbook merges on the classic fixture") {
    // hug×10 pug×5 pun×12 bun×4 hugs×5 — worked example: first merge
    // (u,g)=20, then (u,n)=16, then (h,ug)=15
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_bpe").toString
    val words =
      Seq.fill(10)("hug") ++ Seq.fill(5)("pug") ++ Seq.fill(12)("pun") ++
        Seq.fill(4)("bun") ++ Seq.fill(5)("hugs")
    Seq((1L, words.mkString(" "), "en", "src0", 0L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.parquet(s"$dir/documents.parquet")
    val merges = SelectionOps.bpeTrain(spark, dir, 3)
    assert(merges == Seq(("u", "g"), ("u", "n"), ("h", "ug")))
    // applying the merges tokenizes the fixture words as expected
    assert(SelectionOps.bpeTokenize("hug", merges) == Vector("hug"))
    assert(SelectionOps.bpeTokenize("pun", merges) == Vector("p", "un"))
    assert(SelectionOps.bpeTokenize("hugs", merges) == Vector("hug", "s"))
  }

  test("q138 bpe encode matches an independent per-document tokenization") {
    val merges = SelectionOps.bpeTrain(spark, sf, 16)
    val docs = spark.read.parquet(s"$sf/documents.parquet")
      .select("source", "text").collect()
      .map(r => (r.getString(0), r.getString(1)))
    val want = docs.groupBy(_._1).view.mapValues { ds =>
      val words = ds.flatMap(_._2.split(" ", -1))
      (words.length.toLong, words.map(_.length.toLong).sum,
        words.map(w => SelectionOps.bpeTokenize(w, merges).length.toLong).sum)
    }.toMap
    val got = SelectionOps.bpeEncode(spark, sf).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getLong(3)))
      .toMap
    assert(got == want)
    // sanity: a BPE token is >= 1 char and each word is >= 1 token
    got.values.foreach { case (ws, chars, bpe) =>
      assert(bpe >= ws && bpe <= chars)
    }
  }

  test("vocab cap: headroom on shipped data, deterministic cut beyond it") {
    // (a) the cap is pure headroom on every shipped SF: the capped
    // collect equals the uncapped one bit-for-bit, so bounding the
    // driver-side collect (VERDICT r12 task 3) changed NO result
    val capped = SelectionOps.collectVocab(spark, sf)
    val uncapped = SelectionOps.collectVocab(spark, sf, Int.MaxValue)
    assert(capped.toSeq == uncapped.toSeq)
    assert(uncapped.length < SelectionOps.VocabCap / 100,
      s"fixture vocab ${uncapped.length} must sit far below the cap")
    // (b) beyond the cap the cut is the deterministic top-N by
    // (frequency desc, word asc) — the SentencePiece seed-vocab rule
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_vcap").toString
    val words = Seq.fill(9)("cc") ++ Seq.fill(9)("bb") ++
      Seq.fill(5)("aa") ++ Seq.fill(2)("zz") ++ Seq.fill(2)("yy")
    Seq((1L, words.mkString(" "), "en", "src0", 0L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.parquet(s"$dir/documents.parquet")
    val top3 = SelectionOps.collectVocab(spark, dir, 3)
    assert(top3.toSeq == Seq(("bb", 9L), ("cc", 9L), ("aa", 5L)))
  }

  test("bpeEncode beyond the cap: OOV words fall back to char-level, " +
      "whitespace/char counts stay complete") {
    // vocab: bb×9 cc×9 aa×5 zz×2 yy×2; cap 3 keeps {bb, cc, aa} — the
    // OOV words (zz, yy) must still count in ws_tokens/word_chars and
    // contribute length(word) BPE tokens (char-level fallback), never
    // vanish through the join (code-review r13)
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_oov").toString
    val words = Seq.fill(9)("bb") ++ Seq.fill(9)("cc") ++
      Seq.fill(5)("aa") ++ Seq.fill(2)("zz") ++ Seq.fill(2)("yy")
    Seq((1L, words.mkString(" "), "en", "src0", 0L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.parquet(s"$dir/documents.parquet")
    val r = SelectionOps.bpeEncodeCapped(spark, dir, 3).collect()
    assert(r.length == 1)
    val (ws, chars, bpe) = (r(0).getLong(1), r(0).getLong(2), r(0).getLong(3))
    assert(ws == 27L, "every word counts, OOV included")
    assert(chars == 54L)
    // in-vocab words merge to 1 token each (aa/bb/cc learn their merge);
    // the 4 OOV occurrences contribute 2 chars each
    assert(bpe == 23L + 8L)
  }

  test("bpeTrain on the corpus: monotone token counts, deterministic") {
    val m1 = SelectionOps.bpeTrain(spark, sf, 8)
    val m2 = SelectionOps.bpeTrain(spark, sf, 8)
    assert(m1 == m2, "merge sequence must be deterministic")
    assert(m1.length == 8)
    val vocabWords = spark.read.parquet(s"$sf/documents.parquet")
      .selectExpr("explode(split(text, ' ')) AS w").distinct()
      .collect().map(_.getString(0))
    vocabWords.foreach { w =>
      var prev = w.length
      (1 to m1.length).foreach { k =>
        val n = SelectionOps.bpeTokenize(w, m1.take(k)).length
        assert(n <= prev, s"token count must not increase for $w")
        prev = n
      }
    }
  }
}
