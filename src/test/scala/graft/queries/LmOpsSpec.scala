package graft.queries

import graft.TestSpark
import org.scalatest.funsuite.AnyFunSuite

/** q140 invariants beyond the oracle rows.
  *
  * The whole CCNet-style pipeline (bigram LM on the `en` slice →
  * integer fixed-point scores → histogram tertiles → buckets) is
  * re-derived independently in plain Scala from the raw parquet and
  * must agree EXACTLY (the SelectionOpsSpec posture). Plus the
  * semantic contracts CCNet relies on: the bucket is a pure function
  * of the score (no ntile tie-splitting), bucket populations are
  * tertile-shaped, and on a controlled fixture a fluent document
  * outscores a gibberish one (which lands in the tail).
  */
class LmOpsSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  private val sf = "/root/testdata/sf0.001"

  private def derive(docs: Seq[(Long, String, String)])
      : Map[Long, (String, Long, Long, String)] = {
    val bigrams = docs.flatMap { case (id, lang, text) =>
      val ws = text.split(" ", -1)
      (0 until ws.length - 1).map(j => (id, lang, ws(j), ws(j + 1)))
    }
    val train = bigrams.filter(_._2 == "en")
    val cvw = train.groupBy(t => (t._3, t._4)).view.mapValues(_.size.toLong).toMap
    val cv = train.groupBy(_._3).view.mapValues(_.size.toLong).toMap
    val vsz = (train.map(_._3) ++ train.map(_._4)).distinct.size.toLong
    val scored = bigrams.groupBy(t => (t._1, t._2)).map { case ((id, lang), bs) =>
      val sum = bs.map { case (_, _, v, w) =>
        ((cvw.getOrElse((v, w), 0L) + 1L) * 1000000L) / (cv.getOrElse(v, 0L) + vsz)
      }.sum
      (id, lang, bs.size.toLong, sum / bs.size)
    }.toSeq
    val n = scored.size.toLong
    val hist = scored.groupBy(_._4).view.mapValues(_.size.toLong).toSeq.sortBy(_._1)
    val cum = hist.scanLeft((0L, 0L)) { case ((_, c), (s, k)) => (s, c + k) }.drop(1)
    val tLo = cum.find(_._2 >= n / 3).get._1
    val tHi = cum.find(_._2 >= 2 * n / 3).get._1
    scored.map { case (id, lang, nb, sc) =>
      val b = if (sc >= tHi) "head" else if (sc >= tLo) "middle" else "tail"
      id -> (lang, nb, sc, b)
    }.toMap
  }

  test("q140 matches an independent driver-side re-derivation") {
    val docs = spark.read.parquet(s"$sf/documents.parquet")
      .select("doc_id", "lang", "text").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2))).toSeq
    val want = derive(docs)
    val got = LmOps.lmPerplexityBuckets(spark, sf).collect()
      .map(r => r.getLong(0) ->
        (r.getString(1), r.getLong(2), r.getLong(3), r.getString(4))).toMap
    assert(got == want)
  }

  test("q140 buckets are tertile-shaped and score-pure") {
    val rows = LmOps.lmPerplexityBuckets(spark, sf).collect()
      .map(r => (r.getLong(3), r.getString(4)))
    val n = rows.length.toLong
    // same score ⇒ same bucket (membership is a pure function of score)
    rows.groupBy(_._1).foreach { case (_, bs) =>
      assert(bs.map(_._2).distinct.length == 1)
    }
    // every head score > every middle score > every tail score
    val byBucket = rows.groupBy(_._2).view.mapValues(_.map(_._1)).toMap
    assert(byBucket.keySet == Set("head", "middle", "tail"))
    assert(byBucket("head").min > byBucket("middle").max)
    assert(byBucket("middle").min > byBucket("tail").max)
    // tertile-shaped: by construction the lowest bucket holds < n/3 of
    // the corpus plus whatever ties onto the threshold; with this
    // corpus's near-unique scores each bucket is within ±2 of n/3
    Seq("head", "middle", "tail").foreach { b =>
      assert(math.abs(byBucket(b).length - n / 3) <= 2,
        s"$b holds ${byBucket(b).length} of $n")
    }
  }

  test("q143 classifier reaches >=0.95 accuracy on its own train slice") {
    // the weak labels ARE thresholded score_ppm, so feature f5 alone
    // separates head from tail — a sanity floor any working learner
    // must clear on the real corpus
    val feats = LmOps.docFeatures(spark, sf).localCheckpoint()
    val w = LmOps.qualityLrTrain(feats)
    val rows = feats.filter(org.apache.spark.sql.functions.col("bucket") =!= "middle")
      .withColumn("p", org.apache.spark.sql.functions.expr(LmOps.scoreExpr(w)))
      .select("bucket", "p").collect()
    val correct = rows.count { r =>
      (r.getString(0) == "head") == (r.getDouble(1) >= 0.5) }
    assert(rows.nonEmpty && correct.toDouble / rows.length >= 0.95,
      s"train accuracy ${correct.toDouble / rows.length}")
  }

  test("q143 fixture: a quality gradient keeps clean sources, drops garbage") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_lr").toString
    // four 20-doc classes on a quality gradient; every doc is 'en' so
    // the LM trains on the whole fixture. Deterministic token soup for
    // the low classes (no RNG — doc-indexed synthetic tokens).
    def junk(doc: Int, n: Int, tag: String) =
      (1 to n).map(j => s"$tag${doc}x$j").mkString(" ")
    val clean = (0 until 20).map { i =>
      (i.toLong, "the quick brown fox jumps over the lazy dog and " +
        s"the a the a cat ${i} sat on the mat", "clean") }
    val semi = (0 until 20).map { i =>
      (100L + i, "the quick brown fox " + junk(i, 8, "s"), "semi") }
    val low = (0 until 20).map { i =>
      (200L + i, "the " + junk(i, 12, "l"), "low") }
    val garbage = (0 until 20).map { i =>
      (300L + i, junk(i, 14, "g"), "garbage") }
    (clean ++ semi ++ low ++ garbage)
      .map { case (id, t, src) => (id, t, "en", src, t.length.toLong) }
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.parquet(s"$dir/documents.parquet")
    val got = LmOps.qualityClassifierKeep(spark, dir).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(got("clean")._1 == 20L && got("clean")._2 == 20L,
      s"clean source fully kept: $got")
    assert(got("garbage")._1 == 20L && got("garbage")._2 == 0L,
      s"garbage source fully dropped: $got")
  }

  test("q140 fixture: fluent text heads, gibberish tails") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_lm").toString
    val fluent = "the quick brown fox jumps over the lazy dog"
    // 6 training docs establish the LM; the gibberish doc shares no
    // bigram (or even unigram) with them
    val docs = (0L to 5L).map(i => (i, fluent, "en", "src0", 44L)) ++ Seq(
      (6L, fluent, "es", "src1", 44L),
      (7L, "zzq xkw vvj qqp wwm zzr", "es", "src1", 23L))
    docs.toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.parquet(s"$dir/documents.parquet")
    val got = LmOps.lmPerplexityBuckets(spark, dir).collect()
      .map(r => r.getLong(0) -> (r.getLong(3), r.getString(4))).toMap
    assert(got(6L)._1 > got(7L)._1, "fluent must outscore gibberish")
    assert(got(7L)._2 == "tail", "gibberish lands in the tail")
    assert(got(6L)._2 == "head", "an LM-fluent doc lands in the head")
    // the re-derivation harness agrees on the fixture too
    val want = derive(docs.map(d => (d._1, d._3, d._2)))
    val all = LmOps.lmPerplexityBuckets(spark, dir).collect()
      .map(r => r.getLong(0) ->
        (r.getString(1), r.getLong(2), r.getLong(3), r.getString(4))).toMap
    assert(all == want)
  }
}
