package graft.queries

import graft.TestSpark
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** RankingOps invariants beyond the DuckDB hash gate (q112/q113/q115):
  * properties that must hold on ANY corpus, checked at sf0.001 so a
  * future testdata regeneration can't silently satisfy a stale hash. */
class RankingOpsSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  val d = "/root/testdata/sf0.001"

  test("tfidf: ranks are 1..3 per doc, scores non-increasing in rank") {
    val rows = RankingOps.tfidfTopTerms(spark, d)
      .select("doc_id", "rnk", "score").collect()
    val byDoc = rows.groupBy(_.getLong(0))
    byDoc.foreach { case (doc, rs) =>
      val sorted = rs.sortBy(_.getInt(1))
      assert(sorted.map(_.getInt(1)).toSeq == (1 to sorted.length),
        s"doc $doc ranks not contiguous from 1")
      assert(sorted.length <= 3)
      val scores = sorted.map(_.getDouble(2))
      assert(scores.zip(scores.tail).forall { case (a, b) => a >= b },
        s"doc $doc scores increase along rank")
    }
  }

  test("tfidf: score equals tf * N / df recomputed from raw counts") {
    val n = graft.Tables.documents(spark, d).count()
    val bad = RankingOps.tfidfTopTerms(spark, d)
      .filter(col("score") =!= col("tf").cast("double") * n / col("df"))
      .count()
    assert(bad == 0)
  }

  test("dup-ngram stats: dup <= total, fraction consistent, all docs counted") {
    val rows = RankingOps.dupNgramStats(spark, d).collect()
    val docs = rows.map(r => r.getLong(r.fieldIndex("docs"))).sum
    // every sf0.001 doc has >= 10 tokens, so none drop out of the gram pass
    assert(docs == graft.Tables.documents(spark, d).count())
    rows.foreach { r =>
      val tot = r.getLong(r.fieldIndex("total_grams"))
      val dup = r.getLong(r.fieldIndex("dup_grams"))
      val frac = r.getDouble(r.fieldIndex("dup_fraction"))
      assert(dup >= 0 && dup <= tot)
      assert(frac == dup.toDouble / tot)
      assert(r.getLong(r.fieldIndex("docs_over_half")) <= r.getLong(r.fieldIndex("docs")))
    }
  }

  test("train/val split: partitions the corpus, deterministic, ~25% val") {
    val out = RankingOps.trainValSplit(spark, d).collect()
    val total = out.map(r => r.getLong(r.fieldIndex("docs"))).sum
    assert(total == graft.Tables.documents(spark, d).count())
    val valDocs = out.filter(_.getString(0) == "val")
      .map(r => r.getLong(r.fieldIndex("docs"))).sum
    // binomial(500, 0.25): mean 125, sd ~9.7 — accept mean +- 5 sd
    assert(valDocs > 75 && valDocs < 175, s"val fraction off: $valDocs/$total")
    // re-running yields the identical assignment (hash of stable id)
    val again = RankingOps.trainValSplit(spark, d).collect()
    assert(out.map(_.toString).sorted.toSeq == again.map(_.toString).sorted.toSeq)
  }

  test("span dedup: keep-first on a known fixture; exact dup collapses") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_span").toString
    val eight = (1 to 8).map(i => s"w$i").mkString(" ") // one shared 8-gram
    val fixture = Seq(
      // doc 1: the first occurrence of every one of its grams → intact
      (1L, s"alpha $eight beta", "en", "src0", 0L),
      // doc 2: exact duplicate of doc 1 → collapses to nothing
      (2L, s"alpha $eight beta", "en", "src0", 0L),
      // doc 3: shares ONLY the 8-gram (its own grams containing gamma/
      // delta are unique) → loses exactly the 8 tokens of that span
      (3L, s"gamma $eight delta", "en", "src1", 0L),
      // doc 4: too short for any 8-gram → untouched
      (4L, "tiny doc", "en", "src1", 0L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    fixture.write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val got = RankingOps.spanDedup(spark, dir).collect()
      .map(r => r.getLong(0) -> ((r.getLong(3), r.getLong(4), r.getString(5))))
      .toMap
    assert(got(1L) == ((10L, 0L, s"alpha $eight beta")), "first copy intact")
    assert(got(2L) == ((10L, 10L, "")), "exact dup fully removed")
    assert(got(3L) == ((10L, 8L, "gamma delta")), "only the shared span removed")
    assert(got(4L) == ((2L, 0L, "tiny doc")), "short doc untouched")
  }

  test("q212 ≡ driver dyadic bucket census; buckets partition the vocab") {
    val freq = spark.read.parquet(s"$d/documents.parquet")
      .selectExpr("explode(split(text, ' ')) AS word").collect()
      .map(_.getString(0)).groupBy(identity).view.mapValues(_.length).toMap
    val byBucket = freq.values.groupBy(f =>
      63 - java.lang.Long.numberOfLeadingZeros(f.toLong))
    val rows = RankingOps.zipfDyadic(spark, d).collect()
    assert(rows.map(_.getLong(2)).sum == freq.size)
    assert(rows.map(_.getLong(3)).sum == freq.values.map(_.toLong).sum)
    rows.foreach { r =>
      val b = r.getLong(0).toInt
      assert(r.getLong(1) == (1L << b))
      assert(r.getLong(2) == byBucket(b).size.toLong)
      assert(r.getLong(3) == byBucket(b).map(_.toLong).sum)
    }
  }
}
