package graft.queries

import graft.TestSpark
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** q127/q128 invariants beyond the oracle rows: packing arithmetic
  * (capacity accounting, boundary-doc bounds, corpus partition) and the
  * two-phase prefix-sum mix matching the naive single-window
  * formulation — the equivalence that makes the scale shape safe to
  * ship. */
class PackingOpsSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  private val sf = "/root/testdata/sf0.001"

  test("q127 packing accounting: capacity, boundaries, corpus partition") {
    val rows = PackingOps.sequencePacking(spark, sf).collect()
    assert(rows.nonEmpty && rows.length <= 16)
    var docs = 0L
    rows.foreach { r =>
      val (nDocs, toks, nSeq, boundary) =
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))
      assert(nSeq == (toks + 511) / 512, "n_sequences must be ceil(tokens/cap)")
      // a doc can cross a boundary only where one exists: ≤ nSeq−1 cuts,
      // and never more docs than the shard holds
      assert(boundary <= math.min(nSeq - 1, nDocs))
      docs += nDocs
    }
    val total = graft.Tables.documents(spark, sf).count()
    assert(docs == total, "shards must partition the corpus")
  }

  test("q128 two-phase prefix sum ≡ naive per-source window") {
    val got = PackingOps.tokenBudgetMix(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).sortBy(_._1)
    val want = PackingOps.tokenBudgetMixNaive(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).sortBy(_._1)
    assert(got === want)
    assert(got.nonEmpty)
  }

  test("q128 survives a corpus with fully duplicated rows (ROWS frame)") {
    // regression guard for the RANGE-frame trap: duplicate (pri, doc_id)
    // peer groups must each get their own prefix, not the group sum —
    // with the default RANGE frame, 3 of 20 sources vanished on a
    // replicated corpus because the first peer group collectively
    // overran the budget
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_dup").toString
    val docs = graft.Tables.documents(spark, sf)
    docs.unionByName(docs).unionByName(docs)
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val got = PackingOps.tokenBudgetMix(spark, dir).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).sortBy(_._1)
    val want = PackingOps.tokenBudgetMixNaive(spark, dir).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).sortBy(_._1)
    assert(got === want)
    val sources = docs.select("source").distinct().count()
    assert(got.length == sources,
      "every source must still admit at least its first doc")
  }

  test("q128 admits past the budget line by at most one doc") {
    // admitted_tokens ≥ budget requires the straddle doc to be counted;
    // admitted_tokens − longest-doc < budget bounds the overshoot
    val maxToks = graft.Tables.documents(spark, sf)
      .select(max(size(split(col("text"), " ")).cast("long"))).head.getLong(0)
    PackingOps.tokenBudgetMix(spark, sf).collect().foreach { r =>
      val toks = r.getLong(2)
      assert(toks >= 600L, s"${r.getString(0)}: budget must be filled " +
        "(every source has > budget tokens at sf0.001)")
      assert(toks - maxToks < 600L, s"${r.getString(0)}: overshoot > one doc")
    }
  }

  test("q215 water-fill: quotas sum EXACTLY to the budget; level maximal") {
    val rows = PackingOps.waterFill(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getBoolean(3)))
    val total = rows.map(_._2).sum
    val budget = total * 500 / 1000
    assert(rows.map(_._3).sum == budget)
    rows.foreach { case (src, tok, quota, capped) =>
      if (capped) assert(quota < tok)
      else assert(quota == tok, s"$src uncapped must keep all tokens")
    }
    // the level is maximal: raising every capped quota by one overshoots
    val cappedN = rows.count(_._4)
    assert(cappedN > 0)
    assert(rows.map(_._3).sum + cappedN > budget)
    // quotas of capped sources differ by at most 1 (c or c+1)
    val capQ = rows.filter(_._4).map(_._3)
    assert(capQ.max - capQ.min <= 1)
  }
}
