package graft.queries

import graft.TestSpark
import org.scalatest.funsuite.AnyFunSuite

/** q191/q192 contracts beyond the oracle: full driver-side KMV
  * re-derivation from first principles (own gram builder, own hash),
  * the theoretical error band, and sketch-algebra sanity.
  */
class SketchOpsSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  private val sf = "/root/testdata/sf0.001"
  private val K = 64
  private val P = 36028797018963913L

  private def poly(g: String): Long =
    g.codePoints().toArray.foldLeft(0L)((h, c) => (h * 131 + c % 256) % P)

  /** Distinct 4-gram hashes per source, rebuilt from the raw text. */
  private lazy val bySource: Map[String, Set[Long]] =
    spark.read.parquet(s"$sf/documents.parquet")
      .select("source", "text").collect()
      .groupBy(_.getString(0)).view.mapValues { rows =>
        rows.toSeq.flatMap { r =>
          val ts = r.getString(1).split(" ", -1)
          ts.sliding(4).filter(_.length == 4).map(g => poly(g.mkString(" ")))
        }.toSet
      }.toMap

  private def est(nd: Long, hk: Long): Long =
    if (nd < K) nd else (K - 1).toLong * P / hk

  test("q191 ≡ first-principles KMV; error inside the 3σ band") {
    val got = SketchOps.kmvSketch(spark, sf).collect()
      .map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))).toMap
    assert(got.keySet == bySource.keySet)
    bySource.foreach { case (src, hs) =>
      val nd = hs.size.toLong
      val hk = hs.toSeq.sorted.take(K).last
      val e = est(nd, hk)
      assert(got(src) == ((nd, hk, e, (e - nd).abs * 1000000 / nd)), src)
      assert(nd > K, "estimator branch must actually exercise")
      // rse of KMV is 1/sqrt(K-2); allow 3σ
      assert((e - nd).abs.toDouble / nd < 3.0 / math.sqrt(K - 2.0), src)
    }
  }

  test("q195 ≡ first-principles PPS; global HT estimate near the truth") {
    val docs = spark.read.parquet(s"$sf/documents.parquet")
      .select("doc_id", "source", "n_chars").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    val totW = docs.map(_._3).sum
    val H = 2147483647L
    val expected = docs.groupBy(_._2).view.mapValues { ds =>
      val rows = ds.map { case (id, _, w) =>
        val h = poly(s"$id:pps") % H
        val p = math.min(H, 100L * w * H / totW)
        (w, h < p, if (h < p) w * H / p else 0L)
      }
      val (tw, kd, ht) =
        (rows.map(_._1).sum, rows.count(_._2).toLong, rows.map(_._3).sum)
      (ds.length.toLong, tw, kd, ht, (ht - tw).abs * 1000000 / tw)
    }.toMap
    val got = SketchOps.ppsSample(spark, sf).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getLong(5)))).toMap
    assert(got == expected)
    // the summed per-source HT estimates ARE the global HT estimator
    val (ht, truth) =
      (got.values.map(_._4).sum.toDouble, got.values.map(_._2).sum.toDouble)
    assert(got.values.map(_._3).sum > 10, "sample must be non-trivial")
    assert(math.abs(ht - truth) / truth < 0.3,
      s"global HT $ht vs $truth drifts beyond the sampling band")
  }

  test("q192 ≡ sketch-only merge re-derivation; estimates are coherent") {
    val sketches = bySource.view.mapValues(_.toSeq.sorted.take(K)).toMap
    val got = SketchOps.kmvSetOps(spark, sf).collect()
      .map(r => (r.getString(0), r.getString(1)) ->
        ((r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5)))).toMap
    val pairs = for {
      a <- sketches.keys; b <- sketches.keys if a < b
    } yield (a, b)
    assert(got.keySet == pairs.toSet)
    pairs.foreach { case (a, b) =>
      val (ska, skb) = (sketches(a), sketches(b))
      val u = (ska ++ skb).distinct.sorted
      val m = u.take(K)
      val rho = m.count(h => ska.contains(h) && skb.contains(h)).toLong
      val uEst = if (u.size < K) u.size.toLong else (K - 1).toLong * P / m.last
      val iEst =
        if (u.size < K) ska.toSet.intersect(skb.toSet).size.toLong
        else rho * uEst / K
      val jEst =
        if (u.size < K)
          ska.toSet.intersect(skb.toSet).size.toLong * 1000000 / u.size
        else rho * 1000000 / K
      assert(got((a, b)) == ((rho, uEst, iEst, jEst)), s"$a/$b")
      // algebraic coherence
      assert(iEst <= uEst && jEst <= 1000000)
      // union estimate also sits in the 3σ band vs the true union
      val trueU = bySource(a).union(bySource(b)).size.toLong
      assert((uEst - trueU).abs.toDouble / trueU < 3.0 / math.sqrt(K - 2.0))
    }
  }

  test("q202 ≡ first-principles priority sample; estimate near the truth") {
    val H = 2147483647L
    val docs = spark.read.parquet(s"$sf/documents.parquet")
      .select("doc_id", "n_chars").collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val pri = docs.map { case (id, w) =>
      (id, w, w * H / (poly(s"$id:pri") % H + 1))
    }.sortBy { case (id, _, p) => (-p, id) }
    val top = pri.take(64)
    val tau = pri(64)._3
    val est = top.map { case (_, w, _) => math.max(w, tau) }.sum
    val truth = docs.map(_._2).sum
    val r = graft.queries.SketchOps.prioritySample(spark, sf)
      .collect().head
    assert(r.getLong(0) == 64L)
    assert(r.getLong(1) == tau)
    assert(r.getLong(2) == est)
    assert(r.getLong(3) == truth)
    assert(r.getLong(4) == math.abs(est - truth) * 1000000L / truth)
    // k=64 priority sampling: relative error well inside 50%
    assert(r.getLong(4) < 500000L)
  }
}
