package graft.queries

import graft.TestSpark
import org.scalatest.funsuite.AnyFunSuite

/** q295/q296/q297 — monotone-curve laws + driver re-derivations. */
class CurveOpsSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  private val sf = "/root/testdata/sf0.001"

  test("q295: curve is monotone; rows consistent; non-vacuous") {
    val rows = CurveOps.dedupCurve(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4))).sortBy(_._1)
    assert(rows.length == 3)
    // tightening the threshold can only drop edges and docs
    rows.sliding(2).foreach {
      case Array(a, b) =>
        assert(b._2 <= a._2 && b._3 <= a._3)
      case _ =>
    }
    rows.foreach { r =>
      assert(r._5 == r._3 - r._4)      // removed = docs - clusters
      assert(r._4 <= r._3)             // clusters <= docs
      if (r._3 > 0) assert(r._2 > 0)   // docs only via edges
    }
    assert(rows.head._2 > 0, "loosest threshold must keep edges")
  }

  test("q298 ≡ driver minhash/Jaccard calibration") {
    val base = graft.functions.GramHash.Base
    val p = graft.functions.GramHash.P
    def poly(s0: String): Long =
      s0.foldLeft(0L)((h, c) => (h * base + (c.toInt % 256)) % p)
    val docs = spark.read.parquet(s"$sf/documents.parquet")
      .select("doc_id", "text").collect()
      .map(r => (r.getLong(0), r.getString(1).split(" ", -1).toSet))
      .filter(_._1 < 100)
    val sig = docs.map { case (id, ws) =>
      id -> (1 to 4).map(k => ws.map(w => poly(s"s$k: $w")).min)
    }.toMap
    val pairs = for {
      (a, wa) <- docs; (b, wb) <- docs if a < b
    } yield {
      val inter = wa.intersect(wb).size.toLong
      val jac = if (inter == 0) 0L
        else inter * 1000 / (wa.size + wb.size - inter)
      val matches = sig(a).zip(sig(b)).count(x => x._1 == x._2).toLong
      (matches, jac)
    }
    val expect = pairs.groupBy(_._1).view.mapValues { vs =>
      val js = vs.map(_._2)
      (js.size.toLong, js.sum / js.size, js.min, js.max)
    }.toMap
    val got = CurveOps.minhashCalibration(spark, sf).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4)))).toMap
    assert(got == expect)
    assert(got.values.map(_._1).sum ==
      docs.length.toLong * (docs.length - 1) / 2)
  }

  test("q306 ≡ driver sampled-leaderboard overlap") {
    val base = graft.functions.GramHash.Base
    val p = graft.functions.GramHash.P
    def poly(s0: String): Long =
      s0.foldLeft(0L)((h, c) => (h * base + (c.toInt % 256)) % p)
    def cents(v: Double): Long =
      java.math.BigDecimal.valueOf(v)
        .setScale(2, java.math.RoundingMode.HALF_UP)
        .movePointRight(2).longValueExact
    val li = spark.read.parquet(s"$sf/lineitem.parquet")
      .select("l_orderkey", "l_linenumber", "l_partkey",
        "l_extendedprice").collect()
      .map(r => (poly(s"smp: ${r.getLong(0)}:${r.getInt(1)}"),
        r.getLong(2), cents(r.getDouble(3))))
    def top(rows: Seq[(Long, Long)], k: Int): Set[Long] =
      rows.groupBy(_._1).view.mapValues(_.map(_._2).sum).toSeq
        .sortBy { case (pk, v) => (-v, pk) }.take(k).map(_._1).toSet
    val full = li.map(x => (x._2, x._3)).toSeq
    val samp = li.filter(_._1 % 2 == 0).map(x => (x._2, x._3)).toSeq
    val got = CurveOps.topkStability(spark, sf).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    Seq(10, 50, 100).foreach { k =>
      val ov = top(full, k).intersect(top(samp, k)).size.toLong
      assert(got(k.toLong) == ((ov, ov * 1000 / (2 * k - ov))), s"k=$k")
    }
    assert(got.values.forall(_._1 > 0), "sampling keeps some overlap")
  }

  test("q307: rank churn consistent; one rank-1 per year implied") {
    val rows = CurveOps.rankChurn(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getInt(2), r.getInt(3),
        r.getLong(4)))
    assert(rows.length == 25)
    rows.foreach { r =>
      assert(r._3 <= r._4)
      assert(r._5 >= 0 && r._5 <= (r._2 - 1) * 24) // |Δrank| ≤ n−1 per step
    }
    assert(rows.exists(_._3 == 1), "someone held rank 1")
    assert(rows.exists(_._5 > 0), "standings actually moved")
  }

  test("q296 ≡ driver quintile matrix; counts conserve") {
    val docs = spark.read.parquet(s"$sf/documents.parquet")
      .select("doc_id", "source", "text").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2)))
    val perDoc = docs.map { case (_, src, text) =>
      val ws = text.split(" ", -1)
      (src, ws.distinct.length.toLong * 1000000L / ws.length)
    }
    val n = perDoc.length
    val sorted = perDoc.map(_._2).sorted
    val below = sorted.distinct.map(v =>
      v -> sorted.count(_ < v).toLong).toMap
    def quintile(v: Long) = below(v) * 5 / n + 1
    val expect = perDoc.groupBy(p => (p._1, quintile(p._2))).view
      .mapValues(_.length.toLong).toMap
    val got = CurveOps.qualityQuintiles(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(got == expect)
    assert(got.values.sum == n.toLong)
  }

  test("q297 ≡ driver ceil-div waste; waste shrinks with shorter L") {
    val toks = spark.read.parquet(s"$sf/documents.parquet")
      .select("text").collect()
      .map(_.getString(0).split(" ", -1).length.toLong)
    val got = CurveOps.paddingWaste(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5))).sortBy(_._1)
    got.foreach { case (l, nd, tt, slots, pad, ppm) =>
      assert(nd == toks.length)
      assert(tt == toks.sum)
      assert(slots == toks.map(t => (t + l - 1) / l).sum)
      assert(pad == slots * l - tt)
      assert(ppm == pad * 1000000L / (slots * l))
    }
    // shorter contexts waste less padding on this doc-length mix
    assert(got.map(_._6).toSeq == got.map(_._6).sorted.toSeq)
  }
}
