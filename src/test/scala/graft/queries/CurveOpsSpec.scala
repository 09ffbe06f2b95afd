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
