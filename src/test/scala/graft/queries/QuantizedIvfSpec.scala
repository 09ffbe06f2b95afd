package graft.queries

import graft.TestSpark
import org.scalatest.funsuite.AnyFunSuite

/** q131 beyond the oracle row: an INDEPENDENT driver-side
  * reimplementation of the whole quantized-IVF pipeline (collect the
  * vectors, quantize, assign cells, rank cells for the query, scan
  * nprobe cells, rank by the quantized dot) must agree exactly — every
  * arithmetic step is a deterministic double chain in both places — and
  * the recall curve must be monotone in nprobe with the nprobe=K
  * endpoint scanning everything (the property family MultiProbeSpec
  * pins for the float IVF). */
class QuantizedIvfSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  private val sf = "/root/testdata/sf0.01"

  private case class V(id: Long, emb: Array[Double])

  private def load(): Array[V] =
    graft.Tables.embeddings(spark, sf)
      .select("vec_id", "embedding").collect()
      .map(r => V(r.getLong(0), r.getSeq[Float](1).map(_.toDouble).toArray))
      .sortBy(_.id)

  private def dot(a: Array[Double], b: Array[Double]): Double = {
    var s = 0.0; var i = 0
    while (i < a.length) { s += a(i) * b(i); i += 1 }
    s
  }

  /** (scanned, hits) per nprobe, recomputed from first principles. */
  private def model(vs: Array[V], probes: Seq[Int]): Map[Int, (Long, Long)] = {
    val cents = SimHashIvf.Centroids
    def quant(v: Array[Double]): (Array[Double], Double) = {
      val ma = math.max(v.map(math.abs).max, 1e-12)
      (v.map(x => math.floor(x * 127.0 / ma + 0.5)), ma / 127.0)
    }
    def cellOf(v: Array[Double]): Int = {
      val ds = cents.map(c => dot(v, c))
      val mx = ds.max
      ds.indexWhere(_ == mx) // lowest index on ties, like the when-chain
    }
    val q = vs.find(_.id == 0).get
    val (qq, qs) = quant(q.emb)
    val data = vs.filter(_.id != 0).map { v =>
      val (qv, s) = quant(v.emb)
      (v.id, cellOf(v.emb), dot(qv, qq) * s * qs, dot(v.emb, q.emb))
    }
    val exact10 = data.sortBy(t => (-t._4, t._1)).take(10).map(_._1).toSet
    val qds = cents.map(c => dot(q.emb, c))
    val rankOfCell = (0 until cents.length)
      .sortBy(c => (-qds(c), c)).zipWithIndex
      .map { case (c, i) => c -> (i + 1) }.toMap
    probes.map { np =>
      val cand = data.filter(t => rankOfCell(t._2) <= np)
      val top10 = cand.sortBy(t => (-t._3, t._1)).take(10).map(_._1).toSet
      np -> (cand.length.toLong, (top10 & exact10).size.toLong)
    }.toMap
  }

  test("q131 agrees exactly with the driver-side model at {1,2,4,8}") {
    val vs = load()
    val probes = Seq(1, 2, 4, 8)
    val want = model(vs, probes)
    val got = SimHashIvf.quantizedIvfRecall(spark, sf, probes).collect()
      .map(r => r.getInt(0) -> (r.getLong(1), r.getLong(2), r.getDouble(3)))
      .toMap
    assert(got.keySet == probes.toSet)
    probes.foreach { np =>
      val (ws, wh) = want(np)
      val (gs, gh, gr) = got(np)
      assert(gs == ws, s"nprobe=$np scanned")
      assert(gh == wh, s"nprobe=$np hits")
      assert(gr == wh / 10.0, s"nprobe=$np recall")
    }
  }

  test("recall is monotone in nprobe; nprobe=K scans everything") {
    val vs = load()
    val got = SimHashIvf.quantizedIvfRecall(spark, sf, Seq(1, 2, 4, 8))
      .collect().map(r => r.getInt(0) -> (r.getLong(1), r.getDouble(3)))
      .toMap
    val recalls = Seq(1, 2, 4, 8).map(got(_)._2)
    assert(recalls.zip(recalls.tail).forall { case (a, b) => a <= b },
      s"recall not monotone: $recalls")
    assert(got(8)._1 == vs.length - 1, "nprobe=K must scan every vector")
    assert(got(8)._2 >= 0.7,
      "full-scan quantized recall should recover most of the exact top-10")
  }
}
