package graft.queries

import graft.TestSpark
import org.scalatest.funsuite.AnyFunSuite

/** q280 — marginals re-derived: span side from the (oracle-verified)
  * q152 output, gram side from a driver reimplementation of the
  * polynomial gram hash. */
class ContaminationCompareSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  private val sf = "/root/testdata/sf0.001"

  private def gramHashes(text: String): Set[Long] = {
    val base = graft.functions.GramHash.Base
    val p = graft.functions.GramHash.P
    val words = text.split(" ", -1)
    (0 to words.length - 8).map { i =>
      val g = words.slice(i, i + 8).mkString(" ")
      g.foldLeft(0L)((h, c) => (h * base + (c.toInt % 256)) % p)
    }.toSet
  }

  test("q280 cells partition the universe; both marginals re-derive") {
    val docs = spark.read.parquet(s"$sf/documents.parquet")
      .select("doc_id", "text").collect()
      .map(r => (r.getLong(0), r.getString(1)))
      .filter(_._1 < 100)
    val bench = docs.filter(_._1 % 10 == 0)
    val train = docs.filter(_._1 % 10 != 0)
    val benchGrams = bench.flatMap(d => gramHashes(d._2)).toSet
    val gramDocs = train.filter(d =>
      gramHashes(d._2).exists(benchGrams.contains)).map(_._1).toSet
    val spanDocs = SuffixOps.contaminationSpan(spark, sf).collect()
      .map(_.getLong(0)).toSet
    val cells = SuffixOps.contaminationCompare(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1)) ->
        ((r.getLong(2), r.getLong(3)))).toMap
    assert(cells.values.map(_._1).sum == train.length)
    // marginals
    def marg(f: ((Long, Long)) => Boolean) =
      cells.filter(c => f(c._1)).values.map(_._1).sum
    assert(marg(_._1 == 1L) == gramDocs.size)
    assert(marg(_._2 == 1L) == spanDocs.size)
    // exact cell re-derivation
    val expect = train.map(_._1).groupBy(id =>
      (if (gramDocs(id)) 1L else 0L, if (spanDocs(id)) 1L else 0L))
      .view.mapValues(ids => (ids.length.toLong, ids.min)).toMap
    assert(cells == expect)
    assert(spanDocs.nonEmpty, "span side must fire (q152 non-empty)")
  }
}
