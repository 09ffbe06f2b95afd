package graft.queries

import graft.TestSpark
import org.scalatest.funsuite.AnyFunSuite

/** q289/q290 — driver re-derivations; growth curves monotone. */
class VocabGrowthSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  private val sf = "/root/testdata/sf0.001"

  private def cents(v: Double): Long =
    java.math.BigDecimal.valueOf(v)
      .setScale(2, java.math.RoundingMode.HALF_UP)
      .movePointRight(2).longValueExact

  test("q289 ≡ driver discount-band means") {
    val li = spark.read.parquet(s"$sf/lineitem.parquet")
      .select("l_discount", "l_quantity", "l_extendedprice").collect()
      .map(r => (cents(r.getDouble(0)), r.getDouble(1).toLong,
        cents(r.getDouble(2))))
    val expect = li.groupBy(_._1).view.mapValues { vs =>
      (vs.length.toLong, vs.map(_._2).sum * 1000 / vs.length,
        vs.map(_._3).sum / vs.length)
    }.toMap
    val got = RevenueOps.discountResponse(spark, sf).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2),
        r.getLong(3)))).toMap
    assert(got == expect)
    assert(got.keySet == (0L to 10L).toSet)
  }

  test("q290 ≡ driver first-occurrence curves; monotone; bigrams grow") {
    val docs = spark.read.parquet(s"$sf/documents.parquet")
      .select("doc_id", "text").collect()
      .map(r => (r.getLong(0), r.getString(1).split(" ", -1)))
    val uniFirst = docs.flatMap { case (id, ws) => ws.map(_ -> id) }
      .groupBy(_._1).view.mapValues(_.map(_._2).min).toMap
    val biFirst = docs.flatMap { case (id, ws) =>
      ws.zip(ws.tail).map { case (a, b) => s"$a $b" -> id }
    }.groupBy(_._1).view.mapValues(_.map(_._2).min).toMap
    val steps = Seq(10L, 20L, 50L, 100L, 200L, 500L, 1000L, 2000L,
      5000L, 10000L)
    val got = CorpusAuditOps.vocabGrowth(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).sortBy(_._1)
    assert(got.map(_._1).toSeq == steps)
    got.foreach { case (n, u, b) =>
      assert(u == uniFirst.values.count(_ < n).toLong)
      assert(b == biFirst.values.count(_ < n).toLong)
    }
    assert(got.map(_._2).toSeq == got.map(_._2).sorted.toSeq)
    assert(got.map(_._3).toSeq == got.map(_._3).sorted.toSeq)
    assert(got.last._3 > got.head._3, "bigram vocab must actually grow")
  }
}
