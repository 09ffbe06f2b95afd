package graft.queries

import graft.TestSpark
import org.scalatest.funsuite.AnyFunSuite

/** q274/q275/q276 — driver re-derivations. */
class StatsGridSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  private val sf = "/root/testdata/sf0.001"

  private def cents(v: Double): Long =
    java.math.BigDecimal.valueOf(v)
      .setScale(2, java.math.RoundingMode.HALF_UP)
      .movePointRight(2).longValueExact

  test("q274 dynamic pivot discovers all sources; counts conserve") {
    val docs = spark.read.parquet(s"$sf/documents.parquet")
      .select("lang", "source").collect()
      .map(r => (r.getString(0), r.getString(1)))
    val got = SqlSurface.dynamicPivot(spark, sf)
    val cols = got.columns
    assert(cols.head == "lang")
    assert(cols.tail.sorted.toSeq ==
      docs.map(_._2).distinct.sorted.toSeq)
    val rows = got.collect()
    val expect = docs.groupBy(identity).view.mapValues(_.length.toLong)
    rows.foreach { r =>
      cols.tail.zipWithIndex.foreach { case (src, i) =>
        assert(r.getLong(i + 1) ==
          expect.getOrElse((r.getString(0), src), 0L))
      }
    }
    assert(rows.flatMap(r => cols.indices.tail.map(r.getLong)).sum ==
      docs.length)
  }

  test("q275 heat map ≡ driver census; shares sum below 1e6") {
    val li = spark.read.parquet(s"$sf/lineitem.parquet")
      .select("l_extendedprice", "l_quantity").collect()
      .map(r => (cents(r.getDouble(0)) / 1000000,
        r.getDouble(1).toLong))
    val expect = li.groupBy(identity).view.mapValues(_.length.toLong)
      .toMap
    val got = StatsOps.histogram2d(spark, sf).collect()
    assert(got.length == expect.size)
    val total = li.length.toLong
    got.foreach { r =>
      val n = expect((r.getLong(0), r.getLong(1)))
      assert(r.getLong(2) == n)
      assert(r.getLong(3) == n * 1000000L / total)
    }
    assert(got.map(_.getLong(2)).sum == total)
  }

  test("q276 ≡ driver runs walk; no zero deltas on this data") {
    val daily = graft.Tables.events(spark, sf)
      .selectExpr("unix_micros(ts) div 86400000000 AS day", "value")
      .collect().map(r => (r.getLong(0), cents(r.getDouble(1))))
      .groupBy(_._1).view.mapValues(_.map(_._2).sum)
      .toSeq.sortBy(_._1).map(_._2)
    val deltas = daily.zip(daily.tail).map { case (a, b) => b - a }
    assert(deltas.forall(_ != 0), "zero delta would change semantics")
    val ups = deltas.map(_ > 0)
    val runs = 1L + ups.zip(ups.tail).count(p => p._1 != p._2)
    val r = StatsOps.runsTest(spark, sf).collect().head
    assert(r.getLong(0) == deltas.length)
    assert(r.getLong(1) == ups.count(identity))
    assert(r.getLong(2) == ups.count(!_))
    assert(r.getLong(3) == runs)
  }
}
