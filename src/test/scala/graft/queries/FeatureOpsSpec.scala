package graft.queries

import graft.TestSpark
import org.scalatest.funsuite.AnyFunSuite

/** q224/q225 partition identities + first-principles hash agreement. */
class FeatureOpsSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  private val sf = "/root/testdata/sf0.001"
  private val P = 36028797018963913L

  private def poly(g: String): Long =
    g.codePoints().toArray.foldLeft(0L)((h, c) => (h * 131 + c % 256) % P)

  test("q224 folds partition the corpus; assignment ≡ driver hash") {
    val docs = spark.read.parquet(s"$sf/documents.parquet")
      .selectExpr("doc_id", "CAST(size(split(text, ' ')) AS BIGINT)")
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val exp = docs.groupBy(d => poly(s"${d._1}:fold") % 5)
      .view.mapValues(ds => (ds.length.toLong, ds.map(_._2).sum)).toMap
    val got = FeatureOps.kfoldAssign(spark, sf).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(got == exp)
    assert(got.keySet == (0L until 5L).toSet, "all five folds populated")
    assert(got.values.map(_._1).sum == docs.length)
  }

  test("q225 buckets partition the vocabulary and the occurrence mass") {
    val words = spark.read.parquet(s"$sf/documents.parquet")
      .selectExpr("explode(split(text, ' ')) AS w").collect()
      .map(_.getString(0))
    val freq = words.groupBy(identity).view.mapValues(_.length.toLong)
    val exp = freq.toSeq.groupBy { case (w, _) => poly(w) % 256 }
      .view.mapValues(ws => (ws.length.toLong, ws.map(_._2).sum)).toMap
    val got = FeatureOps.featureHashing(spark, sf).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(got == exp)
    assert(got.values.map(_._2).sum == words.length.toLong)
  }

  test("q231 LOO encoding: excludes self; category identity holds") {
    import java.math.{BigDecimal => JBD, RoundingMode}
    val o = spark.read.parquet(s"$sf/orders.parquet")
      .select("o_orderkey", "o_orderpriority", "o_totalprice").collect()
      .map(r => (r.getLong(0), r.getString(1),
        JBD.valueOf(r.getDouble(2)).setScale(2, RoundingMode.HALF_UP)
          .movePointRight(2).longValueExact))
    val byCat = o.groupBy(_._2).view
      .mapValues(os => (os.map(_._3).sum, os.length.toLong)).toMap
    val got = FeatureOps.targetEncoding(spark, sf).collect()
      .map(r => r.getLong(0) -> ((r.getString(1), r.getLong(2),
        r.getLong(3)))).toMap
    assert(got.size == o.length)
    o.foreach { case (k, cat, cents) =>
      val (s1, n) = byCat(cat)
      assert(got(k) == ((cat, cents, (s1 - cents) / (n - 1))), k)
    }
  }
}
