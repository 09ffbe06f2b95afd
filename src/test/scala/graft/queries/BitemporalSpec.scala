package graft.queries

import graft.TestSpark
import org.scalatest.funsuite.AnyFunSuite

/** q313/q314/q315 — bitemporal law + surface re-derivations. */
class BitemporalSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  private val sf = "/root/testdata/sf0.001"

  test("q313: before the correction the old belief holds; after, " +
      "the segment depends on valid time") {
    val segs = spark.read.parquet(s"$sf/customer.parquet")
      .select("c_custkey", "c_mktsegment").collect()
      .map(r => (r.getLong(0), r.getString(1)))
    val changedBySeg = segs.filter(_._1 % 10 == 3)
      .groupBy(_._2).view.mapValues(_.length.toLong).toMap
    val allBySeg = segs.groupBy(_._2).view
      .mapValues(_.length.toLong).toMap
    val rows = BitemporalHelper.collect(spark, sf)
    // tx100: original segments regardless of valid date
    assert(rows("tx100_valid11000") == allBySeg)
    // tx300 valid before merge day: still original everywhere
    assert(rows("tx300_valid10000") == allBySeg)
    // tx300 valid after: changed customers moved to UPGRADED
    val expect3 = allBySeg.map { case (s0, n) =>
      s0 -> (n - changedBySeg.getOrElse(s0, 0L))
    }.filter(_._2 > 0) + ("UPGRADED" -> segs.count(_._1 % 10 == 3).toLong)
    assert(rows("tx300_valid11000") == expect3)
  }

  test("q314: zero band present; bands partition the corpus") {
    val lens = spark.read.parquet(s"$sf/documents.parquet")
      .select("text").collect()
      .map(_.getString(0).split(" ", -1).length)
    val grams = lens.map(l => math.max(l - 11, 0).toLong)
    val expect = grams.groupBy(g =>
      if (g == 0) "zero" else if (g < 40) "short" else "long")
      .view.mapValues(gs => (gs.size.toLong, gs.min, gs.max)).toMap
    val got = SqlSurface.explodeOuter(spark, sf).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2),
        r.getLong(3)))).toMap
    assert(got == expect)
    assert(got.contains("zero"), "the null-preserving class must occur")
    assert(got.values.map(_._1).sum == lens.length.toLong)
  }

  test("q315 ≡ driver map identities") {
    val ev = graft.Tables.events(spark, sf)
      .select("user_id", "event_type").collect()
      .map(r => (r.getLong(0), r.getString(1)))
    val expect = ev.groupBy(_._1).map { case (u, es) =>
      val byType = es.groupBy(_._2).view.mapValues(_.length.toLong).toMap
      u -> ((byType.size, byType.getOrElse("click", 0L),
        byType.getOrElse("purchase", 0L), es.length.toLong,
        byType.keys.toSeq.sorted.mkString(",")))
    }
    val got = SqlSurface.mapSurface(spark, sf).collect()
      .map(r => r.getLong(0) -> ((r.getInt(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getString(5)))).toMap
    assert(got == expect)
  }
}

/** Collect helper shared by the q313 test (keeps the test body tidy). */
private object BitemporalHelper {
  def collect(spark: org.apache.spark.sql.SparkSession, sf: String)
      : Map[String, Map[String, Long]] =
    GovernanceOps.bitemporal(spark, sf).collect()
      .groupBy(_.getString(0)).view.mapValues(_.map(r =>
        r.getString(1) -> r.getLong(2)).toMap).toMap
}
