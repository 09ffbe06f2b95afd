package graft.queries

import graft.TestSpark
import org.scalatest.funsuite.AnyFunSuite

/** q160–q162 contracts beyond the oracle: snapshot-diff census
  * re-derived driver-side, skew percentiles as literal order
  * statistics, and the Morton interleave against a bit-twiddling
  * reference implementation.
  */
class LayoutOpsSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  private val sf = "/root/testdata/sf0.001"

  test("q160 statuses partition both snapshots and census the derivation") {
    val docs = spark.read.parquet(s"$sf/documents.parquet")
      .select("doc_id").collect().map(_.getLong(0))
    val removed = docs.count(id => id % 17 == 3)
    val changed = docs.count(id => id % 17 != 3 && id % 13 == 5)
    val added = docs.count(_ % 29 == 7)
    val unchanged = docs.count(id => id % 17 != 3 && id % 13 != 5)
    val got = LayoutOps.snapshotDiff(spark, sf).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got == Map("removed" -> removed.toLong, "changed" -> changed.toLong,
      "added" -> added.toLong, "unchanged" -> unchanged.toLong))
  }

  test("q161 percentiles are the order statistics of per-key counts") {
    val counts = spark.read.parquet(s"$sf/orders.parquet")
      .groupBy("o_custkey").count()
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val sorted = counts.map(_._2).sorted
    def pct(p: Int) = sorted(((sorted.length - 1) * p) / 100)
    val r = LayoutOps.skewProfile(spark, sf).collect().head
    assert(r.getLong(0) == counts.length.toLong)           // n_keys
    assert(r.getLong(1) == sorted.sum)                     // total_rows
    assert(r.getLong(2) == sorted.max)                     // max_cnt
    val topKey = counts.sortBy { case (k, c) => (-c, k) }.head._1
    assert(r.getLong(3) == topKey)
    assert(r.getLong(4) == pct(50) && r.getLong(5) == pct(90) &&
      r.getLong(6) == pct(99))
    assert(r.getLong(7) == sorted.max * counts.length * 1000000L / sorted.sum)
  }

  test("q167 maintained aggregates equal a direct recompute of the new snapshot") {
    val docs = spark.read.parquet(s"$sf/documents.parquet")
      .select("doc_id", "source", "text").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2)))
    val newSnap = docs.filter(_._1 % 17 != 3)
      .map { case (id, src, t) =>
        (id, src, if (id % 13 == 5) t + " v2" else t) } ++
      docs.filter(_._1 % 29 == 7).map { case (id, src, t) =>
        (id + 1000000L, src, t) }
    val expected = newSnap.groupBy(_._2).view.mapValues(rs =>
      (rs.length.toLong, rs.map(_._3.length.toLong).sum)).toMap
    val got = LayoutOps.incrementalAgg(spark, sf).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(got == expected)
  }

  test("q169 partitions are ordered, exhaustive, and only unsplittable " +
    "values overflow the target") {
    val out = LayoutOps.rangePlanner(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .sortBy(_._1)
    val total = spark.read.parquet(s"$sf/documents.parquet").count()
    assert(out.map(_._2).sum == total)
    out.sliding(2).foreach {
      case Array((_, _, _, hi1), (_, _, lo2, _)) => assert(hi1 < lo2)
      case _ =>
    }
    // any overflow past the ideal share is attributable to the part's
    // boundary (last) value, which range partitioning cannot split:
    // n − freq(hi) < ceil(N/32)
    val freq = spark.read.parquet(s"$sf/documents.parquet")
      .groupBy("n_chars").count().collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val target = (total + 31) / 32
    out.foreach { case (_, n, _, hi) =>
      assert(n - freq(hi) < target)
    }
  }

  test("q162 interleave matches a bit-twiddling reference; box census adds up") {
    import spark.implicits._
    def mortonRef(x: Long, y: Long): Long =
      (0 until 8).map(i => (((x >> i) & 1L) << (2 * i)) |
        (((y >> i) & 1L) << (2 * i + 1))).sum
    // cover corners, the diagonal, and a pseudo-random scatter
    val pts = Seq((0L, 0L), (255L, 255L), (255L, 0L), (0L, 255L)) ++
      (0 until 64).map(i => ((i * 37L) % 256, (i * 101L) % 256))
    val zExpr = (0 until 8).map(i =>
      s"((x div ${1L << i}) % 2) * ${1L << (2 * i)} + " +
        s"((y div ${1L << i}) % 2) * ${1L << (2 * i + 1)}").mkString(" + ")
    val viaSql = pts.toDF("x", "y")
      .selectExpr("x", "y", s"($zExpr) as z")
      .collect().map(r => ((r.getLong(0), r.getLong(1)), r.getLong(2))).toMap
    pts.foreach { case (x, y) => assert(viaSql((x, y)) == mortonRef(x, y)) }
    // per-bucket box_rows must total the rows inside the probe box
    val li = spark.read.parquet(s"$sf/lineitem.parquet")
      .selectExpr("l_partkey % 256 as x", "l_suppkey % 256 as y")
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val inBox = li.count { case (x, y) => x <= 15 && y <= 15 }.toLong
    val out = LayoutOps.zorderLayout(spark, sf).collect()
    assert(out.map(_.getLong(6)).sum == inBox)
    assert(out.map(_.getLong(1)).sum == li.length.toLong)
    // every bucket holding box rows must be a probe hit
    out.foreach(r => if (r.getLong(6) > 0) assert(r.getBoolean(7)))
  }
}
