package graft.queries

import graft.TestSpark
import org.scalatest.funsuite.AnyFunSuite

/** q279 — driver re-derivation + a two-cluster fixture with border
  * and noise (the real corpus yields one component; the fixture
  * proves separation, border labeling, and noise accounting). */
class DensityOpsSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  private val sf = "/root/testdata/sf0.001"

  test("q279 ≡ driver grid DBSCAN on the real embeddings") {
    val pts = spark.read.parquet(s"$sf/embeddings.parquet")
      .selectExpr("vec_id",
        "CAST(floor(CAST(element_at(embedding, 1) AS DOUBLE) * 1000)" +
          " AS BIGINT) div 100",
        "CAST(floor(CAST(element_at(embedding, 2) AS DOUBLE) * 1000)" +
          " AS BIGINT) div 100").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val cells = pts.groupBy(p => (p._2, p._3)).view
      .mapValues(_.length.toLong).toMap
    val core = cells.filter(_._2 >= 8).keySet
    def pack(c: (Long, Long)) = (c._1 + 500) * 100000 + c._2 + 500
    // driver union-find over 8-neighborhood core adjacency
    val parent = scala.collection.mutable.Map(
      core.toSeq.map(c => c -> c): _*)
    def find(x: (Long, Long)): (Long, Long) = {
      var r = x; while (parent(r) != r) r = parent(r); r
    }
    for {
      a <- core; dx <- -1 to 1; dy <- -1 to 1
      if dx != 0 || dy != 0
      b = (a._1 + dx, a._2 + dy) if core(b)
    } {
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) { if (pack(ra) < pack(rb)) parent(rb) = ra
        else parent(ra) = rb }
    }
    val comp = core.map(c => c -> pack(find(c))).toMap
    val borderPts = cells.keySet.diff(core).flatMap { c =>
      val nbr = (for {
        dx <- -1 to 1; dy <- -1 to 1 if dx != 0 || dy != 0
        n = (c._1 + dx, c._2 + dy) if core(n)
      } yield comp(n))
      if (nbr.isEmpty) None else Some(c -> nbr.min)
    }.toMap
    // .toSeq before mapping to counts: a Set view of equal counts
    // collapses (the NOTES_r8 Map-view dedup trap, third sighting)
    val expectClusters = comp.groupBy(_._2).map { case (k, cs) =>
      k -> ((cs.size.toLong, cs.keys.toSeq.map(cells).sum,
        borderPts.filter(b => b._2 == k).keys.toSeq.map(cells).sum))
    }
    val noisePts = pts.length -
      core.toSeq.map(cells).sum - borderPts.keys.toSeq.map(cells).sum
    val got = DensityOps.gridDensity(spark, sf).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2),
        r.getLong(3)))).toMap
    assert(got(-1L) == ((0L, 0L, noisePts.toLong)))
    assert((got - -1L) == expectClusters)
  }

  test("fixture: two separated clusters, border points, noise") {
    import spark.implicits._
    // cluster A: 10 points in cell (0,0); cluster B: 10 in (5,5)
    // (Chebyshev gap > 1 => never connect); 1 point in (1,0) =>
    // border of A; 1 point far away => noise
    val pts = (
      (1 to 10).map(i => (i.toLong, 0L, 0L)) ++
      (11 to 20).map(i => (i.toLong, 5L, 5L)) ++
      Seq((21L, 1L, 0L), (22L, -4L, -4L))
    ).toDF("vec_id", "gx", "gy")
    val got = DensityOps.gridDensityFrom(spark, pts).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3))).sortBy(_._1)
    val packA = (0L + 500) * 100000 + 0 + 500
    val packB = (5L + 500) * 100000 + 5 + 500
    assert(got.length == 3)
    assert(got(0) == ((-1L, 0L, 0L, 1L)))            // noise
    assert(got(1) == ((packA, 1L, 10L, 1L)))         // A + its border
    assert(got(2) == ((packB, 1L, 10L, 0L)))         // B, no border
  }
}
