package graft.queries

import graft.TestSpark
import org.scalatest.funsuite.AnyFunSuite

/** Fixture pins for the graph-at-scale pack (q357–q359): the
  * degree-ordered triangle census on hand-countable graphs, the
  * modularity algebra including negative-term truncation, and the
  * Bellman-Ford relaxation with its budget contract. */
class GraphScaleOpsSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("q357 fixture: K4 — every node 3 triangles, cc = 1.000000") {
    val pairs = Seq((1L, 2L), (1L, 3L), (1L, 4L), (2L, 3L), (2L, 4L),
      (3L, 4L)).toDF("doc_a", "doc_b")
    val got = GraphScaleOps.triangleCensusOf(pairs).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .sortBy(_._1)
    assert(got.toSeq === (1L to 4L).map(i => (i, 3L, 3L, 1000000L)))
  }

  test("q357 fixture: path graph has zero triangles; star too") {
    val path = Seq((1L, 2L), (2L, 3L), (3L, 4L)).toDF("doc_a", "doc_b")
    assert(GraphScaleOps.triangleCensusOf(path).collect()
      .forall(r => r.getLong(2) == 0L && r.getLong(3) == 0L))
    // star: the hub is the HIGHEST-rank node — all edges point at it,
    // no wedge opens there (the skew case the ordering exists for)
    val star = Seq((9L, 1L), (9L, 2L), (9L, 3L), (9L, 4L))
      .toDF("doc_a", "doc_b")
    assert(GraphScaleOps.triangleCensusOf(star).collect()
      .forall(r => r.getLong(2) == 0L))
  }

  test("q357 fixture: triangle + pendant matches the naive count") {
    // {1,2,3} triangle, 4 pendant off 3: tri(1)=tri(2)=tri(3)=1,
    // tri(4)=0; cc(3) = 2·1e6 div (3·2) = 333333
    val g = Seq((1L, 2L), (1L, 3L), (2L, 3L), (3L, 4L))
      .toDF("doc_a", "doc_b")
    val m = GraphScaleOps.triangleCensusOf(g).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3)))
      .toMap
    assert(m(1L) === ((2L, 1L, 1000000L)))
    assert(m(3L) === ((3L, 1L, 333333L)))
    assert(m(4L) === ((1L, 0L, 0L)))
  }

  test("q358 fixture: two bands, negative terms truncate toward zero") {
    // pairs {(1,2),(1,3),(2,3),(3,4)}, bands {1,2,3}→0, {4}→1: m=4,
    // band0: n=3, intra=3, dsum=7 → q_num = 48−49 = −1,
    // q_ppm = −1000000 div 64 = −15625 (exact, sign-sensitive)
    val pairs = Seq((1L, 2L), (1L, 3L), (2L, 3L), (3L, 4L))
      .toDF("doc_a", "doc_b")
    val bands = Seq((1L, 0L), (2L, 0L), (3L, 0L), (4L, 1L))
      .toDF("doc_id", "band")
    val got = GraphScaleOps.modularityOf(pairs, bands).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(5), r.getLong(6)))
    assert(got.toSeq === Seq((0L, 3L, 3L, 7L, -1L, -15625L),
      (1L, 1L, 0L, 1L, -1L, -15625L)))
  }

  test("q359 fixture: relaxation prefers the cheaper 2-hop path") {
    // directed both ways: 1-2 (10), 2-4 (10), 1-4 (100) → dist(4)=20
    val und = Seq((1L, 2L, 10L), (2L, 4L, 10L), (1L, 4L, 100L))
    val edges = (und ++ und.map(e => (e._2, e._1, e._3)))
      .toDF("u", "v", "w")
    val got = GraphScaleOps.ssspOf(edges, 1L).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got === Map(1L -> 0L, 2L -> 10L, 4L -> 20L))
  }

  test("q359 fixture: budget contract — rounds_used and converged") {
    // path 1-2-3-4 (w=1): new node per round, stable at round 4
    val und = Seq((1L, 2L, 1L), (2L, 3L, 1L), (3L, 4L, 1L))
    val edges = (und ++ und.map(e => (e._2, e._1, e._3)))
      .toDF("u", "v", "w")
    val rows = GraphScaleOps.ssspOf(edges, 1L).collect()
    assert(rows.map(r => r.getLong(0) -> r.getLong(1)).toMap ===
      Map(1L -> 0L, 2L -> 1L, 3L -> 2L, 4L -> 3L))
    assert(rows.forall(r => r.getLong(2) == 4L && r.getLong(3) == 1L))
  }

  test("q357 property: ordered ≡ brute-force census, 12 seeded graphs") {
    for (seed <- 1 to 12) {
      val rnd = new scala.util.Random(seed)
      val n = 10 + seed
      val es = for {
        a <- 0 until n; b <- (a + 1) until n
        if rnd.nextDouble() < 0.25
      } yield (a.toLong, b.toLong)
      if (es.nonEmpty) {
        val got = GraphScaleOps.triangleCensusOf(es.toDF("doc_a", "doc_b"))
          .collect()
          .map(r => r.getLong(0) ->
            ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
        val nbrs = es.flatMap { case (a, b) => Seq(a -> b, b -> a) }
          .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
        assert(got.keySet === nbrs.keySet, s"seed=$seed node set")
        for ((v, ns) <- nbrs) {
          val tri = ns.toSeq.combinations(2)
            .count { case Seq(x, y) => nbrs(x)(y) }
          val deg = ns.size.toLong
          val cc = if (deg >= 2) 2L * tri * 1000000L / (deg * (deg - 1))
            else 0L
          assert(got(v) === ((deg, tri.toLong, cc)), s"seed=$seed node=$v")
        }
      }
    }
  }

  test("q359 property: SSSP ≡ the driver-side recurrence, 5 graphs") {
    for (seed <- 1 to 5) {
      val rnd = new scala.util.Random(100 + seed)
      val n = 12
      val und = for {
        a <- 0 until n; b <- (a + 1) until n
        if rnd.nextDouble() < 0.3
      } yield (a.toLong, b.toLong, (rnd.nextInt(20) + 1).toLong)
      if (und.nonEmpty) {
        val dirs = und ++ und.map(e => (e._2, e._1, e._3))
        val src = und.flatMap(e => Seq(e._1, e._2)).min
        val rows = GraphScaleOps.ssspOf(dirs.toDF("u", "v", "w"), src)
          .collect()
        // the identical recurrence, driver-side, same budget
        val adj = dirs.groupBy(_._1).view
          .mapValues(_.map(t => (t._2, t._3))).toMap
        var d = Map(src -> 0L); var stable = false; var r = 0
        while (!stable && r < GraphScaleOps.SsspRounds) {
          val relaxed = d.toSeq ++ d.toSeq.flatMap { case (u, du) =>
            adj.getOrElse(u, Nil).map { case (v, w) => v -> (du + w) } }
          val next = relaxed.groupBy(_._1).view
            .mapValues(_.map(_._2).min).toMap
          stable = next == d; d = next; r += 1
        }
        assert(rows.map(x => x.getLong(0) -> x.getLong(1)).toMap === d,
          s"seed=$seed distances")
        assert(rows.forall(x => x.getLong(2) == r.toLong &&
          x.getLong(3) == (if (stable) 1L else 0L)), s"seed=$seed budget")
      }
    }
  }

  test("q359 guard: corpus with no support>=2 pair yields empty, not a throw") {
    // ADVICE r9: the max-degree source read must not NoSuchElement on a
    // degenerate corpus. Every order here shares no part pair twice, so
    // the co-purchase edge set is empty and q359 returns zero rows with
    // the operator's schema.
    val dir = java.nio.file.Files.createTempDirectory("graft_sssp_deg")
      .toString
    Seq((1L, 10L), (1L, 11L), (2L, 10L), (2L, 12L))
      .toDF("l_orderkey", "l_partkey")
      .write.mode("overwrite").parquet(s"$dir/lineitem.parquet")
    val got = GraphScaleOps.ssspWeighted(spark, dir)
    assert(got.count() === 0L)
    assert(got.columns.toSeq ===
      Seq("part_id", "dist", "rounds_used", "converged"))
  }
}
