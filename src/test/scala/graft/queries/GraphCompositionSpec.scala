package graft.queries

import graft.TestSpark
import org.scalatest.funsuite.AnyFunSuite

/** q287/q288 — composition consistency with the verified q159 labels
  * and symmetry laws of the undirected edge moments. */
class GraphCompositionSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  private val sf = "/root/testdata/sf0.001"

  test("q287 sizes partition the q159 node set; giant share exact") {
    val labels = GraphOps.ccLargeStar(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val expect = labels.groupBy(_._2).values.map(_.size)
      .groupBy(identity).view.mapValues(_.size.toLong).toMap
    val rows = GraphOps.componentSizes(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(rows.map(r => r._1.toInt -> r._2).toMap == expect)
    assert(rows.map(_._3).sum == labels.length)
    val maxSz = labels.groupBy(_._2).values.map(_.size).max
    rows.foreach(r =>
      assert(r._4 == maxSz.toLong * 1000000L / labels.length))
  }

  test("q288 moments: marginal symmetry and brute-force equality") {
    val pairs = TextOps.ngramJaccard(spark, sf)
      .select("doc_a", "doc_b").collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val edges = (pairs ++ pairs.map(p => (p._2, p._1))).distinct
    val deg = edges.groupBy(_._1).view.mapValues(_.length.toLong).toMap
    val m = edges.length.toLong
    val sumDu = edges.map(e => deg(e._1)).sum
    val sumDv = edges.map(e => deg(e._2)).sum
    val sumDuDv = edges.map(e => deg(e._1) * deg(e._2)).sum
    val sumDu2 = edges.map(e => deg(e._1) * deg(e._1)).sum
    val r = GraphOps.degreeAssortativity(spark, sf).collect().head
    assert(r.getLong(0) == m)
    assert(r.getLong(1) == sumDu && r.getLong(2) == sumDv)
    assert(r.getLong(3) == sumDuDv && r.getLong(4) == sumDu2)
    assert(r.getLong(5) == m * sumDuDv - sumDu * sumDv)
    // undirected: both marginals identical
    assert(sumDu == sumDv)
  }
}
