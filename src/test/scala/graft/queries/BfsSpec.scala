package graft.queries

import graft.TestSpark
import org.scalatest.funsuite.AnyFunSuite

/** q259 — driver BFS re-derivation over the operator's own edge list. */
class BfsSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  private val sf = "/root/testdata/sf0.001"

  test("q259 ≡ driver queue BFS from the min node") {
    val pairs = TextOps.ngramJaccard(spark, sf)
      .select("doc_a", "doc_b").collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val adj = scala.collection.mutable.Map
      .empty[Long, List[Long]].withDefaultValue(Nil)
    pairs.foreach { case (a, b) =>
      adj(a) = b :: adj(a); adj(b) = a :: adj(b)
    }
    val src = pairs.flatMap(p => Seq(p._1, p._2)).min
    val dist = scala.collection.mutable.Map(src -> 0L)
    val q = scala.collection.mutable.Queue(src)
    while (q.nonEmpty) {
      val x = q.dequeue()
      adj(x).foreach { y =>
        if (!dist.contains(y)) { dist(y) = dist(x) + 1; q.enqueue(y) }
      }
    }
    val got = GraphOps.bfsHops(spark, sf).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == dist.toMap)
    assert(got(src) == 0L)
    // only the source component is reached
    assert(got.size <= pairs.flatMap(p => Seq(p._1, p._2)).distinct.length)
  }
}
