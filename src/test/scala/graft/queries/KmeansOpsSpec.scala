package graft.queries

import graft.TestSpark
import org.scalatest.funsuite.AnyFunSuite

/** q260 — sequential driver re-implementation of the integer Lloyd
  * loop (third formulation next to the Spark loop and the CTE chain). */
class KmeansOpsSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  private val sf = "/root/testdata/sf0.001"

  test("q260 ≡ driver Lloyd loop (3 iters, packed-argmin ties)") {
    val vecs = spark.read.parquet(s"$sf/embeddings.parquet")
      .select("vec_id", "embedding").collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1)
        .map(x => math.floor(x.toDouble * 1000).toLong).toArray)
      .sortBy(_._1)
    var cent: Map[Long, Array[Long]] =
      vecs.filter(_._1 < 8).map { case (id, q) => id -> q }.toMap
    var assign: Seq[(Long, Long, Long)] = null // (vec, cell, dist)
    for (i <- 1 to 3) {
      assign = vecs.toSeq.map { case (id, q) =>
        val best = cent.toSeq.map { case (c, cv) =>
          val dist = q.zip(cv).map { case (a, b) =>
            (a - b) * (a - b) }.sum
          (dist, c)
        }.minBy(identity) // (dist, cell) — the packed-argmin order
        (id, best._2, best._1)
      }
      val vmap = vecs.toMap
      if (i < 3) {
        cent = assign.groupBy(_._2).map { case (c, as) =>
          val members = as.map(a => vmap(a._1))
          val dims = members.head.length
          c -> Array.tabulate(dims) { dd =>
            val sum = members.map(_(dd)).sum
            // Spark div / DuckDB //: truncation toward zero
            sum / members.length
          }
        }
      }
    }
    val expect = assign.groupBy(_._2).map { case (c, as) =>
      c -> (as.size.toLong, as.map(_._1).min, as.map(_._3).sum)
    }
    val got = KmeansOps.kmeansIters(spark, sf).collect()
      .map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    assert(got == expect)
    assert(got.values.map(_._1).sum == vecs.length) // every vec assigned
  }
}
