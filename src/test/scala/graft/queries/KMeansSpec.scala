package graft.queries

import graft.TestSpark
import org.scalatest.funsuite.AnyFunSuite

/** Lloyd's k-means training loop (SimHashIvf.kmeansTrain): inertia must
  * be non-increasing across iterations (the Lloyd's guarantee), the
  * centroid matrix keeps its shape, and training is deterministic for a
  * deterministic seed. */
class KMeansSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  private val d = "/root/testdata/sf0.001"

  test("inertia is non-increasing over iterations and training is deterministic") {
    val (centroids, inertias) = SimHashIvf.kmeansTrain(spark, d, iterations = 4)
    assert(inertias.length == 4)
    inertias.sliding(2).foreach { case Seq(a, b) =>
      assert(b <= a + 1e-6, s"inertia increased: $inertias")
    }
    assert(inertias.last < inertias.head) // it actually moved
    assert(centroids.length == 8 && centroids.forall(_.length == 64))
    // reduceByKey merge order varies with task timing, so double sums
    // are reproducible only to float tolerance — assert that, not bits
    val (centroids2, inertias2) = SimHashIvf.kmeansTrain(spark, d, iterations = 4)
    inertias.zip(inertias2).foreach { case (a, b) =>
      assert(math.abs(a - b) / math.max(a, 1e-9) < 1e-9)
    }
    val flat1 = centroids.flatMap(_.toSeq)
    val flat2 = centroids2.flatMap(_.toSeq)
    flat1.zip(flat2).foreach { case (a, b) =>
      assert(math.abs(a - b) < 1e-9)
    }
  }
}
