package graft.queries

import graft.TestSpark
import org.scalatest.funsuite.AnyFunSuite

/** q170/q171 contracts: codebook seeds encode to themselves with zero
  * error, codes stay in range, and the whole ADC pipeline matches an
  * independent driver-side re-derivation on the real embeddings.
  */
class PqOpsSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  private val sf = "/root/testdata/sf0.001"

  private def quant(v: Float): Long = math.floor(v.toDouble * 1000).toLong

  private lazy val vecs: Map[Long, Array[Long]] =
    spark.read.parquet(s"$sf/embeddings.parquet")
      .selectExpr("vec_id", "embedding").collect()
      .map(r => r.getLong(0) ->
        r.getSeq[Float](1).map(quant).toArray).toMap

  private def subv(v: Array[Long], s: Int): Array[Long] =
    v.slice(s * 16, s * 16 + 16)

  private def l2(a: Array[Long], b: Array[Long]): Long =
    a.zip(b).map { case (x, y) => (x - y) * (x - y) }.sum

  private lazy val codebook: Map[(Int, Long), Array[Long]] =
    (for (cw <- 0 until 16; s <- 0 until 4)
      yield (s, cw.toLong) -> subv(vecs(cw + 1L), s)).toMap

  private def encode(v: Array[Long], s: Int): (Long, Long) =
    (0L until 16L).map(cw => (l2(subv(v, s), codebook((s, cw))), cw))
      .minBy { case (dist, cw) => (dist, cw) } match {
        case (dist, cw) => (cw, dist)
      }

  test("q170 codebook seeds self-encode with zero error; codes in range") {
    val enc = PqOps.pqEncode(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> ((r.getLong(2), r.getLong(3))))
      .toMap
    assert(enc.size == vecs.size * 4)
    enc.foreach { case ((_, sub), (code, qerr)) =>
      assert(sub >= 0 && sub < 4 && code >= 0 && code < 16 && qerr >= 0)
    }
    for (seed <- 1L to 16L; s <- 0 until 4)
      assert(enc((seed, s.toLong)) == ((seed - 1, 0L)))
    // every (vec, sub) matches the driver-side argmin
    enc.foreach { case ((vid, sub), (code, qerr)) =>
      assert(encode(vecs(vid), sub.toInt) == ((code, qerr)))
    }
  }

  test("q172 one Lloyd step matches driver re-derivation and never regresses") {
    val assign = vecs.keys.flatMap(vid =>
      (0 until 4).map(s => (vid, s, encode(vecs(vid), s)._1))).toSeq
    val trained: Map[(Int, Long), Array[Long]] = assign.groupBy(a => (a._2, a._3))
      .view.mapValues { members =>
        val subs = members.map { case (vid, s, _) => subv(vecs(vid), s) }
        (0 until 16).map(j => {
          val sum = subs.map(_(j)).sum
          // both engines truncate integer division toward zero
          sum / subs.size
        }).toArray
      }.toMap
    def encode2(v: Array[Long], s: Int): Long =
      trained.keys.filter(_._1 == s).map(_._2).toSeq.sorted
        .map(cw => (l2(subv(v, s), trained((s, cw))), cw))
        .minBy { case (dist, cw) => (dist, cw) }._2
    val expected = (0 until 4).map { s =>
      // keys is a Set — materialize to Seq so equal distances don't dedupe
      val ids = vecs.keys.toSeq
      val seed = ids.map(vid => encode(vecs(vid), s)._2).sum
      val after = ids.map { vid =>
        val cw = encode2(vecs(vid), s)
        l2(subv(vecs(vid), s), trained((s, cw)))
      }.sum
      s.toLong -> ((seed, after, after <= seed))
    }.toMap
    val got = PqOps.pqTrain(spark, sf).collect()
      .map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getBoolean(3)))).toMap
    assert(got == expected)
    assert(got.values.forall(_._3)) // Lloyd step never regresses here
  }

  test("q177 confusion matrix matches a driver-side Rocchio classifier") {
    val labels = spark.read.parquet(s"$sf/embeddings.parquet")
      .selectExpr("vec_id", "CAST(label AS BIGINT) as label").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val byLabel = vecs.keys.toSeq.groupBy(labels)
    val cents = byLabel.map { case (l, ids) =>
      l -> (0 until 64).map { j =>
        ids.map(vecs(_)(j)).sum / ids.size }.toArray
    }
    val expected = vecs.keys.toSeq.map { vid =>
      val pred = cents.toSeq
        .map { case (l, c) => (l2(vecs(vid), c), l) }
        .minBy { case (dd, l) => (dd, l) }._2
      (labels(vid), pred)
    }.groupBy(p => p).view.mapValues(_.size.toLong).toMap
    val got = PqOps.nearestCentroid(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(got == expected)
    // rows of a class sum to the class size
    byLabel.foreach { case (l, ids) =>
      assert(got.collect { case ((`l`, _), n) => n }.sum == ids.size.toLong)
    }
  }

  test("q171 matches a driver-side ADC search end-to-end") {
    val q = vecs(0L)
    val adc = (for (s <- 0 until 4; cw <- 0L until 16L)
      yield (s, cw) -> l2(subv(q, s), codebook((s, cw)))).toMap
    val approx = vecs.filter(_._1 != 0L).map { case (vid, v) =>
      vid -> (0 until 4).map(s => adc((s, encode(v, s)._1))).sum
    }
    val exact = vecs.filter(_._1 != 0L).map { case (vid, v) => vid -> l2(v, q) }
    val exactTop = exact.toSeq.sortBy { case (vid, dd) => (dd, vid) }
      .take(10).map(_._1).toSet
    val expected = approx.toSeq.sortBy { case (vid, a) => (a, vid) }.take(10)
      .map { case (vid, a) => (vid, a, exact(vid), exactTop.contains(vid)) }
    val got = PqOps.pqAdcSearch(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getBoolean(3)))
      .toSeq
    assert(got == expected)
    // the recall readout is non-trivial on this corpus
    assert(got.count(_._4) > 0)
  }

  test("q207 ≡ driver centroid cosine²; diagonal of 1e6 for self-pairs") {
    val byLabel = spark.read.parquet(s"$sf/embeddings.parquet")
      .selectExpr("CAST(label AS BIGINT)", "embedding").collect()
      .map(r => (r.getLong(0), r.getSeq[Float](1).map(quant).toArray))
      .groupBy(_._1).view
      .mapValues(vs => vs.map(_._2).transpose.map(_.sum).toArray).toMap
    def nn(c: Array[Long]): BigInt = c.map(x => BigInt(x) * x).sum
    val exp = (for {
      a <- byLabel.keys; b <- byLabel.keys if a < b
    } yield {
      val dot = byLabel(a).zip(byLabel(b))
        .map { case (x, y) => BigInt(x) * y }.sum
      val sign = if (dot < 0) BigInt(-1) else BigInt(1)
      ((a, b),
        (sign * dot * dot * 1000000 / (nn(byLabel(a)) * nn(byLabel(b))))
          .toLong)
    }).toMap
    val got = PqOps.centroidSim(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(got == exp)
    // a centroid against itself would read exactly 1e6; distinct-label
    // pairs must sit strictly inside (certified non-degenerate space)
    assert(got.values.forall(v => v > -1000000L && v < 1000000L))
  }
}
