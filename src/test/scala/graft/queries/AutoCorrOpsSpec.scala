package graft.queries

import graft.TestSpark
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Fixture pins for the serial-correlation pack (q360–q361): the
  * n-scaled centering, an alternating series' negative lag-1 ACF
  * (truncation toward zero on a negative numerator), and a pure
  * 2-day shift reading rho² = 1 at k = 2. */
class AutoCorrOpsSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def dayFrame(counts: Seq[(String, Int)]) =
    counts.flatMap { case (d, n) => Seq.fill(n)(d) }.toDF("ds")
      .select(to_timestamp(col("ds")).as("ts"))

  test("q360 fixture: alternating 1,3,1,3 reads acf(1) = -750 milli") {
    // x=(1,3,1,3): n=4, s=8, y=(-4,4,-4,4), den=64;
    // k1: -16-16-16 = -48 -> -48000 div 64 = -750 (toward zero)
    val ys = AutoCorrOps.centeredDaily(dayFrame(Seq(
      "2020-01-01" -> 1, "2020-01-02" -> 3,
      "2020-01-03" -> 1, "2020-01-04" -> 3)), col("ts"))
    val got = AutoCorrOps.acfOf(ys, 2).collect()
      .map(r => r.getLong(0) -> (r.getLong(2), r.getLong(3), r.getLong(4)))
      .toMap
    assert(got(0L) === ((64L, 64L, 1000L)))
    assert(got(1L) === ((-48L, 64L, -750L)))
    assert(got(2L) === ((32L, 64L, 500L)))
  }

  test("q360 fixture: centering is gap-proof (calendar lags)") {
    // days 1,2,4 (gap at 3), x=(2,2,2): y=0 everywhere, den=0 absent
    // wait - den=0 would divide; use x=(1,2,3): n=3, s=6, y=(-3,0,3)
    // k1 pairs: (d1,d2)=(-3)(0)=0; (d2,d3) absent (gap) -> num=0
    val ys = AutoCorrOps.centeredDaily(dayFrame(Seq(
      "2020-01-01" -> 1, "2020-01-02" -> 2, "2020-01-04" -> 3)), col("ts"))
    val got = AutoCorrOps.acfOf(ys, 1).collect()
      .map(r => r.getLong(0) -> r.getLong(2)).toMap
    assert(got(0L) === 18L)
    assert(got(1L) === 0L, "the (d2,d3) pair is a gap, not a lag-1 pair")
  }

  test("q361 fixture: a pure 2-day shift reads rho2 = 1e6 at k = 2") {
    val a = AutoCorrOps.centeredDaily(dayFrame(Seq(
      "2020-01-01" -> 1, "2020-01-02" -> 3,
      "2020-01-03" -> 1, "2020-01-04" -> 3)), col("ts"))
    val b = AutoCorrOps.centeredDaily(dayFrame(Seq(
      "2020-01-03" -> 1, "2020-01-04" -> 3,
      "2020-01-05" -> 1, "2020-01-06" -> 3)), col("ts"))
    val got = AutoCorrOps.xcorrOf(a, b, 3).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(4))).toMap
    assert(got(2L) === ((64L, 1000000L)), "full-overlap shift match")
    assert(got(0L) === ((32L, 250000L)), "2-day overlap at k=0")
    assert(got(2L)._1 === got.values.map(_._1).max,
      "argmax lag recovers the true shift")
  }

  test("q360 property: ACF ≡ driver reference; acf(0)=1000; |acf|≤1000") {
    for (seed <- 1 to 8) {
      val rnd = new scala.util.Random(seed)
      val nDays = 5 + rnd.nextInt(8)
      val counts = (1 to nDays).map(i =>
        f"2021-03-$i%02d" -> (1 + rnd.nextInt(5)))
      // skip the measure-zero all-equal case (den = 0)
      if (counts.map(_._2).distinct.size > 1) {
        val got = AutoCorrOps
          .acfOf(AutoCorrOps.centeredDaily(dayFrame(counts), col("ts")), 3)
          .collect()
          .map(r => r.getLong(0) -> ((r.getLong(2), r.getLong(3),
            r.getLong(4)))).toMap
        // driver-side reference: same integer algebra on day index
        val xs = counts.map(_._2.toLong)
        val n = xs.length.toLong
        val s = xs.sum
        val ys = xs.map(x => n * x - s)
        val den = ys.map(y => y * y).sum
        for (k <- 0 to 3) {
          val num = (0 until (xs.length - k))
            .map(t => ys(t) * ys(t + k)).sum
          val milli = BigInt(num) * 1000 / den // both non-neg den
          assert(got(k.toLong) === ((num, den, milli.toLong)),
            s"seed=$seed k=$k")
          assert(math.abs(got(k.toLong)._3) <= 1000L, "Cauchy-Schwarz")
        }
        assert(got(0L)._3 === 1000L)
      }
    }
  }
}
