package graft.functions

import org.apache.spark.unsafe.types.UTF8String
import org.scalacheck.{Gen, Prop, Properties}

/** Property: the banded DP saturates the TRUE Levenshtein distance at
  * k+1 — `bounded(a, b, k) == min(lev(a, b), k + 1)` — for arbitrary
  * strings (including the band-exit early return and the swapped-
  * operand path), against an independent full O(m·n) reference DP. */
object EditDistBoundedSpec extends Properties("EditDistBounded") {

  private def refLev(a: String, b: String): Int = {
    val x = a.codePoints().toArray
    val y = b.codePoints().toArray
    val dp = Array.tabulate(x.length + 1)(i => i)
    for (j <- 1 to y.length) {
      var prevDiag = dp(0)
      dp(0) = j
      for (i <- 1 to x.length) {
        val t = dp(i)
        dp(i) = math.min(math.min(dp(i) + 1, dp(i - 1) + 1),
          prevDiag + (if (x(i - 1) == y(j - 1)) 0 else 1))
        prevDiag = t
      }
    }
    dp(x.length)
  }

  private val gen = for {
    a <- Gen.stringOfN(12, Gen.oneOf('a', 'b', 'c', ' ', 'é'))
      .flatMap(s => Gen.choose(0, 12).map(s.take))
    b <- Gen.stringOfN(12, Gen.oneOf('a', 'b', 'c', ' ', 'é'))
      .flatMap(s => Gen.choose(0, 12).map(s.take))
    k <- Gen.choose(0, 6)
  } yield (a, b, k)

  property("bounded == min(lev, k+1)") = Prop.forAll(gen) {
    case (a, b, k) =>
      EditDist.bounded(UTF8String.fromString(a),
        UTF8String.fromString(b), k) ==
        math.min(refLev(a, b), k + 1).toLong
  }

  property("symmetric") = Prop.forAll(gen) { case (a, b, k) =>
    EditDist.bounded(UTF8String.fromString(a),
      UTF8String.fromString(b), k) ==
      EditDist.bounded(UTF8String.fromString(b),
        UTF8String.fromString(a), k)
  }
}
