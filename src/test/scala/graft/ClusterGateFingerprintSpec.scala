package graft

import org.scalatest.funsuite.AnyFunSuite

/** Pins the ADVICE-r11 fingerprint hardening: string VALUES containing
  * the renderer's structural characters must not alias a render
  * boundary. Pre-fix, a single column holding "ab" rendered to
  * the same line as two columns ("a","b") — the field separator — so
  * two genuinely different results could fingerprint-match (a false
  * PASS in the multi-JVM gate). Same for ',' inside array values and
  * NUL vs the null marker. */
class ClusterGateFingerprintSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("field-separator byte inside a value cannot alias a column split") {
    val one = ClusterGate.fingerprint(Seq("ab").toDF("c1"))
    val two = ClusterGate.fingerprint(
      Seq(("a", "b")).toDF("c1", "c2"))
    assert(one._2 != two._2, "1-col 'a\\u0001b' aliased 2-col (a,b)")
  }

  test("comma inside an array element cannot alias an element split") {
    val one = ClusterGate.fingerprint(Seq(Tuple1(Seq("x,y"))).toDF("c"))
    val two = ClusterGate.fingerprint(Seq(Tuple1(Seq("x", "y"))).toDF("c"))
    assert(one._2 != two._2, "['x,y'] aliased ['x','y']")
  }

  test("NUL string value cannot alias a true null") {
    val nulStr = ClusterGate.fingerprint(Seq("\u0000").toDF("c"))
    val realNull = ClusterGate.fingerprint(
      Seq(Option.empty[String]).toDF("c"))
    assert(nulStr._2 != realNull._2, "'\\u0000' aliased NULL")
  }

  test("fingerprint is deterministic and row-order independent") {
    val a = ClusterGate.fingerprint(Seq("p", "q", "r").toDF("c"))
    val b = ClusterGate.fingerprint(Seq("r", "p", "q").toDF("c"))
    assert(a == b)
  }
}
