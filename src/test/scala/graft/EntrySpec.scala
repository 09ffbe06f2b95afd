package graft

import org.scalatest.funsuite.AnyFunSuite

/** The driver's contract surface: entry() smoke (rows > 0 at sf0.001)
  * and queries/oracleSql key alignment. */
class EntrySpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  test("entry returns rows on sf0.001 (driver smoke contract)") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("every oracle key has a query; query keys are well-formed") {
    val qs = SparkEntry.queries.keySet
    val os = SparkEntry.oracleSql.keySet
    assert(os.subsetOf(qs), s"oracle-only keys: ${os.diff(qs)}")
    assert(qs.forall(_.matches("q\\d+_[a-z0-9_]+")))
    assert(qs.size >= 60)
  }

  test("all queries return rows at sf0.001 (non-trivial results)") {
    val sf = "/root/testdata/sf0.001"
    val empty = SparkEntry.queries.toSeq.sortBy(_._1).filter { case (_, fn) =>
      fn(spark, sf).isEmpty
    }.map(_._1)
    assert(empty.isEmpty, s"queries with empty results at sf0.001: $empty")
  }
}
