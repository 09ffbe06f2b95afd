package graft.queries

import graft.TestSpark
import org.scalatest.funsuite.AnyFunSuite

/** q281 — consistency with the verified q119 census + partition laws. */
class GateAttributionSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  private val sf = "/root/testdata/sf0.001"

  test("q281 masks partition the universe; mask 0 ≡ q119 kept") {
    val cells = PipelineOps.gateAttribution(spark, sf).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    val q119 = PipelineOps.curatedCorpus(spark, sf).collect()
      .map(r => (r.getLong(2), r.getLong(3), r.getLong(4)))
    val docsIn = q119.map(_._1).sum
    val docsKept = q119.map(_._2).sum
    val tokensKept = q119.map(_._3).sum
    assert(cells.values.map(_._1).sum == docsIn)
    assert(cells(0L) == ((docsKept, tokensKept)))
    assert(cells.keySet.subsetOf((0L to 7L).toSet))
    // at least one gate fires alone somewhere (attribution non-vacuous)
    assert(Seq(1L, 2L, 4L).exists(m => cells.get(m).exists(_._1 > 0)))
  }
}
