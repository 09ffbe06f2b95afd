package graft.queries

import graft.TestSpark
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Error-bound assertions for the sketch queries (q121/q122). These have
  * no DuckDB oracle by design — sketch internals are engine-specific —
  * so the accuracy contract is proven here against the exact values the
  * queries carry alongside. */
class ProfilingSketchSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  val d = "/root/testdata/sf0.01"

  test("approx distinct stays within 5% of exact per event_type") {
    val rows = Profiling.approxDistinct(spark, d).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val exact = r.getLong(r.fieldIndex("exact_uv"))
      val approx = r.getLong(r.fieldIndex("approx_uv"))
      assert(exact > 0)
      val relErr = math.abs(approx - exact).toDouble / exact
      assert(relErr <= 0.05,
        s"${r.getString(0)}: approx $approx vs exact $exact (relErr $relErr)")
    }
  }

  test("approx quantiles sit inside the exact rank envelope (±0.01 rank)") {
    val env = graft.Tables.orders(spark, d)
      .groupBy("o_orderstatus")
      .agg(
        expr("percentile_cont(0.49) WITHIN GROUP (ORDER BY o_totalprice)").as("lo50"),
        expr("percentile_cont(0.51) WITHIN GROUP (ORDER BY o_totalprice)").as("hi50"),
        expr("percentile_cont(0.89) WITHIN GROUP (ORDER BY o_totalprice)").as("lo90"),
        expr("percentile_cont(0.91) WITHIN GROUP (ORDER BY o_totalprice)").as("hi90"),
        expr("percentile_cont(0.98) WITHIN GROUP (ORDER BY o_totalprice)").as("lo99"),
        expr("percentile_cont(1.0) WITHIN GROUP (ORDER BY o_totalprice)").as("hi99"))
      .collect().map(r => r.getString(0) ->
        (1 to 6).map(i => r.getAs[Number](i).doubleValue())).toMap
    val rows = Profiling.approxQuantiles(spark, d).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val bounds = env(r.getString(0))
      val approx = Seq("approx_p50", "approx_p90", "approx_p99")
        .map(c => r.getAs[Number](r.fieldIndex(c)).doubleValue())
      for ((a, i) <- approx.zipWithIndex) {
        val (lo, hi) = (bounds(i * 2), bounds(i * 2 + 1))
        assert(a >= lo && a <= hi,
          s"${r.getString(0)} q${Seq(50, 90, 99)(i)}: $a outside [$lo, $hi]")
      }
    }
  }
}
