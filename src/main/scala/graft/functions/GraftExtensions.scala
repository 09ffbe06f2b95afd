package graft.functions

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.ExpressionInfo

/** Session extensions: registers the engine's native functions at session
  * build time, so `spark.sql.extensions=graft.functions.GraftExtensions`
  * (or `GraftSession.*`, which wires it) makes `vec_dot` available to
  * every query and SQL string without per-query registration.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(e: SparkSessionExtensions): Unit = {
    e.injectFunction((
      FunctionIdentifier("vec_dot"),
      new ExpressionInfo(classOf[VecDot].getName, "vec_dot"),
      (exprs: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) =>
        VecDot(exprs(0), exprs(1))))
    e.injectFunction((
      FunctionIdentifier("winnow_sketch"),
      new ExpressionInfo(classOf[WinnowSketch].getName, "winnow_sketch"),
      (exprs: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) =>
        WinnowSketch(exprs.head,
          exprs(1).eval(null).asInstanceOf[Number].intValue())))
    e.injectFunction((
      FunctionIdentifier("gram_hashes"),
      new ExpressionInfo(classOf[GramHashes].getName, "gram_hashes"),
      (exprs: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) =>
        GramHashes(exprs.head,
          exprs(1).eval(null).asInstanceOf[Number].intValue())))
    e.injectFunction((
      FunctionIdentifier("topk_by"),
      new ExpressionInfo(classOf[TopKBy].getName, "topk_by"),
      (exprs: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) =>
        TopKBy(exprs(0), exprs(1), exprs(2)).toAggregateExpression()))
    e.injectFunction((
      FunctionIdentifier("heavy_hitters"),
      new ExpressionInfo(classOf[HeavyHitters].getName, "heavy_hitters"),
      (exprs: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) =>
        HeavyHitters(exprs(0), exprs(1)).toAggregateExpression()))
    // band-join → granule-bucketed equi-join rewrite (see
    // graft.plans.BandJoinRewrite; spark.graft.bandJoin.enabled=false
    // to disable)
    e.injectOptimizerRule(graft.plans.BandJoinRewrite)
  }
}
