package graft.functions

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, Predicate, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode, FalseLiteral}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.types.StringType
import org.apache.spark.unsafe.types.UTF8String
import org.apache.spark.util.sketch.BloomFilter

/** `bloom_might_contain(col)` against a driver-built
  * [[org.apache.spark.util.sketch.BloomFilter]] — the q126 prefilter
  * probe as a NATIVE codegen'd expression instead of a Scala UDF.
  *
  * Why an Expression and not `udf(...)`: a ScalaUDF is an interpreted
  * per-row lambda that breaks whole-stage codegen around the filter —
  * every corpus row pays boxing + a megamorphic call, and the filter
  * stage splits the codegen span in two (the WinnowSketch rationale).
  * Here the probe compiles to one virtual call on a broadcast-referenced
  * filter object inside the generated code; the filter ships to
  * executors once via the plan's reference array, exactly like Spark's
  * own runtime-filter `BloomFilterMightContain`.
  *
  * Null semantics are the UDF's, preserved on purpose: a null input is
  * `false` (provably not on the blocklist), never null — q126 routes
  * `!probe` rows to the clean side, and null-propagation would silently
  * drop null-text docs from BOTH branches (QuotaBloomSpec pins this).
  *
  * The probe hashes the value's UTF-8 bytes — bit-identical to
  * `mightContainString(s)` (which hashes `s.getBytes(UTF_8)`) and to
  * what `df.stat.bloomFilter` put in for a string column, so swapping
  * the UDF for this expression cannot move a single row. */
case class BloomMightContain(child: Expression, bf: BloomFilter)
    extends UnaryExpression with Predicate {

  override def nullable: Boolean = false

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"bloom_might_contain expects a string column, got $t")
  }

  // full eval override (not nullSafeEval): null input must yield false,
  // not null
  override def eval(input: InternalRow): Any = {
    val v = child.eval(input)
    v != null && bf.mightContainBinary(v.asInstanceOf[UTF8String].getBytes)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val bfRef = ctx.addReferenceObj("bloomFilter", bf,
      classOf[BloomFilter].getName)
    val c = child.genCode(ctx)
    ev.copy(
      code = code"""
        ${c.code}
        boolean ${ev.value} =
          !${c.isNull} && $bfRef.mightContainBinary(${c.value}.getBytes());
      """,
      isNull = FalseLiteral)
  }

  override protected def withNewChildInternal(newChild: Expression): BloomMightContain =
    copy(child = newChild)
}

/** Column-level entry point. Unlike the stateless [[WinnowOps]] bridge,
  * every call registers a FRESH uniquely-named temp function closing
  * over its filter: a fixed name re-registered per filter would race
  * when two sessions'-worth of plans build concurrently (parallel test
  * suites share one SparkSession). Each q126 build adds one registry
  * entry — bounded by query invocations, not rows. */
object BloomOps {
  private val ids = new java.util.concurrent.atomic.AtomicLong()

  def might_contain(spark: SparkSession, bf: BloomFilter, c: Column): Column = {
    import org.apache.spark.sql.functions.call_function
    val name = s"bloom_might_contain_${ids.incrementAndGet()}"
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      name, exprs => BloomMightContain(exprs.head, bf), "scala_udf")
    call_function(name, c)
  }
}
