package graft.functions

import org.apache.spark.sql.{Column, Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.udaf

import scala.collection.mutable

/** Typed exact-distinct aggregator — the reference's `Set<String>
  * orderIdSet` window buffer (SURVEY.md §2.5 A4, ref
  * DwsTradeProvinceOrderWindow.java:56-112) as a first-class Spark
  * `Aggregator` with proper partial/merge semantics (the size-aware merge
  * folds the smaller set into the larger one).
  *
  * vs built-ins: `countDistinct` rewrites to a two-phase distinct
  * aggregate (extra shuffle of distinct values); `collect_set(...).size`
  * ships the whole set to the final projection. This buffer stays a
  * primitive set through partial aggregation and emits only the count.
  * At extreme cardinality swap to `approx_count_distinct` (HLL++) — the
  * exact form mirrors the reference's semantics.
  */
object ExactDistinct
    extends Aggregator[java.lang.Long, mutable.HashSet[Long], Long] {
  override def zero: mutable.HashSet[Long] = mutable.HashSet.empty
  // boxed input + null skip: COUNT(DISTINCT) ignores nulls, so must we
  override def reduce(b: mutable.HashSet[Long], a: java.lang.Long)
      : mutable.HashSet[Long] = {
    if (a != null) b += a.longValue
    b
  }
  override def merge(x: mutable.HashSet[Long], y: mutable.HashSet[Long])
      : mutable.HashSet[Long] =
    if (x.size >= y.size) { x ++= y; x } else { y ++= x; y }
  override def finish(r: mutable.HashSet[Long]): Long = r.size.toLong
  override def bufferEncoder: Encoder[mutable.HashSet[Long]] =
    Encoders.kryo[mutable.HashSet[Long]]
  override def outputEncoder: Encoder[Long] = Encoders.scalaLong

  /** Column form: `exact_distinct(col)` ≡ COUNT(DISTINCT col), exactly. */
  def exact_distinct(c: Column): Column = udaf(ExactDistinct).apply(c)
}
