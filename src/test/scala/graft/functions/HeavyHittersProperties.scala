package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{BoundReference, Literal}
import org.apache.spark.sql.types.StringType
import org.apache.spark.unsafe.types.UTF8String
import org.scalacheck.{Gen, Prop, Properties}

/** ScalaCheck laws for the Misra–Gries aggregate, driven through the
  * REAL TypedImperativeAggregate buffer methods (update/merge/
  * serialize) exactly as Spark's partial-aggregation machinery calls
  * them — for ANY stream, ANY partitioning of it, and ANY merge order:
  * est ≤ f ≤ est + n/(m+1), every item with f > n/(m+1) survives, and
  * buffers roundtrip through serialization. */
object HeavyHittersProperties extends Properties("graft.heavy_hitters") {

  private def agg(m: Int) =
    HeavyHitters(BoundReference(0, StringType, nullable = true), Literal(m))

  /** Skewed item source: a small hot set + a long cold tail. */
  private val item: Gen[String] = Gen.frequency(
    5 -> Gen.oneOf("hot1", "hot2", "hot3"),
    3 -> Gen.alphaLowerStr.map(s => "c" + s.take(4)))

  private val streamAndSplit: Gen[(List[String], List[Int], Int)] = for {
    xs <- Gen.nonEmptyListOf(item)
    k <- Gen.chooseNum(1, 8)
    cuts <- Gen.listOfN(k, Gen.chooseNum(0, xs.length))
    m <- Gen.chooseNum(2, 12)
  } yield (xs, cuts.sorted, m)

  private def summarize(xs: List[String], cuts: List[Int], m: Int)
      : Map[String, Long] = {
    val a = agg(m)
    val bounds = (0 +: cuts :+ xs.length).distinct.sorted
    val chunks = bounds.zip(bounds.tail).map { case (i, j) => xs.slice(i, j) }
    val bufs = chunks.map { chunk =>
      val b = a.createAggregationBuffer()
      chunk.foreach(s =>
        a.update(b, InternalRow(UTF8String.fromString(s))))
      // exercise the shuffle path: every partial buffer roundtrips
      a.deserialize(a.serialize(b))
    }
    val merged = bufs.reduceLeft(a.merge)
    merged.map { case (s, c) => s.toString -> c }.toMap
  }

  property("MG bounds hold for any stream, split and merge order") =
    Prop.forAll(streamAndSplit) { case (xs, cuts, m) =>
      val est = summarize(xs, cuts, m)
      val exact = xs.groupBy(identity).view.mapValues(_.size.toLong).toMap
      val n = xs.length.toLong
      val slack = n / (m + 1)
      val sizeOk = est.size <= m
      val boundsOk = est.forall { case (s, e) =>
        val f = exact.getOrElse(s, 0L)
        e <= f && f - e <= slack
      }
      val presenceOk = exact.forall { case (s, f) =>
        f <= slack || est.contains(s)
      }
      sizeOk && boundsOk && presenceOk
    }

  property("single buffer with m ≥ distinct items is exact") =
    Prop.forAll(Gen.nonEmptyListOf(item)) { xs =>
      val est = summarize(xs, Nil, xs.distinct.size + 1)
      est == xs.groupBy(identity).view.mapValues(_.size.toLong).toMap
    }
}
