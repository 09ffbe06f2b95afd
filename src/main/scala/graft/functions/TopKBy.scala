package graft.functions

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

import scala.collection.mutable

/** Grouped top-k as a native TypedImperativeAggregate: `topk_by(value,
  * key, k)` returns the k keys with the largest values (ties broken by
  * smaller key), per group.
  *
  * vs the window-function formulation (row_number + filter): no
  * per-partition sort of ALL rows and no shuffle of losers — each
  * partial buffer holds ≤ k entries, the exchange ships ≤ k rows per
  * group per map task. For "top 3 of millions per group" at 100 TB, that
  * is the difference between sorting the table and a bounded heap.
  */
case class TopKBy(value: Expression, key: Expression, kExpr: Expression,
    mutableAggBufferOffset: Int = 0, inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[mutable.ArrayBuffer[(Double, Long)]] {

  private lazy val k: Int = kExpr.eval().asInstanceOf[Number].intValue

  override def children: Seq[Expression] = Seq(value, key, kExpr)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(LongType)

  private def order(e: (Double, Long)): (Double, Long) = (-e._1, e._2)

  private def trim(buf: mutable.ArrayBuffer[(Double, Long)])
      : mutable.ArrayBuffer[(Double, Long)] = {
    if (buf.length > k) {
      val kept = buf.sortBy(order).take(k)
      buf.clear()
      buf ++= kept
    }
    buf
  }

  override def createAggregationBuffer(): mutable.ArrayBuffer[(Double, Long)] =
    mutable.ArrayBuffer.empty

  override def update(buf: mutable.ArrayBuffer[(Double, Long)],
      input: InternalRow): mutable.ArrayBuffer[(Double, Long)] = {
    val v = value.eval(input)
    val ky = key.eval(input)
    if (v != null && ky != null) {
      buf += ((v.asInstanceOf[Number].doubleValue, ky.asInstanceOf[Number].longValue))
      trim(buf)
    } else buf
  }

  override def merge(b1: mutable.ArrayBuffer[(Double, Long)],
      b2: mutable.ArrayBuffer[(Double, Long)]): mutable.ArrayBuffer[(Double, Long)] = {
    b1 ++= b2
    trim(b1)
  }

  override def eval(buf: mutable.ArrayBuffer[(Double, Long)]): Any =
    new GenericArrayData(buf.sortBy(order).take(k).map(_._2).toArray)

  override def serialize(buf: mutable.ArrayBuffer[(Double, Long)]): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeInt(buf.length)
    buf.foreach { case (v, ky) => out.writeDouble(v); out.writeLong(ky) }
    out.flush()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): mutable.ArrayBuffer[(Double, Long)] = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val n = in.readInt()
    val buf = mutable.ArrayBuffer.empty[(Double, Long)]
    (0 until n).foreach(_ => buf += ((in.readDouble(), in.readLong())))
    buf
  }

  override def withNewMutableAggBufferOffset(offset: Int): TopKBy =
    copy(mutableAggBufferOffset = offset)
  override def withNewInputAggBufferOffset(offset: Int): TopKBy =
    copy(inputAggBufferOffset = offset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): TopKBy =
    copy(value = newChildren(0), key = newChildren(1), kExpr = newChildren(2))
}

object TopKBy {
  /** Idempotent session registration; use via
    * `call_function("topk_by", valueCol, keyCol, lit(k))`. */
  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "topk_by", exprs => TopKBy(exprs(0), exprs(1), exprs(2)).toAggregateExpression(),
      "scala_udf")
}
