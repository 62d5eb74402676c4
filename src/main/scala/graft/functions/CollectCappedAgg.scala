package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.classic.ExpressionUtils
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String
import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}
import scala.collection.mutable.ArrayBuffer

/** `collect_list` with a HARD buffer cap plus an exact total count:
  * `collect_capped(c, cap)` → struct(ids: array&lt;T&gt;, n: bigint).
  *
  * Rationale (100 TB): a plain `collect_list` over duplicate clusters
  * materializes O(cluster) values in ONE aggregation buffer — a single
  * billion-copy duplicate cluster would allocate a billion-element array in
  * one task. This aggregate retains at most `cap` values (memory is bounded
  * by construction, through update AND merge) while `n` keeps the exact
  * cluster size, so callers can detect truncation (`n > cap`) and emit a
  * "cluster too large" marker instead of enumerating it.
  *
  * Element types: long / int / string (the id types the dedup operators
  * use); extending to other fixed-width types is mechanical. Follows the
  * `TypedImperativeAggregate` idiom of Spark's own HllSketchAgg.
  */
case class CollectCappedAgg(
    child: Expression,
    cap: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[CollectCappedAgg.Buf]
  with UnaryLike[Expression] {

  require(cap > 0, "cap must be positive")

  override def prettyName: String = "collect_capped"
  override def nullable: Boolean = false
  override def dataType: DataType = StructType(Seq(
    StructField("ids", ArrayType(child.dataType), nullable = false),
    StructField("n", LongType, nullable = false)))

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case LongType | IntegerType | StringType =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"collect_capped supports long/int/string ids, got $other")
    }

  override def createAggregationBuffer(): CollectCappedAgg.Buf =
    new CollectCappedAgg.Buf(ArrayBuffer.empty, 0L)

  override def update(b: CollectCappedAgg.Buf, input: InternalRow): CollectCappedAgg.Buf = {
    val v = child.eval(input)
    if (v != null) {
      b.n += 1
      if (b.ids.length < cap) b.ids += (v match {
        // UTF8String may point into a reused row buffer — copy it
        case s: UTF8String => s.clone()
        case x => x
      })
    }
    b
  }

  override def merge(b: CollectCappedAgg.Buf, o: CollectCappedAgg.Buf): CollectCappedAgg.Buf = {
    b.n += o.n
    val room = cap - b.ids.length
    if (room > 0) b.ids ++= o.ids.take(room)
    b
  }

  override def eval(b: CollectCappedAgg.Buf): Any =
    InternalRow(new GenericArrayData(b.ids.toArray), b.n)

  override def serialize(b: CollectCappedAgg.Buf): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeLong(b.n)
    out.writeInt(b.ids.length)
    b.ids.foreach {
      case l: java.lang.Long => out.writeLong(l)
      case i: java.lang.Integer => out.writeInt(i)
      case s: UTF8String =>
        val bytes = s.getBytes; out.writeInt(bytes.length); out.write(bytes)
      case other => throw new IllegalStateException(s"unexpected element $other")
    }
    out.flush(); bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): CollectCappedAgg.Buf = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val n = in.readLong()
    val len = in.readInt()
    val ids = ArrayBuffer.empty[Any]
    var i = 0
    while (i < len) {
      ids += (child.dataType match {
        case LongType => java.lang.Long.valueOf(in.readLong())
        case IntegerType => java.lang.Integer.valueOf(in.readInt())
        case StringType =>
          val l = in.readInt(); val b = new Array[Byte](l); in.readFully(b)
          UTF8String.fromBytes(b)
        case other => throw new IllegalStateException(s"unexpected type $other")
      })
      i += 1
    }
    new CollectCappedAgg.Buf(ids, n)
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): CollectCappedAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): CollectCappedAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): CollectCappedAgg =
    copy(child = newChild)
}

object CollectCappedAgg {
  final class Buf(val ids: ArrayBuffer[Any], var n: Long)

  /** Column API: `df.agg(collect_capped($"id", 10000))`. */
  def collect_capped(c: Column, cap: Int): Column =
    ExpressionUtils.column(
      CollectCappedAgg(ExpressionUtils.expression(c), cap).toAggregateExpression())
}
