package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, ExpectsInputTypes, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.classic.ExpressionUtils
import org.apache.spark.sql.types._

/** Left-fold dot product over two `array<double>` columns, evaluated as one
  * tight primitive loop straight off the ArrayData.
  *
  * Replaces `aggregate(zip_with(a, b, (x, y) => x * y), 0.0, _ + _)` on the
  * similarity hot paths: higher-order functions are CodegenFallback
  * expressions whose lambdas evaluate interpreted per ELEMENT with boxed
  * Doubles and an intermediate GenericArrayData per pair — measured as the
  * dominant cost of the candidate-verification joins (q19/q20/q21), which
  * evaluate one dot per candidate PAIR (~10^5–10^6 pairs), not per row.
  *
  * Bit-identical to the fold it replaces: same element order, same `+`/`*`
  * double arithmetic, and the same null semantics (`acc + null = null`, so
  * ANY null element — including zip_with's padding when lengths differ —
  * nulls the whole result). */
case class ArrayDot(left: Expression, right: Expression)
  extends BinaryExpression with ExpectsInputTypes with CodegenFallback {
  override def inputTypes: Seq[AbstractDataType] =
    Seq(ArrayType(DoubleType), ArrayType(DoubleType))
  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true
  override def prettyName: String = "array_dot"

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val nx = x.numElements()
    val ny = y.numElements()
    // zip_with pads the shorter side with null, and the fold's acc + null
    // nulls out — reproduce exactly
    if (nx != ny) return null
    var acc = 0.0d
    var i = 0
    while (i < nx) {
      if (x.isNullAt(i) || y.isNullAt(i)) return null
      acc += x.getDouble(i) * y.getDouble(i)
      i += 1
    }
    acc
  }

  override protected def withNewChildrenInternal(l: Expression, r: Expression): ArrayDot =
    copy(left = l, right = r)
}

object VectorExpressions {
  def array_dot(a: Column, b: Column): Column =
    ExpressionUtils.column(ArrayDot(ExpressionUtils.expression(a), ExpressionUtils.expression(b)))
}
