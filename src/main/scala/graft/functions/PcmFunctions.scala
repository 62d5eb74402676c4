package org.apache.spark.sql.graft

import graft.audio.Audio
import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpectsInputTypes, TernaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.classic.ExpressionUtils
import org.apache.spark.sql.types.{AbstractDataType, BinaryType, BooleanType, DataType, DoubleType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Audio payload predicates as native Catalyst expressions.
  *
  * This is the engine's version of the reference's deep-equality change
  * predicate `!Objects.equals(incoming.originalAttributes, stored.original
  * Attributes)` (service/SourceSystemDataCheckerService.java:141-146),
  * recast per BASELINE.json `input_hint` as decoded-PCM allclose at
  * SNR ≥ 30 dB. Implemented as `Expression`s (not Scala UDFs) so they
  * evaluate directly over `InternalRow` without encoder round trips;
  * `CodegenFallback` is fine — the surrounding plan still whole-stage
  * codegens and the per-row work is dominated by the decode loop itself.
  */
case class PcmSnr(codec: Expression, ref: Expression, test: Expression)
  extends TernaryExpression with ExpectsInputTypes with CodegenFallback {
  override def first: Expression = codec
  override def second: Expression = ref
  override def third: Expression = test
  override def inputTypes: Seq[AbstractDataType] = Seq(StringType, BinaryType, BinaryType)
  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true
  override def prettyName: String = "pcm_snr_db"

  override def nullSafeEval(c: Any, a: Any, b: Any): Any = {
    val codecStr = c.asInstanceOf[UTF8String].toString
    val ra = a.asInstanceOf[Array[Byte]]
    val rb = b.asInstanceOf[Array[Byte]]
    // fused per-sample decode: zero allocation on the per-row hot path
    Audio.snrDbCoded(codecStr, ra, rb)
  }

  override protected def withNewChildrenInternal(
      f: Expression, s: Expression, t: Expression): PcmSnr = copy(f, s, t)
}

/** True when the two payloads decode to "the same" audio: byte-equal fast
  * path (no decode), else SNR ≥ `minSnrDb`. */
case class PcmAllclose(codec: Expression, ref: Expression, test: Expression, minSnrDb: Double = 30.0)
  extends TernaryExpression with ExpectsInputTypes with CodegenFallback {
  override def first: Expression = codec
  override def second: Expression = ref
  override def third: Expression = test
  override def inputTypes: Seq[AbstractDataType] = Seq(StringType, BinaryType, BinaryType)
  override def dataType: DataType = BooleanType
  override def nullable: Boolean = true
  override def prettyName: String = "pcm_allclose"

  override def nullSafeEval(c: Any, a: Any, b: Any): Any = {
    val ra = a.asInstanceOf[Array[Byte]]
    val rb = b.asInstanceOf[Array[Byte]]
    if (java.util.Arrays.equals(ra, rb)) true
    else {
      val codecStr = c.asInstanceOf[UTF8String].toString
      Audio.snrDbCoded(codecStr, ra, rb) >= minSnrDb
    }
  }

  override protected def withNewChildrenInternal(
      f: Expression, s: Expression, t: Expression): PcmAllclose =
    copy(codec = f, ref = s, test = t)
}

object PcmFunctions {
  def pcm_snr_db(codec: Column, ref: Column, test: Column): Column =
    ExpressionUtils.column(PcmSnr(
      ExpressionUtils.expression(codec),
      ExpressionUtils.expression(ref),
      ExpressionUtils.expression(test)))

  def pcm_allclose(codec: Column, ref: Column, test: Column, minSnrDb: Double = 30.0): Column =
    ExpressionUtils.column(PcmAllclose(
      ExpressionUtils.expression(codec),
      ExpressionUtils.expression(ref),
      ExpressionUtils.expression(test), minSnrDb))
}
