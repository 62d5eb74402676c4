package org.apache.spark.sql.graft

import java.io.ByteArrayOutputStream
import java.util.zip.{GZIPInputStream, GZIPOutputStream}

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.classic.ExpressionUtils
import org.apache.spark.sql.types.{AbstractDataType, BinaryType, DataType}

/** Wire-compression codecs as native Catalyst expressions — the engine's
  * analog of the reference's gzip message converter
  * (component/MessageCompressionComponent.java:26-36,62-78), which inflates
  * every consumed payload and deflates every published one. Implemented as
  * `Expression`s (not Scala UDFs) so they evaluate straight off
  * `InternalRow`; `CodegenFallback` is fine — the per-row work is the
  * deflate/inflate loop itself. */
case class GzipCompress(child: Expression)
  extends UnaryExpression with ExpectsInputTypes with CodegenFallback {
  override def inputTypes: Seq[AbstractDataType] = Seq(BinaryType)
  override def dataType: DataType = BinaryType
  override def prettyName: String = "gzip_compress"
  override def nullSafeEval(in: Any): Any = {
    val bos = new ByteArrayOutputStream()
    val gz = new GZIPOutputStream(bos, 8192)
    gz.write(in.asInstanceOf[Array[Byte]])
    gz.close()
    bos.toByteArray
  }
  override protected def withNewChildInternal(c: Expression): GzipCompress = copy(c)
}

case class GzipDecompress(child: Expression)
  extends UnaryExpression with ExpectsInputTypes with CodegenFallback {
  override def inputTypes: Seq[AbstractDataType] = Seq(BinaryType)
  override def dataType: DataType = BinaryType
  override def prettyName: String = "gzip_decompress"
  override def nullSafeEval(in: Any): Any = {
    val gz = new GZIPInputStream(
      new java.io.ByteArrayInputStream(in.asInstanceOf[Array[Byte]]), 8192)
    try gz.readAllBytes() finally gz.close()
  }
  override protected def withNewChildInternal(c: Expression): GzipDecompress = copy(c)
}

object CodecExpressions {
  def gzip_compress(c: Column): Column =
    ExpressionUtils.column(GzipCompress(ExpressionUtils.expression(c)))
  def gzip_decompress(c: Column): Column =
    ExpressionUtils.column(GzipDecompress(ExpressionUtils.expression(c)))
}
