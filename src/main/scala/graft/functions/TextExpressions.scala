package org.apache.spark.sql.graft

import graft.audio.Audio
import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.classic.ExpressionUtils
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** 64-bit SimHash over a token array: each token hashes to 64 bits
  * (SplitMix64-mixed FNV), each bit votes ±1, the sign vector is the
  * fingerprint. Near-duplicate docs differ in few bits (small Hamming
  * distance). Native expression — evaluates straight off the ArrayData,
  * no encoder round trip. */
case class SimHash64(child: Expression)
  extends UnaryExpression with ExpectsInputTypes with CodegenFallback {
  override def inputTypes: Seq[AbstractDataType] = Seq(ArrayType(StringType))
  override def dataType: DataType = LongType
  override def prettyName: String = "simhash64"

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val votes = new Array[Int](64)
    var i = 0
    while (i < arr.numElements()) {
      if (!arr.isNullAt(i)) {
        val h = Audio.splitmix64(Audio.clipKey(arr.getUTF8String(i).toString))
        var b = 0
        while (b < 64) {
          if (((h >>> b) & 1L) == 1L) votes(b) += 1 else votes(b) -= 1
          b += 1
        }
      }
      i += 1
    }
    var out = 0L
    var b = 0
    while (b < 64) { if (votes(b) > 0) out |= (1L << b); b += 1 }
    out
  }

  override protected def withNewChildInternal(newChild: Expression): SimHash64 =
    copy(child = newChild)
}

/** Polynomial rolling-hash document fingerprint (base-257 over UTF-8 bytes,
  * mod 2^61-1): stable across runs/partitions, cheap, order-sensitive —
  * the exact-content fingerprint for dedup keys. */
case class Fingerprint64(child: Expression)
  extends UnaryExpression with ExpectsInputTypes with CodegenFallback {
  override def inputTypes: Seq[AbstractDataType] = Seq(StringType)
  override def dataType: DataType = LongType
  override def prettyName: String = "fingerprint64"

  private val Mod = (1L << 61) - 1

  override def nullSafeEval(input: Any): Any = {
    val bytes = input.asInstanceOf[UTF8String].getBytes
    var h = 0L
    var i = 0
    while (i < bytes.length) {
      // (h * 257 + b) mod 2^61-1, without overflow: split the multiply
      h = mulMod(h, 257L) + (bytes(i) & 0xFF) + 1L
      if (h >= Mod) h -= Mod
      i += 1
    }
    h
  }

  @inline private def mulMod(a: Long, b: Long): Long = {
    // a < 2^61, b ≤ 257: a*b < 2^70 overflows a long, so split a at 35 bits
    // and fold the shifts with 2^61 ≡ 1 (mod 2^61-1). Every intermediate
    // stays < 2^62 — a naive ((hi*b) % Mod) << 35 would overflow at 2^69.
    val hi = a >>> 35                  // < 2^26
    val lo = a & ((1L << 35) - 1)
    val t = hi * b                     // < 2^35
    val t1 = t >>> 26                  // < 2^9
    val t0 = t & ((1L << 26) - 1)
    var r = t1 + (t0 << 35)            // ≡ hi·b·2^35 (mod M), < 2^61 + 2^9
    if (r >= Mod) r -= Mod
    r += lo * b                        // lo·b < 2^44
    if (r >= Mod) r -= Mod
    r
  }

  override protected def withNewChildInternal(newChild: Expression): Fingerprint64 =
    copy(child = newChild)
}

object TextExpressions {
  def simhash64(tokens: Column): Column =
    ExpressionUtils.column(SimHash64(ExpressionUtils.expression(tokens)))
  def fingerprint64(text: Column): Column =
    ExpressionUtils.column(Fingerprint64(ExpressionUtils.expression(text)))
}
