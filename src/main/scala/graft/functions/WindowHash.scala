package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** ALL stride-1 window hashes of a string in ONE linear pass — the
  * byte-slice fast path for the exact-substring dedup family
  * ([[graft.operators.Dedup.substringWindows]]).
  *
  * Why it exists (r17 profile, `substr_profile` in SCALE.md): the composed
  * form `hash60(substr(seg, lp, minLen))` re-walks the segment from byte 0
  * on EVERY window to find the lp-th codepoint, so a segment of S window
  * starts costs O(S²) CPU — measured 7.6× of wall time at the shipped
  * shardChars=8192 on a 16 KB-doc corpus. Here the codepoint→byte offset
  * table is built ONCE per segment (one walk; for ASCII it is the
  * identity and is skipped entirely) and every window is an O(minLen)
  * byte slice into the md5.
  *
  * Value contract: element i (0-based) equals
  * `hash60(substr(seg, i+1, minLen))` EXACTLY — md5 over the identical
  * UTF-8 bytes, first 15 hex digits as a 60-bit long — so the DuckDB
  * oracles (which mirror hash60 as `CAST(concat('0x', substr(md5(w),1,15))
  * AS BIGINT)`) are untouched, and swapping the composed form for this
  * expression is plan-level only (WindowHashSpec pins equality on ASCII
  * and multi-byte inputs). */
case class WindowHashes(child: Expression, minLen: Int)
  extends UnaryExpression {

  require(minLen >= 1, s"minLen $minLen must be positive")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "window_hashes"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case dt => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires STRING, got ${dt.simpleString}")
  }

  override def nullSafeEval(a: Any): Any =
    new GenericArrayData(
      WindowHash.hashes(a.asInstanceOf[UTF8String], minLen))

  /** One static call — the loop lives in [[WindowHash.hashes]], so the
    * generated code stays a single fused line inside whole-stage codegen. */
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      s"""
         |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData(
         |  graft.functions.WindowHash.hashes($a, $minLen));
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): WindowHashes =
    copy(child = newChild)
}

object WindowHash {
  private val md5 = new ThreadLocal[java.security.MessageDigest] {
    override def initialValue(): java.security.MessageDigest =
      java.security.MessageDigest.getInstance("MD5")
  }

  /** hash60 of every stride-1 window of `minLen` chars; empty array when
    * the string is shorter than `minLen`. Linear: one codepoint-offset
    * walk (skipped for ASCII), then an O(minLen) byte slice per window. */
  def hashes(s: UTF8String, minLen: Int): Array[Long] = {
    val bytes = s.getBytes
    val nBytes = bytes.length
    val nChars = s.numChars()
    val nWins = nChars - minLen + 1
    if (nWins <= 0) return Array.emptyLongArray
    val md = md5.get()
    val out = new Array[Long](nWins)
    if (nBytes == nChars) {
      // ASCII: char offsets ARE byte offsets
      var i = 0
      while (i < nWins) {
        md.reset()
        md.update(bytes, i, minLen)
        out(i) = first60Bits(md.digest())
        i += 1
      }
    } else {
      // one walk builds the codepoint -> byte-offset table; offs(k) is the
      // byte offset where char k starts, offs(nChars) = nBytes
      val offs = new Array[Int](nChars + 1)
      var b = 0
      var c = 0
      while (c < nChars) {
        offs(c) = b
        b += UTF8String.numBytesForFirstByte(bytes(b))
        c += 1
      }
      offs(nChars) = nBytes
      var i = 0
      while (i < nWins) {
        md.reset()
        md.update(bytes, offs(i), offs(i + minLen) - offs(i))
        out(i) = first60Bits(md.digest())
        i += 1
      }
    }
    out
  }

  /** The first 15 hex digits of a digest as a long — exactly
    * `conv(substring(hex(digest), 1, 15), 16, 10)`: 7 full bytes
    * big-endian, then the high nibble of byte 7. */
  private def first60Bits(d: Array[Byte]): Long = {
    var v = 0L
    var i = 0
    while (i < 7) {
      v = (v << 8) | (d(i) & 0xffL)
      i += 1
    }
    (v << 4) | ((d(7) >> 4) & 0xfL)
  }

  /** Column of all stride-1 `minLen`-char window hash60s of a STRING. */
  def windowHashes(text: Column, minLen: Int): Column =
    ColumnBridge.column(WindowHashes(ColumnBridge.expression(text), minLen))
}
