package graft.functions

import java.nio.ByteBuffer

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types._

/** Bloom-filter set membership over non-negative LONG keys, built for the
  * broadcast-screen pattern (see [[graft.operators.Decontamination
  * .screenBloom]]): reduce a key set to an m-bit filter (a LONG-word
  * array), broadcast THAT instead of the key set itself, and pre-filter a
  * corpus scan down to bloom-positive candidates before any exact join.
  *
  * Shape choices:
  *  - The filter is a plain `array<long>` column, probed with pure
  *    built-in integer expressions (bit masks / shifts / element_at) — no
  *    UDF, no non-codegen expression in the corpus scan, and the filter
  *    rides along as an ordinary one-row broadcast (the same pattern as
  *    the PageRank scalar broadcasts) rather than needing a scalar
  *    subquery.
  *  - Bit positions use Kirsch–Mitzenmacher double hashing
  *    (idx_i = h1 + i·h2 mod m) off the corpus's existing 60-bit md5 key
  *    — deterministic, engine-portable integer math, consistent between
  *    the build (Scala) and probe (Column) sides, which is what makes
  *    "no false negatives" a hard guarantee rather than a probability.
  *  - The aggregate merges by word-wise OR — commutative, associative,
  *    idempotent — so the built filter is bit-identical under any
  *    partitioning/merge order (unlike a Misra–Gries summary).
  *
  * False positives are expected and must be killed by an exact recheck
  * on the (tiny) candidate set; false negatives are impossible
  * (BloomSetSpec pins both). */
object BloomSet {

  /** Word count for an m-bit filter; m must be a power of two >= 64 so
    * every probe stays pure exact bit math (mask instead of mod — `/` on
    * Columns is DOUBLE division, which would silently lose precision on
    * 60-bit keys and break the no-false-negative guarantee). */
  private def words(numBits: Int): Int = {
    require(numBits >= 64 && Integer.bitCount(numBits) == 1,
      s"numBits must be a power of two >= 64 (got $numBits)")
    numBits / 64
  }

  /** The shared probe-sequence contract (mirrored column-side in
    * [[mightContain]]): h1 = low bits, h2 = an ODD step derived from the
    * high bits (odd ⇒ coprime with the power-of-two m ⇒ the k probes
    * never collapse onto one bit), i-th index = (h1 + i·h2) mod m. h must
    * be non-negative (the repo's hash60-derived keys are). */
  private def probeIdx(h: Long, i: Int, m: Int): Int = {
    val mask = m - 1L
    val h1 = h & mask
    val h2 = (h >>> 21) | 1L
    ((h1 + i * h2) & mask).toInt
  }

  case class BloomAgg(
      child: Expression,
      numBits: Int,
      k: Int,
      mutableAggBufferOffset: Int = 0,
      inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[Array[Long]] with UnaryLike[Expression] {

    override def prettyName: String = "bloom_set_agg"
    override def nullable: Boolean = false
    override def dataType: DataType = ArrayType(LongType, containsNull = false)

    // parameter validation at analysis time, not construction time: Java
    // deserialization on executors builds the instance with default fields
    // first, so a constructor require would throw on valid plans
    override def checkInputDataTypes(): TypeCheckResult =
      if (numBits < 64 || Integer.bitCount(numBits) != 1)
        TypeCheckResult.TypeCheckFailure(
          s"$prettyName numBits must be a power of two >= 64 (got $numBits)")
      else if (k < 1)
        TypeCheckResult.TypeCheckFailure(s"$prettyName needs k >= 1 (got $k)")
      else if (child.dataType != LongType)
        TypeCheckResult.TypeCheckFailure(
          s"$prettyName requires a LONG key, got ${child.dataType.simpleString}")
      else TypeCheckResult.TypeCheckSuccess

    override def createAggregationBuffer(): Array[Long] = new Array[Long](words(numBits))

    override def update(b: Array[Long], row: InternalRow): Array[Long] = {
      val v = child.eval(row)
      if (v != null) {
        val h = v.asInstanceOf[Long]
        require(h >= 0, s"$prettyName requires non-negative keys (got $h)")
        var i = 0
        while (i < k) {
          val idx = probeIdx(h, i, numBits)
          b(idx >> 6) |= 1L << (idx & 63)
          i += 1
        }
      }
      b
    }

    override def merge(b: Array[Long], o: Array[Long]): Array[Long] = {
      var i = 0
      while (i < b.length) { b(i) |= o(i); i += 1 }
      b
    }

    override def eval(b: Array[Long]): Any = new GenericArrayData(b)

    override def serialize(b: Array[Long]): Array[Byte] = {
      val bb = ByteBuffer.allocate(8 * b.length)
      b.foreach(bb.putLong)
      bb.array()
    }
    override def deserialize(bytes: Array[Byte]): Array[Long] = {
      val bb = ByteBuffer.wrap(bytes)
      Array.fill(bytes.length / 8)(bb.getLong)
    }

    override def withNewMutableAggBufferOffset(o: Int): BloomAgg = copy(mutableAggBufferOffset = o)
    override def withNewInputAggBufferOffset(o: Int): BloomAgg = copy(inputAggBufferOffset = o)
    override protected def withNewChildInternal(c: Expression): BloomAgg = copy(child = c)
  }

  /** Build an m-bit bloom filter of every non-null value of `key`. */
  def bloomAgg(key: Column, numBits: Int, k: Int): Column =
    ColumnBridge.column(BloomAgg(ColumnBridge.expression(key), numBits, k)
      .toAggregateExpression())

  /** Membership probe against a filter COLUMN (the one-row broadcast):
    * true iff all k probe bits are set. Pure built-in integer expressions
    * — stays inside whole-stage codegen on the corpus scan. Mirrors
    * [[probeIdx]] exactly; `key` must be non-negative. */
  def mightContain(bf: Column, key: Column, numBits: Int, k: Int): Column = {
    val mask = lit(words(numBits) * 64L - 1L)
    val h1 = key.bitwiseAND(mask)
    val h2 = call_function("shiftrightunsigned", key, lit(21)).bitwiseOR(lit(1L))
    (0 until k).map { i =>
      val idx = (h1 + lit(i.toLong) * h2).bitwiseAND(mask)
      val word = element_at(bf,
        call_function("shiftright", idx, lit(6)).cast("int") + lit(1))
      call_function("shiftright", word, idx.bitwiseAND(lit(63L)).cast("int"))
        .bitwiseAND(lit(1L)) === lit(1L)
    }.reduce(_ && _)
  }
}
