package graft.functions

import java.nio.ByteBuffer
import java.nio.charset.StandardCharsets

import scala.collection.mutable

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Mergeable heavy-hitters (frequent-items) sketch: Misra–Gries summaries
  * as native Catalyst imperative aggregates, completing the sketch family
  * next to HLL (distinct count) and KLL (quantiles) — the third leg of the
  * 100 TB "reduce once, roll up forever" architecture. Exact top-k over an
  * unknown key space needs a full shuffle of every distinct key; the MG
  * summary is O(k) per partition/group, pre-aggregates map-side, persists
  * as a binary column, and merges associatively (Agarwal et al., Mergeable
  * Summaries, PODS'12).
  *
  * Error contract carried IN the sketch: `d` is the total mass subtracted
  * by trims. For every reported item, `est ≤ true ≤ est + d`; any item
  * with `true > d` is guaranteed present; and `d ≤ n/k`. These hold under
  * arbitrary merge trees, which is what the oracle-checked companion
  * (q_topk_sketch_check) asserts. The exact ITEM COUNTS in a summary are
  * arrival/merge-order dependent (unlike HLL's register-max union), so
  * only the contract — not the estimates — is hash-gated; the zipf-stream
  * capture property is pinned in FreqSketchSpec.
  */
object FreqSketch {

  /** n = total mass seen, d = total mass trimmed away, counts ≤ k−1. */
  final class MgBuf(var n: Long, var d: Long,
      val counts: mutable.HashMap[String, Long])

  val itemType: StructType = StructType(Seq(
    StructField("item", StringType, nullable = false),
    StructField("est", LongType, nullable = false)))
  val summaryType: StructType = StructType(Seq(
    StructField("items", ArrayType(itemType, containsNull = false), nullable = false),
    StructField("d", LongType, nullable = false),
    StructField("n", LongType, nullable = false)))

  private def newBuf() = new MgBuf(0L, 0L, mutable.HashMap.empty)

  /** Add `c` mass of `item`; trim back to k−1 counters if the insert grew
    * the map past capacity. Covers both the single-row update (c = 1) and
    * map-merge cases; the trim subtracts the k-th largest counter from all
    * (the classic decrement-all step generalized to weighted arrivals). */
  private def add(b: MgBuf, k: Int, item: String, c: Long): Unit = {
    b.n += c
    b.counts.updateWith(item) {
      case Some(v) => Some(v + c)
      case None => Some(c)
    }
    if (b.counts.size > k - 1) {
      val vals = b.counts.values.toArray
      java.util.Arrays.sort(vals)
      val t = vals(vals.length - k) // k-th largest: >= 1 entry hits zero
      b.d += t
      b.counts.filterInPlace((_, v) => v > t)
      b.counts.mapValuesInPlace((_, v) => v - t)
    }
  }

  private def mergeInto(b: MgBuf, o: MgBuf, k: Int): Unit = {
    b.d += o.d
    o.counts.foreach { case (item, c) => add(b, k, item, c) }
    b.n += o.n - o.counts.valuesIterator.sum // add() already counted map mass
  }

  private def ser(b: MgBuf): Array[Byte] = {
    val entries = b.counts.toSeq.map { case (s, c) =>
      (s.getBytes(StandardCharsets.UTF_8), c)
    }
    val bb = ByteBuffer.allocate(20 + entries.map(_._1.length + 12).sum)
    bb.putLong(b.n); bb.putLong(b.d); bb.putInt(entries.size)
    entries.foreach { case (bytes, c) =>
      bb.putInt(bytes.length); bb.put(bytes); bb.putLong(c)
    }
    bb.array()
  }

  private def deser(bytes: Array[Byte]): MgBuf = {
    val bb = ByteBuffer.wrap(bytes)
    val b = newBuf()
    b.n = bb.getLong; b.d = bb.getLong
    var rem = bb.getInt
    while (rem > 0) {
      val len = bb.getInt
      val sb = new Array[Byte](len); bb.get(sb)
      b.counts(new String(sb, StandardCharsets.UTF_8)) = bb.getLong
      rem -= 1
    }
    b
  }

  /** Deterministic presentation order: estimate desc, then item. */
  private def toStruct(b: MgBuf): InternalRow = {
    val items = b.counts.toSeq.sortBy { case (i, c) => (-c, i) }
      .map { case (i, c) => InternalRow(UTF8String.fromString(i), c) }
    InternalRow(new GenericArrayData(items), b.d, b.n)
  }

  abstract class MgBase extends TypedImperativeAggregate[MgBuf] {
    def k: Int
    // k is validated in checkInputDataTypes, NOT with a constructor
    // require: Java deserialization on executors instantiates the case
    // class with default fields before restoring them, so a constructor
    // check would throw on a perfectly valid plan.
    protected def checkK(ok: => TypeCheckResult): TypeCheckResult =
      if (k >= 2) ok
      else TypeCheckResult.TypeCheckFailure(s"$prettyName needs k >= 2 (got $k)")
    override def nullable: Boolean = false
    override def createAggregationBuffer(): MgBuf = newBuf()
    override def merge(b: MgBuf, o: MgBuf): MgBuf = { mergeInto(b, o, k); b }
    override def serialize(b: MgBuf): Array[Byte] = ser(b)
    override def deserialize(bytes: Array[Byte]): MgBuf = deser(bytes)
  }

  /** Phase 1: STRING items → binary MG summary (the persistable column). */
  case class MgSketchAgg(
      child: Expression,
      k: Int,
      mutableAggBufferOffset: Int = 0,
      inputAggBufferOffset: Int = 0)
    extends MgBase with UnaryLike[Expression] {

    override def prettyName: String = "mg_sketch"
    override def dataType: DataType = BinaryType

    override def checkInputDataTypes(): TypeCheckResult = checkK {
      if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
      else TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires a STRING item, got ${child.dataType.simpleString}")
    }

    override def update(b: MgBuf, row: InternalRow): MgBuf = {
      val v = child.eval(row)
      if (v != null) add(b, k, v.asInstanceOf[UTF8String].toString, 1L)
      b
    }
    override def eval(b: MgBuf): Any = ser(b)

    override def withNewMutableAggBufferOffset(o: Int): MgSketchAgg = copy(mutableAggBufferOffset = o)
    override def withNewInputAggBufferOffset(o: Int): MgSketchAgg = copy(inputAggBufferOffset = o)
    override protected def withNewChildInternal(c: Expression): MgSketchAgg = copy(child = c)
  }

  /** Phase 2: merge binary summaries → struct(items, d, n). Runs against
    * the persisted sketch table only, so rollups never rescan raw data. */
  case class MgMergeAgg(
      child: Expression,
      k: Int,
      mutableAggBufferOffset: Int = 0,
      inputAggBufferOffset: Int = 0)
    extends MgBase with UnaryLike[Expression] {

    override def prettyName: String = "mg_merge"
    override def dataType: DataType = summaryType

    override def checkInputDataTypes(): TypeCheckResult = checkK {
      if (child.dataType == BinaryType) TypeCheckResult.TypeCheckSuccess
      else TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires a BINARY mg_sketch, got ${child.dataType.simpleString}")
    }

    override def update(b: MgBuf, row: InternalRow): MgBuf = {
      val v = child.eval(row)
      if (v != null) mergeInto(b, deser(v.asInstanceOf[Array[Byte]]), k)
      b
    }
    override def eval(b: MgBuf): Any = toStruct(b)

    override def withNewMutableAggBufferOffset(o: Int): MgMergeAgg = copy(mutableAggBufferOffset = o)
    override def withNewInputAggBufferOffset(o: Int): MgMergeAgg = copy(inputAggBufferOffset = o)
    override protected def withNewChildInternal(c: Expression): MgMergeAgg = copy(child = c)
  }

  def mgSketch(item: Column, k: Int): Column =
    ColumnBridge.column(MgSketchAgg(ColumnBridge.expression(item), k)
      .toAggregateExpression())

  def mgMerge(sketch: Column, k: Int): Column =
    ColumnBridge.column(MgMergeAgg(ColumnBridge.expression(sketch), k)
      .toAggregateExpression())
}
