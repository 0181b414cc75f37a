package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.{ArrayType, DataType, FloatType, IntegerType}

/** Sign-random-projection band keys as ONE native expression.
  *
  * The composed alternative — one `when(float_dot(emb, lit(plane)) >= 0, …)`
  * subtree per plane — is linear in plane count in PLAN size: at the widest
  * operating point (24-bit bands × 188 bands = 4512 planes × 64 literal
  * floats each) the expression tree alone OOMs the driver during analysis,
  * long before a row is read. This expression carries the whole plane
  * matrix as a single flat float[] reference object and emits every band
  * key in one tight pass per row: O(1) plan size at any width, one matrix
  * copy per executor, and the loop inlines into whole-stage codegen so the
  * corpus-wide coding scan stays in one fused span.
  *
  * Key layout (mirrored bit-for-bit by the DuckDB oracles): plane
  * p = band·bandBits + j contributes bit j (little-endian) to band key
  * `band`; a plane fires iff the left-to-right double fold of
  * embedding·plane is ≥ 0 — the same fold as [[FloatDotProduct]], so the
  * oracle's ordered `list_reduce` matches in the last ulp.
  */
case class SrpBandKeys(child: Expression, bandBits: Int, nBands: Int, dim: Int)
  extends UnaryExpression {

  require(bandBits >= 1 && bandBits <= 31, s"bandBits $bandBits outside [1,31]")
  require(nBands >= 1, s"nBands $nBands must be positive")

  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def prettyName: String = "srp_band_keys"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType, _) => TypeCheckResult.TypeCheckSuccess
    case dt => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires ARRAY<FLOAT>, got ${dt.simpleString}")
  }

  // getFloat would silently coin 0.0 for a null element, mis-coding the
  // vector; parquet-read arrays are containsNull=true even when the data
  // never is, so reject at RUNTIME with one cheap pre-pass over the dim
  // elements (vs nPlanes×dim in the coding loop) — and skip the guard
  // entirely when the type already proves non-null elements.
  @transient private lazy val needNullGuard: Boolean = child.dataType match {
    case ArrayType(_, cn) => cn
    case _ => true
  }

  private def failNullElement(): Nothing =
    throw new IllegalArgumentException(
      s"$prettyName: embedding contains a null element — null-coined " +
        "codes would silently mis-bucket; filter or impute first")

  @transient private lazy val planes: Array[Float] =
    SrpCode.planesFlat(nBands * bandBits, dim)

  override def nullSafeEval(a: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), dim)
    if (needNullGuard) {
      var i = 0
      while (i < n) {
        if (x.isNullAt(i)) failNullElement()
        i += 1
      }
    }
    val keys = new Array[Int](nBands)
    val total = nBands * bandBits
    var p = 0
    while (p < total) {
      var acc = 0.0
      val off = p * dim
      var i = 0
      while (i < n) {
        acc += x.getFloat(i).toDouble * planes(off + i).toDouble
        i += 1
      }
      if (acc >= 0) keys(p / bandBits) |= 1 << (p % bandBits)
      p += 1
    }
    new GenericArrayData(keys)
  }

  /** Same pass as [[nullSafeEval]] in straight-line Java; the plane matrix
    * rides in as one reference object. */
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val pl = ctx.addReferenceObj("srpPlanes", planes, "float[]")
      val keys = ctx.freshName("keys")
      val n = ctx.freshName("n")
      val p = ctx.freshName("p")
      val i = ctx.freshName("i")
      val acc = ctx.freshName("acc")
      val off = ctx.freshName("off")
      val nullGuard = if (needNullGuard) {
        val g = ctx.freshName("g")
        s"""
           |for (int $g = 0; $g < $n; $g++) {
           |  if ($a.isNullAt($g)) {
           |    throw new IllegalArgumentException(
           |      "srp_band_keys: embedding contains a null element — " +
           |      "null-coined codes would silently mis-bucket; filter " +
           |      "or impute first");
           |  }
           |}
         """.stripMargin
      } else ""
      s"""
         |int[] $keys = new int[$nBands];
         |int $n = java.lang.Math.min($a.numElements(), $dim);
         |$nullGuard
         |for (int $p = 0; $p < ${nBands * bandBits}; $p++) {
         |  double $acc = 0.0;
         |  int $off = $p * $dim;
         |  for (int $i = 0; $i < $n; $i++) {
         |    $acc += ((double) $a.getFloat($i)) * ((double) $pl[$off + $i]);
         |  }
         |  if ($acc >= 0.0) $keys[$p / $bandBits] |= 1 << ($p % $bandBits);
         |}
         |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($keys);
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): SrpBandKeys =
    copy(child = newChild)
}

object SrpCode {
  /** Deterministic Rademacher (±1) hyperplanes for SRP-LSH, derived from
    * md5 so the DuckDB oracle can recompute the exact same matrix with its
    * own md5() (sign = +1 iff the digest's first byte is even). Flat
    * row-major layout: plane p occupies [p·dim, (p+1)·dim). Single source
    * of truth — Similarity.srpPlanes reshapes this. */
  def planesFlat(nPlanes: Int, dim: Int): Array[Float] = {
    val out = new Array[Float](nPlanes * dim)
    val md = java.security.MessageDigest.getInstance("MD5")
    var p = 0
    while (p < nPlanes) {
      var d = 0
      while (d < dim) {
        md.reset()
        val h = md.digest(s"srp:$p:$d".getBytes("UTF-8"))
        out(p * dim + d) = if ((h(0) & 1) == 0) 1.0f else -1.0f
        d += 1
      }
      p += 1
    }
    out
  }

  /** Column of per-band INT keys for an ARRAY<FLOAT> embedding column. */
  def bandKeys(emb: Column, bandBits: Int, nBands: Int, dim: Int): Column =
    ColumnBridge.column(
      SrpBandKeys(ColumnBridge.expression(emb), bandBits, nBands, dim))
}
