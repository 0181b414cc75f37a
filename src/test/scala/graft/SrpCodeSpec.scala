package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.SrpCode
import graft.operators.Similarity

/** Property checks for the SrpBandKeys native expression against a plain
  * Scala reference built from the same md5 planes — the expression is the
  * one piece of the LSH path with hand-written eval AND codegen, so both
  * key layout (plane p → band p/bb, bit p mod bb) and fold order must be
  * pinned independently of the query-level oracles. */
class SrpCodeSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  /** Reference: left-to-right double fold per plane, little-endian bit
    * packing per band — straight from the documented contract. */
  private def reference(v: Array[Float], bandBits: Int, nBands: Int,
      dim: Int): Array[Int] = {
    val planes = Similarity.srpPlanes(nBands * bandBits, dim)
    val keys = new Array[Int](nBands)
    for (p <- 0 until nBands * bandBits) {
      var acc = 0.0
      for (i <- 0 until math.min(v.length, dim))
        acc += v(i).toDouble * planes(p)(i).toDouble
      if (acc >= 0) keys(p / bandBits) |= 1 << (p % bandBits)
    }
    keys
  }

  private def viaExpression(vs: Seq[Array[Float]], bandBits: Int,
      nBands: Int, dim: Int): Seq[Seq[Int]] = {
    val s = spark
    import s.implicits._
    vs.zipWithIndex.map { case (v, i) => (i.toLong, v) }
      .toDF("vec_id", "embedding")
      .select(col("vec_id"),
        SrpCode.bandKeys(col("embedding"), bandBits, nBands, dim).as("code"))
      .orderBy("vec_id").collect().map(_.getSeq[Int](1)).toSeq
  }

  test("band keys match the md5-plane reference across widths and inputs") {
    // deterministic pseudo-random vectors, including near-zero dots
    // (the sign boundary) via tiny magnitudes and exact zeros
    def vec(seed: Int, dim: Int): Array[Float] = Array.tabulate(dim) { d =>
      val h = java.security.MessageDigest.getInstance("MD5")
        .digest(s"v:$seed:$d".getBytes("UTF-8"))
      if ((h(1) & 7) == 0) 0.0f
      else ((((h(0) & 0xff) << 8) | (h(1) & 0xff)) - 32768) / 3276800.0f
    }
    for (bandBits <- Seq(3, 7, 13, 24)) {
      val nBands = Similarity.lshBandsFor(bandBits).min(8) // keep plan small
      val vs = (0 until 40).map(vec(_, 64))
      val got = viaExpression(vs, bandBits, nBands, 64)
      val want = vs.map(v => reference(v, bandBits, nBands, 64).toSeq)
      assert(got == want, s"bandBits=$bandBits nBands=$nBands diverged")
    }
  }

  test("short and overlong embeddings fold min(len, dim) like float_dot") {
    val short = Array.tabulate(10)(i => (i + 1).toFloat)   // len < dim
    val long = Array.tabulate(80)(i => (i + 1).toFloat)    // len > dim
    val got = viaExpression(Seq(short, long), 4, 3, 64)
    assert(got.head == reference(short, 4, 3, 64).toSeq)
    assert(got(1) == reference(long.take(64), 4, 3, 64).toSeq)
  }

  test("null embedding yields a null code, not a crash") {
    val s = spark
    import s.implicits._
    val rows = Seq((0L, Some(Array(1.0f, -1.0f))), (1L, None))
      .toDF("vec_id", "embedding")
      .select(SrpCode.bandKeys(col("embedding"), 3, 2, 2).as("code"))
      .orderBy(col("code").desc_nulls_last).collect()
    assert(!rows.head.isNullAt(0) && rows.last.isNullAt(0))
  }

  test("a null ELEMENT raises loudly, never silently codes as 0.0") {
    // getFloat would coin 0.0 for a null element and mis-bucket the
    // vector; parquet-read arrays are containsNull=true, so the guard
    // must be a runtime raise on the nullable-typed path — and cost
    // nothing when the type already proves non-null elements
    val s = spark
    import s.implicits._
    def chain(t: Throwable): String = Iterator.iterate(t)(_.getCause)
      .takeWhile(_ != null).map(m => String.valueOf(m.getMessage))
      .mkString(" | ")
    val df = Seq((0L, Seq(Option(1.0f), None)),
        (1L, Seq(Option(0.5f), Option(0.25f))))
      .toDF("vec_id", "embedding")
    val e = intercept[Exception] {
      df.select(SrpCode.bandKeys(col("embedding"), 4, 3, 64)).collect()
    }
    assert(chain(e).contains("null element"))
    // clean rows through the SAME nullable-typed column still code fine
    val ok = df.filter(col("vec_id") === 1L)
      .select(SrpCode.bandKeys(col("embedding"), 4, 3, 64)).collect()
    assert(ok.length == 1 && ok.head.getSeq[Int](0).length == 3)
  }
}
