package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.BloomSet
import graft.operators.Decontamination

/** The bloom screen is only sound if (1) membership has NO false
  * negatives (build and probe agree bit-for-bit on the hash sequence),
  * (2) the filter is merge-order independent (word-wise OR), and (3) the
  * prescreened decontamination output is bit-identical to the exact
  * screen (false positives fully killed by the recheck join). */
class BloomSetSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private val numBits = 1 << 12
  private val k = 5

  /** Deterministic 60-bit-ish non-negative keys, hash60-shaped. */
  private def keys(n: Int, salt: Int): Seq[Long] =
    (1 to n).map(i => Math.abs((i * 2654435761L + salt) * 0x9E3779B97F4A7C15L) >>> 4)

  test("no false negatives: every inserted key probes true") {
    val in = keys(2000, 7)
    val bf = in.toDF("h").agg(BloomSet.bloomAgg(col("h"), numBits, k).as("bf"))
    val misses = in.toDF("h").crossJoin(broadcast(bf))
      .filter(!BloomSet.mightContain(col("bf"), col("h"), numBits, k))
      .count()
    assert(misses == 0)
  }

  test("false positive rate is in the expected regime, not degenerate") {
    val in = keys(500, 7) // ~500 keys in 4096 bits, k=5 -> fpp of a few %
    val bf = in.toDF("h").agg(BloomSet.bloomAgg(col("h"), numBits, k).as("bf"))
    val probes = keys(5000, 99999).filterNot(in.toSet) // disjoint from `in`
    val fp = probes.toDF("h").crossJoin(broadcast(bf))
      .filter(BloomSet.mightContain(col("bf"), col("h"), numBits, k))
      .count()
    val rate = fp.toDouble / probes.size
    assert(rate < 0.2, s"fp rate $rate degenerate — probe bits collapsing?")
    assert(rate > 0.0, "zero fp at this load is suspicious — probes dead?")
  }

  test("filter bits are identical under any partitioning (OR merge)") {
    val in = keys(3000, 3)
    def build(parts: Int): Seq[Long] =
      in.toDF("h").repartition(parts)
        .agg(BloomSet.bloomAgg(col("h"), numBits, k).as("bf"))
        .head().getSeq[Long](0)
    assert(build(1) == build(13))
  }

  test("null keys are skipped; empty input gives an all-zero filter") {
    val bf = Seq(Option.empty[Long], Some(42L), None).toDF("h")
      .agg(BloomSet.bloomAgg(col("h"), numBits, k).as("bf")).head().getSeq[Long](0)
    assert(bf.count(_ != 0L) > 0)
    val empty = Seq.empty[Long].toDF("h")
      .agg(BloomSet.bloomAgg(col("h"), numBits, k).as("bf")).head().getSeq[Long](0)
    assert(empty.forall(_ == 0L) && empty.size == numBits / 64)
  }

  test("bloom-prescreened decontamination == exact screen, bit for bit") {
    val docs = sources.Tables.documents(spark, "/root/testdata/sf0.001")
    val pred = pmod(col("doc_id"), lit(10)) === 0
    def canon(df: org.apache.spark.sql.DataFrame) =
      df.orderBy("doc_id").collect().map(_.toSeq).toSeq
    val exact = canon(Decontamination.screen(docs, pred, n = 5, minHits = 1))
    // tiny filter on purpose: high fp pressure exercises the recheck join
    val bloom = canon(Decontamination.screenBloom(docs, pred, n = 5,
      minHits = 1, numBits = 1 << 12, k = 3))
    assert(exact == bloom)
  }
}
