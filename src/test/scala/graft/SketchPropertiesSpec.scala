package graft

import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.{BloomSet, FreqSketch}
import graft.operators.Cdc

/** Top-level so Spark can derive a product encoder (inner case classes
  * can't be encoded — the outer pointer breaks TypeTag resolution). */
case class CdcChg(k: Long, seq: Long, ts: Long, payload: String, op: String)

/** ScalaCheck properties for the round-8 summary/merge operators on
  * ARBITRARY generated inputs (raw Gen sampling — the scalatest bridge
  * artifact isn't available offline, same pattern as PropertiesSpec):
  * the Misra–Gries error contract must hold for every distribution and
  * partitioning, bloom membership must never produce a false negative,
  * and CDC apply must equal a reference in-memory fold. */
class SketchPropertiesSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  // --- Misra–Gries: contract on arbitrary skew/arrival orders ----------

  private val streamGen: Gen[List[String]] = for {
    n <- Gen.chooseNum(50, 400)
    vocab <- Gen.chooseNum(3, 40)
    items <- Gen.listOfN(n, Gen.chooseNum(0, vocab).map(i => s"w$i"))
  } yield items

  test("MG contract holds on random streams and partitionings") {
    for (seed <- 1 to 8) {
      val items = streamGen.pureApply(Gen.Parameters.default, Seed(seed.toLong))
      val k = 2 + seed % 7
      val parts = 1 + seed % 5
      val row = items.toDF("item").repartition(parts)
        .agg(FreqSketch.mgSketch(col("item"), k).as("sk"))
        .agg(FreqSketch.mgMerge(col("sk"), k).as("s"))
        .select(col("s.items"), col("s.d"), col("s.n")).head()
      val ests = row.getSeq[org.apache.spark.sql.Row](0)
        .map(r => r.getString(0) -> r.getLong(1)).toMap
      val (d, n) = (row.getLong(1), row.getLong(2))
      val exact = items.groupBy(identity).view.mapValues(_.size.toLong).toMap
      assert(n == items.size, s"seed=$seed n")
      assert(d * k <= n, s"seed=$seed d=$d > n/k")
      assert(ests.size <= k - 1, s"seed=$seed size")
      assert(ests.keySet.subsetOf(exact.keySet), s"seed=$seed phantom items")
      exact.foreach { case (item, t) =>
        if (t > d) assert(ests.contains(item), s"seed=$seed heavy $item missing")
        ests.get(item).foreach { e =>
          assert(e <= t && t <= e + d, s"seed=$seed $item est=$e true=$t d=$d")
        }
      }
    }
  }

  // --- Bloom: no false negatives on arbitrary key sets -----------------

  test("bloom never false-negatives on random key sets / k / sizes") {
    for (seed <- 1 to 6) {
      val keys = Gen.listOfN(300, Gen.chooseNum(0L, Long.MaxValue / 2))
        .pureApply(Gen.Parameters.default, Seed(seed.toLong)).distinct
      val numBits = 64 << (seed % 8) // 64 .. 8192
      val k = 1 + seed % 6
      val bf = keys.toDF("h")
        .agg(BloomSet.bloomAgg(col("h"), numBits, k).as("bf"))
      val misses = keys.toDF("h").crossJoin(broadcast(bf))
        .filter(!BloomSet.mightContain(col("bf"), col("h"), numBits, k))
        .count()
      assert(misses == 0, s"seed=$seed numBits=$numBits k=$k: $misses false negatives")
    }
  }

  // --- CDC: equivalence with an in-memory reference fold ---------------

  private val chgGen: Gen[List[CdcChg]] = for {
    n <- Gen.chooseNum(0, 120)
    rows <- Gen.listOfN(n, for {
      k <- Gen.chooseNum(0L, 9L)
      ts <- Gen.chooseNum(0L, 15L)
      del <- Gen.prob(0.25)
    } yield (k, ts, del))
  } yield rows.zipWithIndex.map { case ((k, ts, del), i) =>
    CdcChg(k, i.toLong, ts, s"p$i", if (del) "D" else "U")
  }

  test("CDC apply equals the reference last-wins fold on random changelogs") {
    for (seed <- 1 to 8) {
      val changes = chgGen.pureApply(Gen.Parameters.default, Seed(seed.toLong))
      val base = (0L to 4L).map(k => (k, -1L, -1L, s"base$k"))
        .toDF("k", "seq", "ts", "payload")
      val got = Cdc.applyChangelog(base,
        changes.toDF("k", "seq", "ts", "payload", "op"),
        Seq("k"), "ts", "seq", "op")
        .select("k", "payload").collect()
        .map(r => r.getLong(0) -> r.getString(1)).toMap
      // reference: latest change per key by (ts, seq); D deletes
      val latest = changes.groupBy(_.k).view.mapValues(_.maxBy(c => (c.ts, c.seq)))
      val expect = ((0L to 4L).map(k => k -> s"base$k").toMap -- latest.keys) ++
        latest.collect { case (k, c) if c.op != "D" => k -> c.payload }
      assert(got == expect, s"seed=$seed")
    }
  }
}
