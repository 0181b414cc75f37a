package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{Chunking, Packing, RangeJoin, Sampling}

/** Invariants for sequence packing, the binned range join, and exact-N
  * stratified sampling that the oracle gate can't express: offsets form a
  * gap-free token layout, the join plans as an equi-join (not a nested
  * loop), and the per-stratum counts are exact. */
class PackingRangeSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  test("packing: offsets are a gap-free prefix sum in (doc_id, chunk_id) order") {
    val docs = (0 until 50)
      .map(i => (i.toLong, (1 to (10 + i % 37)).map(k => s"t$k").mkString(" ")))
      .toDF("doc_id", "text")
    val packed = Packing.pack(Chunking.chunk(docs, 8, 8), seqLen = 16,
      docsPerBucket = 7) // several buckets, uneven boundaries
    val rows = packed.orderBy("doc_id", "chunk_id").collect()
    var expected = 0L
    rows.foreach { r =>
      assert(r.getAs[Long]("global_offset") == expected,
        s"gap at doc ${r.getAs[Long]("doc_id")} chunk ${r.getAs[Long]("chunk_id")}")
      expected += r.getAs[Long]("n_chunk_tokens")
      val off = r.getAs[Long]("global_offset")
      assert(r.getAs[Long]("seq_id") == off / 16)
      assert(r.getAs[Long]("seq_offset") == off % 16)
      assert(r.getAs[Boolean]("spans_seq") ==
        (off % 16 + r.getAs[Long]("n_chunk_tokens") > 16))
    }
    // bucketing is an internal detail: a different bucket size gives the
    // same layout
    val other = Packing.pack(Chunking.chunk(docs, 8, 8), seqLen = 16,
      docsPerBucket = 1000)
    assert(other.orderBy("doc_id", "chunk_id").collect().toSeq == rows.toSeq)
  }

  test("range join matches the naive join and plans bucketed, not nested-loop") {
    val ev = (0 until 500).map(i =>
      (i.toLong, new java.sql.Timestamp(1700000000000L + i * 60000L), i * 1.5))
      .toDF("event_id", "ts", "value")
    val iv = Seq(
      (1L, new java.sql.Timestamp(1700000000000L + 100 * 60000L),
        new java.sql.Timestamp(1700000000000L + 130 * 60000L)),
      (2L, new java.sql.Timestamp(1700000000000L + 400 * 60000L),
        new java.sql.Timestamp(1700000000000L + 700 * 60000L)) // past the end
    ).toDF("interval_id", "lo", "hi")
    val binned = RangeJoin.binned(ev, col("ts"), iv, col("lo"), col("hi"),
      bucketWidthUs = 10L * 60 * 1000000)
    val naive = ev.join(iv, col("ts") >= col("lo") && col("ts") < col("hi"))
    val got = binned.select("event_id", "interval_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val want = naive.select("event_id", "interval_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got == want)
    assert(want.count(_._2 == 1L) == 30 && want.count(_._2 == 2L) == 100)
    // the scale point: candidates come from an equi-join on the bucket id
    val plan = binned.queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin") && !plan.contains("CartesianProduct"),
      s"range join fell back to a nested loop:\n$plan")
    val naivePlan = naive.queryExecution.executedPlan.toString
    assert(naivePlan.contains("BroadcastNestedLoopJoin")) // what we're avoiding
  }

  test("exact-N stratified sample: exact counts, deterministic, nested in hash order") {
    val docs = (0 until 1000).map(i =>
      (i.toLong, if (i % 3 == 0) "en" else if (i % 3 == 1) "de" else "fr"))
      .toDF("doc_id", "lang")
    val n25 = Sampling.stratifiedExactN(docs, col("doc_id"), col("lang"), "s1:", 25)
    val counts = n25.groupBy("lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(counts == Map("en" -> 25L, "de" -> 25L, "fr" -> 25L))
    // rank caps at stratum size when n exceeds it
    val big = Sampling.stratifiedExactN(docs, col("doc_id"), col("lang"), "s1:", 5000)
    assert(big.count() == 1000L)
    // smaller n is a prefix of larger n under the same salt
    val ids10 = Sampling.stratifiedExactN(docs, col("doc_id"), col("lang"), "s1:", 10)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    val ids25 = n25.select("doc_id").collect().map(_.getLong(0)).toSet
    assert(ids10.subsetOf(ids25))
  }
}
