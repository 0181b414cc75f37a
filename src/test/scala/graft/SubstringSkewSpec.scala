package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Dedup

/** Giant-document skew hardening for [[Dedup.substringSpans]]: documents
  * longer than `shardChars` are pre-split into (minLen−1)-overlapped
  * segments and hash-repartitioned BEFORE the stride-1 window explode, so
  * one multi-MB outlier document can no longer turn into a
  * positions-scale straggler inside a single source task.
  *
  * Pins three contracts:
  *   1. sharded output is byte-identical to the unsharded plan, including
  *      spans that straddle segment seams (the (minLen−1) overlap
  *      guarantees exactly-once window coverage; the per-doc run merge
  *      re-joins seam-split runs);
  *   2. a planted ~5 MB document among sf0.001-sized docs yields exactly
  *      the planted spans — one of which crosses a seam and one of which
  *      ends flush at the document tail (short final segment);
  *   3. no single source partition of the window relation holds the giant
  *      document's full window set (the straggler the fix removes), while
  *      the unsharded plan demonstrably does.
  */
class SubstringSkewSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  /** Deterministic unique filler: no two 10-char windows repeat within or
    * across fillers (position-tagged), so planted spans are the ONLY
    * cross-doc duplicates. */
  private def filler(tag: String, n: Int): String = {
    val sb = new StringBuilder(n + 16)
    var i = 0
    while (sb.length < n) { sb.append(tag).append('#').append(i).append('.'); i += 1 }
    sb.substring(0, n)
  }

  test("sharded spans are byte-identical to unsharded, across seams") {
    // shardChars=100, minLen=10: doc 1 is 350 chars → 4 segments.
    // dupA straddles the first seam (starts at 0-based 95, crosses 100);
    // dupB sits flush at the tail (short final segment path).
    val dupA = "SEAMCROSSINGDUPLICATESPAN!!!"           // 28 chars
    val dupB = "TAILFLUSHDUPLICATE"                     // 18 chars
    val f = filler("u", 500)
    val giant = f.substring(0, 95) + dupA + f.substring(123, 332) + dupB
    assert(giant.length == 350)
    val d = Seq(
      (1L, giant),
      (2L, "xx" + dupA + "yy"),
      (3L, "zz" + dupB)
    ).toDF("doc_id", "text")
    val sharded = Dedup.substringSpans(d, minLen = 10, shardChars = 100)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).sorted.toSeq
    val unsharded = Dedup.substringSpans(d, minLen = 10, shardChars = 1 << 24)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).sorted.toSeq
    assert(sharded == unsharded, s"sharded=$sharded unsharded=$unsharded")
    // the seam-crossing span survives as ONE merged span (1-based start 96)
    assert(sharded.contains((1L, 96L, 28L)), s"got $sharded")
    // and the tail-flush span is exact (starts at 350-18+1)
    assert(sharded.contains((1L, 333L, 18L)), s"got $sharded")
    assert(sharded == Seq(
      (1L, 96L, 28L), (1L, 333L, 18L),
      (2L, 3L, 28L), (3L, 3L, 18L)), s"got $sharded")
  }

  test("planted 5 MB document: exact spans, and no straggler partition") {
    val minLen = 50
    val S = 8192 // the production default
    val dupA = filler("dupA", 300)  // will straddle the seam at 2*S
    val dupB = filler("dupB", 200)  // flush at the giant doc's tail
    val head = filler("g1", 2 * S - 150)
    val mid = filler("g2", 5 * 1000 * 1000 - head.length - dupA.length - dupB.length)
    val giant = head + dupA + mid + dupB
    assert(giant.length == 5000000)
    val small = (0 until 60).map(i => (10L + i, filler(s"s$i", 800)))
    val d = (Seq(
      (1L, giant),
      (2L, "aa" + dupA + "bb"),
      (3L, dupB + "cc")
    ) ++ small).toDF("doc_id", "text").repartition(8)

    // (3) distribution: sharded window relation spreads the giant doc;
    // the unsharded one concentrates all ~5M of its windows in one task.
    val shardedCounts = Dedup.substringWindows(d, minLen, S)
      .rdd.mapPartitions(it => Iterator(it.length.toLong)).collect()
    val total = shardedCounts.sum
    val giantWins = giant.length - minLen + 1
    assert(total > giantWins) // sanity: all docs' windows present
    // no partition may hold materially more than the uniform share of the
    // shuffle width (the straggler would hold ~all of giantWins)
    val nShuffle = spark.conf.get("spark.sql.shuffle.partitions").toInt
    val uniform = total.toDouble / nShuffle
    assert(shardedCounts.max < uniform * 1.5,
      s"straggler: max partition ${shardedCounts.max} of $total " +
        s"(uniform share ≈ ${uniform.toLong} over $nShuffle partitions)")
    // the unsharded concentration counter-example runs on a SMALLER doc:
    // unsharded substr(p, minLen) scans the string from position 0 every
    // call (UTF8String counts chars byte-wise), so the unsharded plan is
    // O(L²) CPU — on the 5 MB doc that's ~10^13 byte steps. shardChars
    // bounds BOTH the explode amplification AND that quadratic scan (a
    // window's substr never walks past one segment), which is exactly
    // why the production path shards.
    val midDoc = Seq((1L, filler("m", 200000))).toDF("doc_id", "text")
      .repartition(4)
    val unshardedCounts = Dedup.substringWindows(midDoc, minLen, 1 << 24)
      .rdd.mapPartitions(it => Iterator(it.length.toLong)).collect()
    assert(unshardedCounts.max >= 200000 - minLen + 1,
      s"expected the unsharded plan to concentrate the doc " +
        s"(max=${unshardedCounts.max})")

    // (1)+(2) exactness: fillers are position-tagged unique, so the ONLY
    // cross-doc spans are the planted ones — exact starts and lengths.
    val spans = Dedup.substringSpans(d, minLen, S)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).sorted.toSeq
    assert(spans == Seq(
      (1L, (2 * S - 150 + 1).toLong, 300L),
      (1L, (5000000 - 200 + 1).toLong, 200L),
      (2L, 3L, 300L),
      (3L, 1L, 200L)), s"got $spans")
  }
}
