package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.FreqSketch

/** Misra–Gries heavy hitters: the properties the oracle gate can't check
  * (it only gates the order-independent error contract — see
  * q_topk_sketch_check) are pinned here on controlled streams: capture of
  * genuine heavy hitters on a zipf-like distribution, the est/d error
  * band, the d ≤ n/k mass bound, merge across arbitrary partitionings,
  * and null/empty handling. */
class FreqSketchSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private val k = 8

  /** Summarize via the real two-phase plan: per-group phase-1 sketches,
    * phase-2 merge — exercising update, serialize/deserialize and merge. */
  private def summarize(items: Seq[String], parts: Int) = {
    val df = items.zipWithIndex
      .map { case (s, i) => (i % parts, s) }.toDF("g", "item")
      .repartition(parts, col("g"))
    val row = df.groupBy(col("g"))
      .agg(FreqSketch.mgSketch(col("item"), k).as("sk"))
      .agg(FreqSketch.mgMerge(col("sk"), k).as("s"))
      .select(col("s.items").as("items"), col("s.d").as("d"), col("s.n").as("n"))
      .head()
    val ests = row.getSeq[org.apache.spark.sql.Row](0)
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    (ests, row.getLong(1), row.getLong(2))
  }

  /** zipf-ish: item i (1-based) appears 2000/i times, 40 distinct items. */
  private val zipf: Seq[String] =
    (1 to 40).flatMap(i => Seq.fill(2000 / i)(f"item$i%02d"))
  private val exact: Map[String, Int] =
    zipf.groupBy(identity).view.mapValues(_.size).toMap

  test("zipf stream: every item heavier than d is captured, in band") {
    for (parts <- Seq(1, 7)) {
      val (ests, d, n) = summarize(scala.util.Random.shuffle(zipf), parts)
      assert(n == zipf.size, "n must be the exact total mass")
      assert(d * k <= n, s"d=$d must be <= n/k=${n / k}")
      exact.foreach { case (item, t) =>
        if (t > d) {
          assert(ests.contains(item), s"heavy $item (true=$t > d=$d) missing")
        }
        ests.get(item).foreach { e =>
          assert(e <= t && t <= e + d, s"$item: est=$e not in [${t - d}, $t]")
        }
      }
      // the distribution's genuinely heavy head is found
      assert(ests.contains("item01") && ests.contains("item02"))
    }
  }

  test("reported items never include something unseen; size bounded by k-1") {
    val (ests, _, _) = summarize(zipf, 5)
    assert(ests.size <= k - 1)
    assert(ests.keySet.subsetOf(exact.keySet))
  }

  test("nulls are skipped, not counted into n") {
    val df = (Seq.fill(50)(Some("a")) ++ Seq.fill(30)(Option.empty[String]) ++
      Seq.fill(20)(Some("b"))).toDF("item")
    val row = df.agg(FreqSketch.mgSketch(col("item"), k).as("sk"))
      .agg(FreqSketch.mgMerge(col("sk"), k).as("s"))
      .select(col("s.n"), col("s.d"), col("s.items")).head()
    assert(row.getLong(0) == 70)
    assert(row.getLong(1) == 0) // 2 distinct < k: no trims, counts exact
    val ests = row.getSeq[org.apache.spark.sql.Row](2)
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(ests == Map("a" -> 50L, "b" -> 20L))
  }

  test("empty input yields an empty summary") {
    val row = Seq.empty[String].toDF("item")
      .agg(FreqSketch.mgSketch(col("item"), k).as("sk"))
      .agg(FreqSketch.mgMerge(col("sk"), k).as("s"))
      .select(col("s.items"), col("s.d"), col("s.n")).head()
    assert(row.getSeq[Any](0).isEmpty && row.getLong(1) == 0 && row.getLong(2) == 0)
  }

  test("items are presented estimate-desc then item-asc") {
    val (_, _, _) = summarize(zipf, 3) // warm
    val items = spark.createDataset(zipf).toDF("item")
      .agg(FreqSketch.mgSketch(col("item"), k).as("sk"))
      .agg(FreqSketch.mgMerge(col("sk"), k).as("s"))
      .select(col("s.items")).head().getSeq[org.apache.spark.sql.Row](0)
      .map(r => (r.getString(0), r.getLong(1)))
    val resorted = items.sortBy { case (i, c) => (-c, i) }
    assert(items == resorted)
  }
}
