package graft

import java.sql.Timestamp

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Incremental

class IncrementalBarsSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def ticks(rows: Seq[(String, Long, Double, Long)]): DataFrame =
    rows.map { case (s, t, p, v) => (s, new Timestamp(t), p, v) }
      .toDF("symbol", "time", "price", "volume")

  private def collectBars(df: DataFrame) =
    Incremental.finalizeBars(df)
      .orderBy("symbol", "time")
      .select("symbol", "open", "high", "low", "close", "volume", "n_ticks")
      .collect().map(_.toSeq).toSeq

  test("merge of arbitrary slices equals the single-pass partial (associativity)") {
    val all = (1 to 300).map(i =>
      (s"S${i % 3}", i * 60000L, 100.0 + (i % 17) * 0.5, (i % 7 + 1).toLong))
    val whole = Incremental.partialBars(ticks(all))
    // three uneven slices, one empty
    val parts = Seq(all.filter(_._2 % 4 == 0), all.filter(_._2 % 4 != 0),
      Seq.empty[(String, Long, Double, Long)])
      .map(s => Incremental.partialBars(ticks(s)))
    val merged = Incremental.mergeBars(parts: _*)
    assert(collectBars(merged) == collectBars(whole))
  }

  test("open/close tie-break on equal timestamps is slice-independent") {
    // two ticks share the bucket-opening timestamp with different prices:
    // struct-min must pick the LOWER price in any slicing
    val a = Seq(("A", 1000L, 5.0, 1L), ("A", 2000L, 7.0, 1L))
    val b = Seq(("A", 1000L, 3.0, 1L), ("A", 2000L, 9.0, 1L))
    val m1 = Incremental.mergeBars(
      Incremental.partialBars(ticks(a)), Incremental.partialBars(ticks(b)))
    val m2 = Incremental.mergeBars(
      Incremental.partialBars(ticks(b)), Incremental.partialBars(ticks(a)))
    val whole = Incremental.partialBars(ticks(a ++ b))
    assert(collectBars(m1) == collectBars(whole))
    assert(collectBars(m2) == collectBars(whole))
    val r = collectBars(whole).head
    assert(r(1) == 3.0) // open: tie at t=1000 → lower price
    assert(r(4) == 9.0) // close: tie at t=2000 → higher price
  }
}
