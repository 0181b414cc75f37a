package graft

import java.sql.Timestamp

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{EventAnalytics, Sampling}

class SplitScd2Spec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  test("splitBy is disjoint, exhaustive, deterministic, and near the target fractions") {
    val df = (1L to 20000L).toDF("id")
    val cuts = Seq("train" -> 0.9, "val" -> 0.05, "test" -> 0.05)
    val a = df.select(col("id"), Sampling.splitBy(col("id"), "s:", cuts).as("split"))
    val counts = a.groupBy("split").count().as[(String, Long)].collect().toMap
    assert(counts.keySet == Set("train", "val", "test")) // exhaustive, disjoint by construction
    assert(counts.values.sum == 20000L)
    assert(math.abs(counts("train") - 18000.0) / 18000.0 < 0.05)
    assert(math.abs(counts("val") - 1000.0) / 1000.0 < 0.2)
    // deterministic: same salt → same assignment
    val b = df.select(Sampling.splitBy(col("id"), "s:", cuts).as("split")).collect()
    assert(a.select("split").collect().map(_.getString(0)).toSeq ==
      b.map(_.getString(0)).toSeq)
  }

  test("scd2 collapses no-change events and closes intervals at the next change") {
    def ts(m: Int) = Timestamp.valueOf(f"2024-01-01 00:$m%02d:00")
    val events = Seq(
      (1L, 1L, ts(1), "A"), (2L, 1L, ts(2), "A"), // no-change: stays version 1
      (3L, 1L, ts(3), "B"), (4L, 1L, ts(4), "A"), // re-change back to A opens v3
      (5L, 2L, ts(1), "X")
    ).toDF("event_id", "user_id", "ts", "event_type")
    val out = EventAnalytics.scd2(events, "user_id", "event_type")
      .orderBy("user_id", "version")
      .as[(Long, String, Long, Timestamp, Option[Timestamp], Boolean)].collect()
    assert(out.map(r => (r._1, r._2, r._3)).toSeq ==
      Seq((1L, "A", 1L), (1L, "B", 2L), (1L, "A", 3L), (2L, "X", 1L)))
    // intervals chain: v1 closes when v2 opens; last version open
    assert(out(0)._4 == ts(1) && out(0)._5.contains(ts(3)) && !out(0)._6)
    assert(out(1)._5.contains(ts(4)))
    assert(out(2)._5.isEmpty && out(2)._6)
    assert(out(3)._5.isEmpty && out(3)._6)
  }
}
