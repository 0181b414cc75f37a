package graft

import java.sql.Timestamp

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Resample

class ResampleSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def t(h: Int) = new Timestamp(1700000000000L / 3600000L * 3600000L + h * 3600000L)

  test("ffill fills gaps with the last observation and flags manufactured rows") {
    // symbol A observed at hours 0,1,4; B at hours 2,3 — gaps at A:2,3
    val df = Seq(
      ("A", t(0), 10.0, 5L), ("A", t(1), 11.0, 6L), ("A", t(4), 14.0, 9L),
      ("B", t(2), 20.0, 1L), ("B", t(3), 21.0, 2L)
    ).toDF("symbol", "time", "close", "volume")

    val out = Resample.ffill(df, "symbol", "time", "1 hour", Seq("close", "volume"))
      .orderBy("symbol", "time").collect()

    assert(out.length == 7) // A: hours 0-4 (5 rows), B: hours 2-3 (2 rows)
    val a = out.filter(_.getString(0) == "A")
    assert(a.map(_.getDouble(2)).toSeq == Seq(10.0, 11.0, 11.0, 11.0, 14.0))
    assert(a.map(_.getLong(3)).toSeq == Seq(5L, 6L, 6L, 6L, 9L))
    assert(a.map(_.getInt(4)).toSeq == Seq(0, 0, 1, 1, 0))
    val b = out.filter(_.getString(0) == "B")
    assert(b.map(_.getDouble(2)).toSeq == Seq(20.0, 21.0))
    assert(b.map(_.getInt(4)).toSeq == Seq(0, 0))
  }

  test("gaps reports each maximal missing run once (gaps-and-islands)") {
    // A observed 0,1,4,5,9: runs 2-3 and 6-8; B observed 2,3: no gaps
    val df = (Seq(0, 1, 4, 5, 9).map(h => ("A", t(h), 1.0, 1L)) ++
      Seq(2, 3).map(h => ("B", t(h), 2.0, 2L)))
      .toDF("symbol", "time", "close", "volume")
    val out = Resample.gaps(df, "symbol", "time", "1 hour")
      .orderBy("symbol", "gap_start").collect()
    assert(out.length == 2)
    assert(out(0).getString(0) == "A" && out(0).getTimestamp(1) == t(2) &&
      out(0).getTimestamp(2) == t(3) && out(0).getLong(3) == 2L)
    assert(out(1).getString(0) == "A" && out(1).getTimestamp(1) == t(6) &&
      out(1).getTimestamp(2) == t(8) && out(1).getLong(3) == 3L)
  }

  test("grid size is span/step per key — no cross-key blowup, no cartesian") {
    val df = Seq(("A", t(0), 1.0, 1L), ("A", t(23), 2.0, 2L))
      .toDF("symbol", "time", "close", "volume")
    val g = Resample.grid(df, "symbol", "time", "1 hour")
    assert(g.count() == 24)
    val plan = Resample.ffill(df, "symbol", "time", "1 hour", Seq("close"))
      .queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct") && !plan.contains("BroadcastNestedLoop"))
  }

  test("unpivot query yields 4 rows per bar in long form") {
    val q = SparkEntry.queries("q_unpivot")(spark, "/root/testdata/sf0.001")
    val bars = graft.sources.Tables.bars(spark, "/root/testdata/sf0.001").count()
    assert(q.count() == 4 * bars)
    assert(q.columns.toSeq == Seq("symbol", "time", "field", "value"))
  }
}
