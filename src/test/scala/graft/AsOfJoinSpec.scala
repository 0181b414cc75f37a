package graft

import java.sql.Timestamp

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.AsOfJoin

class AsOfJoinSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  test("as-of semantics: most recent right at-or-before; inclusive on ties; null before first") {
    val left = Seq(
      ("A", new Timestamp(500L), 1.0),   // before any bar → null
      ("A", new Timestamp(1000L), 2.0),  // tie with bar@1000 → inclusive match
      ("A", new Timestamp(1700L), 3.0),  // between bars → bar@1000
      ("A", new Timestamp(2500L), 4.0),  // after bar@2000
      ("B", new Timestamp(2500L), 5.0))  // other key, bar@2000 of B absent → null
      .toDF("symbol", "time", "price")
    val right = Seq(
      ("A", new Timestamp(1000L), 10.0),
      ("A", new Timestamp(2000L), 20.0))
      .toDF("symbol", "time", "close")
    val out = AsOfJoin.asof(left, right, "symbol", "time", Seq("close"))
      .orderBy("symbol", "time")
      .collect()
      .map(r => (r.getAs[String]("symbol"), r.getAs[Timestamp]("time").getTime,
        Option(r.getAs[java.lang.Double]("asof_close")).map(_.doubleValue)))
    assert(out.toSeq == Seq(
      ("A", 500L, None),
      ("A", 1000L, Some(10.0)),
      ("A", 1700L, Some(10.0)),
      ("A", 2500L, Some(20.0)),
      ("B", 2500L, None)))
  }

  private def fixture = {
    val left = Seq(
      ("A", new Timestamp(500L), 1.0),   // before first bar
      ("A", new Timestamp(1000L), 2.0),  // exactly on bar@1000
      ("A", new Timestamp(1700L), 3.0),  // closer to bar@2000
      ("A", new Timestamp(1400L), 3.5),  // closer to bar@1000
      ("A", new Timestamp(2500L), 4.0))  // after last bar
      .toDF("symbol", "time", "price")
    val right = Seq(
      ("A", new Timestamp(1000L), 10.0),
      ("A", new Timestamp(2000L), 20.0))
      .toDF("symbol", "time", "close")
    (left, right)
  }

  private def run(direction: String, tolUs: Long = -1L) = {
    val (left, right) = fixture
    AsOfJoin.asof(left, right, "symbol", "time", Seq("close"),
      direction = direction, toleranceUs = tolUs)
      .orderBy("time").collect()
      .map(r => (r.getAs[Timestamp]("time").getTime,
        Option(r.getAs[java.lang.Double]("asof_close")).map(_.doubleValue)))
      .toSeq
  }

  test("forward: first right at-or-after; inclusive on ties; null after last") {
    assert(run("forward") == Seq(
      (500L, Some(10.0)), (1000L, Some(10.0)), (1400L, Some(20.0)),
      (1700L, Some(20.0)), (2500L, None)))
  }

  test("nearest: closer side wins, tie prefers backward, one-sided rows still match") {
    assert(run("nearest") == Seq(
      (500L, Some(10.0)),  // only forward exists
      (1000L, Some(10.0)), // exact hit (tie, same row)
      (1400L, Some(10.0)), // 400 back vs 600 forward
      (1700L, Some(20.0)), // 700 back vs 300 forward
      (2500L, Some(20.0)))) // only backward exists
  }

  test("tolerance nulls far matches but keeps the rows (left-join semantics)") {
    // timestamps are ms → 1 ms = 1000 µs; tolerance 400 ms = 400000 µs
    assert(run("backward", tolUs = 400000L) == Seq(
      (500L, None), (1000L, Some(10.0)), (1400L, Some(10.0)),
      (1700L, None), (2500L, None)))
    assert(run("nearest", tolUs = 400000L) == Seq(
      (500L, None),        // forward is 500 ms away → out of tolerance
      (1000L, Some(10.0)),
      (1400L, Some(10.0)),
      (1700L, Some(20.0)), // backward out, forward (300 ms) in
      (2500L, None)))
  }
}
