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
}
