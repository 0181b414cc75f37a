package graft

import java.sql.Timestamp

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Signals

/** Signal semantics on crafted bars: crossover direction, warm-up gating,
  * and outlier flagging. */
class SignalsSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def bars(closes: Seq[Double]) =
    closes.zipWithIndex.map { case (c, i) =>
      ("X", new Timestamp(1700000000000L + i * 3600000L), c, c, c, c, 1L)
    }.toDF("symbol", "time", "open", "high", "low", "close", "volume")

  test("smaCrossovers emits golden cross exactly when the fast SMA overtakes") {
    // 3-vs-5 SMA: falling series then sharp rally — fast must cross up once
    val closes = Seq(10.0, 9.0, 8.0, 7.0, 6.0, 5.0, 4.0, 10.0, 16.0, 22.0)
    val out = Signals.smaCrossovers(bars(closes), 3, 5).collect()
    assert(out.length == 1)
    assert(out.head.getAs[String]("signal") == "golden_cross")
    // warm-up: nothing before both SMAs and the lag are defined (row >= 6)
    val t = out.head.getAs[Timestamp]("time").getTime
    assert(t >= 1700000000000L + 5 * 3600000L)
  }

  test("zscoreOutliers flags only the spike; warm-up rows absent") {
    val closes = Seq.fill(19)(100.0) ++ Seq(100.0, 100.0, 130.0, 100.0)
    val out = Signals.zscoreOutliers(bars(closes), 20, 2.0).collect()
    // rows 20..23 have full windows (4 rows); constant window (sd=0) → null z → dropped
    assert(out.length == 2)
    val flagged = out.filter(_.getAs[Boolean]("is_outlier"))
    assert(flagged.length == 1)
    assert(flagged.head.getAs[Double]("close") == 130.0)
    assert(flagged.head.getAs[Double]("z") > 2.0)
  }
}
