package graft

import java.sql.Timestamp

import org.apache.spark.sql.functions.{col, lit}
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

  test("drawdown tracks the running peak exactly; underwater bars reset at peaks") {
    val out = Signals.drawdown(bars(Seq(100.0, 120.0, 90.0, 120.0, 150.0, 75.0)))
      .orderBy("time").collect()
    assert(out.map(_.getAs[Double]("peak")).toSeq
      == Seq(100.0, 120.0, 120.0, 120.0, 150.0, 150.0))
    assert(out.map(_.getAs[Double]("drawdown")).toSeq
      == Seq(0.0, 0.0, -0.25, 0.0, 0.0, -0.5))
    // bar 3 re-touches the 120 peak, so it resets the underwater clock
    assert(out.map(_.getAs[Long]("underwater_bars")).toSeq
      == Seq(0L, 0L, 1L, 0L, 0L, 1L))
  }

  test("rolling correlation: perfectly co-moving series give 1, anti-moving give -1") {
    val rows = (0 until 12).flatMap { i =>
      val t = new Timestamp(1700000000000L + i * 86400000L)
      Seq(("a", t, 10.0 + i), ("b", t, 20.0 + 2 * i), ("c", t, 50.0 - i))
    }
    val series = rows.toDF("key", "time", "value")
    val out = Signals.rollingCorrelation(series, Seq(("a", "b"), ("a", "c")), 10)
      .collect().groupBy(_.getAs[String]("pair"))
    assert(out("a/b").forall(_.getAs[Double]("corr") == 1.0))   // linear up-up
    assert(out("a/c").forall(_.getAs[Double]("corr") == -1.0))  // linear up-down
    assert(out("a/b").length == 3) // 12 points, window 10 → 3 full windows
  }

  test("rollingOls recovers an exact linear trend with r2 = 1") {
    // y = 3x + 7: slope must be exactly 3, r² exactly 1, for every full window
    val closes = (1 to 25).map(i => 3.0 * i + 7)
    val out = Signals.rollingOls(bars(closes), 20).collect()
      .filter(!_.isNullAt(2))
    assert(out.length == 6) // rows 20..25
    out.foreach { r =>
      assert(math.abs(r.getDouble(2) - 3.0) < 1e-9, "slope")
      assert(math.abs(r.getDouble(3) - 1.0) < 1e-9, "r2")
    }
    // flat series: slope 0, r2 null (zero y-variance)
    val flat = Signals.rollingOls(bars(Seq.fill(22)(5.0)), 20).collect()
      .filter(!_.isNullAt(2))
    assert(flat.forall(r => r.getDouble(2) == 0.0 && r.isNullAt(3)))
  }

  test("robustOutliers flags a spike the classic z-score masks less cleanly") {
    // 21 flat-ish values with one huge spike at the end
    val closes = (1 to 21).map(i => 100.0 + (i % 3)) :+ 500.0
    val out = Signals.robustOutliers(bars(closes), 20, 3.0).collect()
    val spike = out.filter(_.getDouble(2) == 500.0)
    assert(spike.length == 1 && spike.head.getAs[Boolean]("is_outlier"))
    // the flat rows are not outliers
    assert(out.filter(_.getDouble(2) < 200).forall(!_.getAs[Boolean]("is_outlier")))
  }

  test("returnsVol: constant growth gives constant log_ret and zero vol") {
    val closes = (0 until 25).map(i => 100.0 * math.pow(1.01, i))
    val out = Signals.returnsVol(bars(closes), 20).orderBy("time").collect()
    assert(out.head.isNullAt(3))                        // first ret null
    val want = math.floor(math.log(1.01) * 10000 + 0.5) / 10000
    assert(out.tail.forall(_.getDouble(3) == want))
    val vols = out.filter(!_.isNullAt(4)).map(_.getDouble(4))
    assert(vols.nonEmpty && vols.forall(_ == 0.0))
  }

  test("rollingBeta: a lone symbol IS the market, so beta = 1") {
    val closes = (0 until 25).map(i => 100.0 + 7 * math.sin(i) + i)
    val out = Signals.rollingBeta(bars(closes), 20).collect()
      .filter(!_.isNullAt(2))
    assert(out.nonEmpty)
    assert(out.forall(r => math.abs(r.getDouble(2) - 1.0) < 1e-3), // cents quantization
      out.map(_.getDouble(2)).mkString(","))
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

  test("corrMatrix: co-moving pairs 1, anti-moving -1, minOverlap filters") {
    val rows = (0 until 30).flatMap { i =>
      val t = new Timestamp(1700000000000L + i * 3600000L)
      // b moves with a (same log-return sign/shape), c moves against
      val a = 100.0 * math.pow(1.01, i) * (if (i % 2 == 0) 1.002 else 1.0)
      Seq(("a", t, a), ("b", t, 2 * a), ("c", t, 1e6 / a)) ++
        // d shares only 3 bars with the rest: below minOverlap
        (if (i < 3) Seq(("d", t, a)) else Nil)
    }
    val bars = rows.toDF("symbol", "time", "close")
      .withColumn("open", col("close")).withColumn("high", col("close"))
      .withColumn("low", col("close")).withColumn("volume", lit(1L))
    val out = Signals.corrMatrix(bars, minOverlap = 10).collect()
      .map(r => (r.getAs[String]("symbol_a"), r.getAs[String]("symbol_b")) ->
        r.getAs[Double]("corr")).toMap
    // d is filtered by overlap; the remaining matrix is the 3 pairs
    assert(out.keySet == Set(("a", "b"), ("a", "c"), ("b", "c")))
    assert(out(("a", "b")) > 0.999)   // identical returns (2x scale drops out)
    assert(out(("a", "c")) < -0.999)  // inverse price ⇒ negated log returns
    assert(out(("b", "c")) < -0.999)
  }

  test("leadLagMarket: a lone symbol IS the market — corr 1 at lag 0 only") {
    val closes = (0 until 40).map(i => 100.0 + 10 * math.sin(i * 0.7) + i)
    val out = Signals.leadLagMarket(bars(closes), 2, 10).collect()
      .map(r => r.getAs[Int]("lag") -> r.getAs[Double]("corr")).toMap
    assert(out.keySet == Set(-2, -1, 0, 1, 2))
    assert(out(0) > 0.999)                       // self vs self, aligned
    assert(out(0) > out(1) && out(0) > out(-1))  // misaligned shifts decay
  }

  test("cusum prefix-sum identity matches the textbook recursion; shift alarms") {
    // flat-ish regime then a sustained +5 step — the shape CUSUM exists to
    // catch (a single z-score outlier test misses slow sustained drifts)
    val closes = (1 to 30).map(i => 100.0 + (i % 3) * 0.5) ++
      (1 to 30).map(i => 100.0 + (i % 3) * 0.5 + i * 1.5)
    val k = 0.5
    val out = Signals.cusum(bars(closes), k, 3.0).orderBy("time").collect()
    assert(out.length == closes.length - 1)      // first bar has no change
    // reference: run the doubly-recursive definition over the SAME z series
    var sp = 0.0; var sn = 0.0
    out.foreach { r =>
      val z = r.getAs[Double]("z")
      sp = math.max(0.0, sp + z - k)
      sn = math.max(0.0, sn - z - k)
      assert(math.abs(r.getAs[Double]("cusum_pos") - sp) < 1e-4,
        s"pos diverged at ${r.getAs[Timestamp]("time")}")
      assert(math.abs(r.getAs[Double]("cusum_neg") - sn) < 1e-4,
        s"neg diverged at ${r.getAs[Timestamp]("time")}")
    }
    // the sustained upward drift must trip the POSITIVE side, and only
    // after the regime change (the negative side may alarm earlier: under
    // full-series standardization the flat first regime sits below trend)
    val posAlarms = out.filter(_.getAs[Double]("cusum_pos") > 3.0)
    assert(posAlarms.nonEmpty)
    assert(posAlarms.map(_.getAs[Timestamp]("time").getTime).min
      >= 1700000000000L + 30 * 3600000L)
  }
}
