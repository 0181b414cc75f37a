package graft

import java.sql.Timestamp

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.{WindowIndicators => WI}

/** Brute-force cross-check of the extended indicator family (q_indicators_ext)
  * against direct array math on a deterministic OHLCV fixture. */
class ExtIndicatorsSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  // deterministic pseudo-random walk, 40 bars, one symbol
  private val n = 40
  private val close = Array.iterate(100.0, n)(c => c + ((c * 31).toLong % 7) - 3.0)
  private val high = close.map(_ + 1.5)
  private val low = close.map(_ - 2.0)

  private lazy val df = (0 until n).map { i =>
    (new Timestamp(1700000000000L + i * 60000L), "S", high(i), low(i), close(i))
  }.toDF("time", "symbol", "high", "low", "close")

  private def collectCol(c: org.apache.spark.sql.Column): Array[Option[Double]] =
    df.select(col("time"), c.as("v")).orderBy("time")
      .collect().map(r => if (r.isNullAt(1)) None else Some(r.getDouble(1)))

  test("williams %R matches brute force") {
    val got = collectCol(WI.williamsR(col("high"), col("low"), col("close"), 14, WI.w()))
    for (i <- 0 until n) {
      if (i < 13) assert(got(i).isEmpty)
      else {
        val hh = high.slice(i - 13, i + 1).max
        val ll = low.slice(i - 13, i + 1).min
        val want = -100.0 * (hh - close(i)) / (hh - ll)
        assert(math.abs(got(i).get - want) < 1e-9, s"row $i")
      }
    }
  }

  test("roc and momentum match brute force") {
    val roc = collectCol(WI.roc(col("close"), 12, WI.w()))
    val mom = collectCol(WI.momentum(col("close"), 10, WI.w()))
    for (i <- 0 until n) {
      if (i < 12) assert(roc(i).isEmpty)
      else assert(math.abs(roc(i).get - 100.0 * (close(i) - close(i - 12)) / close(i - 12)) < 1e-9)
      if (i < 10) assert(mom(i).isEmpty)
      else assert(math.abs(mom(i).get - (close(i) - close(i - 10))) < 1e-9)
    }
  }

  test("donchian channel matches brute force") {
    val (up, mid, lo) = WI.donchian(col("high"), col("low"), 20, WI.w())
    val gotUp = collectCol(up); val gotMid = collectCol(mid); val gotLo = collectCol(lo)
    for (i <- 0 until n) {
      if (i < 19) assert(gotUp(i).isEmpty && gotMid(i).isEmpty && gotLo(i).isEmpty)
      else {
        val u = high.slice(i - 19, i + 1).max
        val l = low.slice(i - 19, i + 1).min
        assert(math.abs(gotUp(i).get - u) < 1e-9)
        assert(math.abs(gotLo(i).get - l) < 1e-9)
        assert(math.abs(gotMid(i).get - (u + l) / 2) < 1e-9)
      }
    }
  }

  test("keltner channel (SMA flavor) matches brute force") {
    val (mid, up, lo) = WI.keltner(col("high"), col("low"), col("close"), 20, 10, 2.0, WI.w())
    val gotMid = collectCol(mid); val gotUp = collectCol(up); val gotLo = collectCol(lo)
    val tp = (0 until n).map(i => (high(i) + low(i) + close(i)) / 3).toArray
    val tr = (0 until n).map { i =>
      if (i == 0) high(0) - low(0)
      else math.max(high(i) - low(i),
        math.max(math.abs(high(i) - close(i - 1)), math.abs(low(i) - close(i - 1))))
    }.toArray
    for (i <- 0 until n) {
      if (i < 19) assert(gotMid(i).isEmpty && gotUp(i).isEmpty && gotLo(i).isEmpty)
      else {
        val m = tp.slice(i - 19, i + 1).sum / 20
        val a = tr.slice(i - 9, i + 1).sum / 10
        assert(math.abs(gotMid(i).get - m) < 1e-9)
        assert(math.abs(gotUp(i).get - (m + 2 * a)) < 1e-9)
        assert(math.abs(gotLo(i).get - (m - 2 * a)) < 1e-9)
      }
    }
  }

  test("cci matches brute force (MAD from the current window mean)") {
    val got = collectCol(WI.cci(col("high"), col("low"), col("close"), 20, WI.w()))
    val tp = (0 until n).map(i => (high(i) + low(i) + close(i)) / 3).toArray
    for (i <- 0 until n) {
      if (i < 19) assert(got(i).isEmpty)
      else {
        val win = tp.slice(i - 19, i + 1)
        val m = win.sum / 20
        val mad = win.map(x => math.abs(x - m)).sum / 20
        val want = (tp(i) - m) / (0.015 * mad)
        assert(math.abs(got(i).get - want) < 1e-6, s"row $i: got ${got(i)} want $want")
      }
    }
  }

  test("rolling quantile matches brute-force type-7 interpolation") {
    for (p <- Seq(0.5, 0.9)) {
      val got = collectCol(WI.rollingQuantile(col("close"), 20, p, WI.w()))
      for (i <- 0 until n) {
        if (i < 19) assert(got(i).isEmpty)
        else {
          val win = close.slice(i - 19, i + 1).sorted
          val pos = 19 * p
          val lo = math.floor(pos).toInt
          val frac = pos - lo
          val want = if (frac == 0) win(lo) else win(lo) * (1 - frac) + win(lo + 1) * frac
          assert(math.abs(got(i).get - want) < 1e-9, s"p=$p row $i")
        }
      }
    }
  }

  test("the whole family plans as window functions over one symbol partition") {
    val q = SparkEntry.queries("q_indicators_ext")(spark, "/root/testdata/sf0.001")
    assert(q.columns.toSeq == Seq("symbol", "time", "will_r_14", "roc_12", "mom_10",
      "donch_up", "donch_mid", "donch_lo", "kelt_mid", "kelt_up", "kelt_lo", "cci_20"))
    assert(q.count() > 0)
    val plan = q.queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct"))
  }
}
