package graft

import java.sql.Timestamp

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.{SeededAggs, WindowIndicators => WI}

class SeededAggsSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def series(vals: Seq[Double], symbol: String = "S") =
    vals.zipWithIndex.map { case (v, i) =>
      (new Timestamp(1700000000000L + i * 5000L), symbol, v)
    }.toDF("time", "symbol", "close")

  /** Reference fold implemented independently in plain Scala. */
  private def emaRef(vals: Seq[Double], n: Int, alpha: Double): Seq[Option[Double]] = {
    var sum = 0.0; var s = 0.0; var seen = 0
    vals.map { x =>
      seen += 1
      if (seen < n) { sum += x; None }
      else if (seen == n) { s = (sum + x) / n; Some(s) }
      else { s = alpha * x + (1 - alpha) * s; Some(s) }
    }
  }

  test("EMA(10): SMA-seeded, matches independent fold, exact") {
    val vals = (1 to 60).map(i => 100.0 + 13 * math.sin(i * 0.7))
    val got = series(vals)
      .select(col("time"), SeededAggs.ema(col("close"), 10, WI.w()).as("ema"))
      .orderBy("time").collect()
      .map(r => if (r.isNullAt(1)) None else Some(r.getDouble(1)))
    val exp = emaRef(vals, 10, 2.0 / 11)
    assert(got.toSeq == exp)
  }

  /** Independent Holt reference fold (causal seed l1 = x1, b1 = 0). */
  private def holtRef(vals: Seq[Double], a: Double, b: Double): Seq[(Double, Double)] = {
    var l = 0.0; var t = 0.0; var seen = 0
    vals.map { x =>
      seen += 1
      if (seen == 1) { l = x; t = 0.0 }
      else {
        val nl = a * x + (1 - a) * (l + t)
        t = b * (nl - l) + (1 - b) * t
        l = nl
      }
      (l, t)
    }
  }

  test("Holt level/trend/forecast match the independent fold, exact") {
    val vals = (1 to 50).map(i => 50.0 + 0.8 * i + 7 * math.sin(i * 0.5))
    val got = series(vals)
      .select(col("time"),
        SeededAggs.holt(col("close"), 0.2, 0.1, 0, WI.w()).as("l"),
        SeededAggs.holt(col("close"), 0.2, 0.1, 1, WI.w()).as("t"),
        SeededAggs.holt(col("close"), 0.2, 0.1, 2, WI.w()).as("f"))
      .orderBy("time").collect()
      .map(r => (r.getDouble(1), r.getDouble(2), r.getDouble(3)))
    val exp = holtRef(vals, 0.2, 0.1)
    assert(got.toSeq == exp.map { case (l, t) => (l, t, l + t) })
    // on a linear series the trend converges toward the true slope
    val lin = (1 to 200).map(i => 10.0 + 0.8 * i)
    val lastTrend = holtRef(lin, 0.2, 0.1).last._2
    assert(math.abs(lastTrend - 0.8) < 0.01)
  }

  test("RMA(14) = EMA with alpha 1/14") {
    val vals = (1 to 40).map(i => (i % 9).toDouble)
    val got = series(vals)
      .select(col("time"), SeededAggs.rma(col("close"), 14, WI.w()).as("rma"))
      .orderBy("time").collect()
      .map(r => if (r.isNullAt(1)) None else Some(r.getDouble(1)))
    assert(got.toSeq == emaRef(vals, 14, 1.0 / 14))
  }

  test("EMA skips null inputs and is per-symbol independent") {
    val df = Seq(
      ("A", 1, Some(1.0)), ("A", 2, None), ("A", 3, Some(2.0)), ("A", 4, Some(3.0)),
      ("B", 1, Some(10.0)), ("B", 2, Some(20.0)))
      .map { case (s, i, v) => (new Timestamp(i * 1000L), s, v) }
      .toDF("time", "symbol", "close")
    val got = df.select(col("symbol"), col("time"),
        SeededAggs.ema(col("close"), 2, WI.w()).as("ema"))
      .orderBy("symbol", "time").collect()
      .map(r => if (r.isNullAt(2)) None else Some(r.getDouble(2)))
    // A: null(seen1), null input(skip), seed=(1+2)/2=1.5, a*3+(1-a)*1.5 with a=2/3
    val a = 2.0 / 3
    assert(got.toSeq == Seq(None, None, Some(1.5), Some(a * 3 + (1 - a) * 1.5),
      None, Some(15.0)))
  }

  test("RSI bounds in [0, 100] (property)") {
    val vals = (1 to 200).map(i => 100.0 + 40 * math.sin(i * 1.3) + (i % 5))
    val spec = WI.w()
    val d = col("close") - lag(col("close"), 1).over(spec)
    val gain = when(d.isNotNull, greatest(d, lit(0.0)))
    val loss = when(d.isNotNull, greatest(-d, lit(0.0)))
    val ag = SeededAggs.rma(gain, 14, spec)
    val al = SeededAggs.rma(loss, 14, spec)
    val rsi = when(al === 0, lit(100.0))
      .otherwise(lit(100.0) - lit(100.0) / (lit(1.0) + ag / al))
    val rows = series(vals).select(rsi.as("rsi")).filter(col("rsi").isNotNull).collect()
    assert(rows.length == 200 - 14)
    rows.foreach(r => assert(r.getDouble(0) >= 0 && r.getDouble(0) <= 100))
  }

  test("ADX warms up at 28 rows and stays in [0, 100]") {
    val vals = (1 to 120).map(i => 100.0 + 10 * math.sin(i * 0.4))
    val df = series(vals)
      .withColumn("high", col("close") + 1).withColumn("low", col("close") - 1)
    val out = graft.operators.IndicatorPipeline.full(
        df.withColumn("open", col("close")).withColumn("volume", lit(1L)))
      .orderBy("time").collect()
    val adx = out.map(r => Option(r.getAs[java.lang.Double]("adx_14")))
    assert(adx.take(27).forall(_.isEmpty))
    assert(adx.drop(27).forall(v => v.isDefined && v.get >= 0 && v.get <= 100))
  }

  /** Independent Holt–Winters additive reference fold (m-mean seed,
    * trend 0, season_i = x_i − mean). */
  private def hwRef(vals: Seq[Double], m: Int, a: Double, b: Double,
      g: Double): Seq[Option[(Double, Double, Double, Double)]] = {
    var sum = 0.0; var l = 0.0; var t = 0.0; var seen = 0
    val raw = new Array[Double](m); var ring: Array[Double] = null
    vals.map { x =>
      seen += 1
      if (seen < m) { sum += x; raw(seen - 1) = x; None }
      else {
        if (seen == m) {
          raw(m - 1) = x; l = (sum + x) / m; t = 0.0
          ring = raw.map(_ - l)
        } else {
          val idx = (seen - 1) % m
          val sOld = ring(idx)
          val nl = a * (x - sOld) + (1 - a) * (l + t)
          t = b * (nl - l) + (1 - b) * t
          l = nl
          ring(idx) = g * (x - nl) + (1 - g) * sOld
        }
        Some((l, t, ring((seen - 1) % m), l + t + ring(seen % m)))
      }
    }
  }

  test("Holt-Winters(m=4): seed, season ring and forecast match the reference fold") {
    val vals = (1 to 12).map(_ * 1.7)
    def run(part: Int) = series(vals)
      .select(col("time"),
        SeededAggs.holtWinters(col("close"), 4, 0.2, 0.1, 0.3, part, WI.w()).as("v"))
      .orderBy("time").collect()
      .map(r => if (r.isNullAt(1)) None else Some(r.getDouble(1)))
    val exp = hwRef(vals, 4, 0.2, 0.1, 0.3)
    assert(run(0).toSeq == exp.map(_.map(_._1)))
    assert(run(1).toSeq == exp.map(_.map(_._2)))
    assert(run(2).toSeq == exp.map(_.map(_._3)))
    assert(run(3).toSeq == exp.map(_.map(_._4)))
    // spot-check against the independently-run DuckDB recursion (the
    // oracle's exact state machine): rn=4 seed and rn=12 level/trend
    assert(exp(3).get._1 == 4.25 && exp(3).get._2 == 0.0)
    assert(math.abs(exp(11).get._1 - 14.897148262955831) < 1e-12)
    assert(math.abs(exp(11).get._2 - 0.7700557197106487) < 1e-12)
  }

  test("Kalman(1-D): gain anneals, level matches the reference fold") {
    val vals = (1 to 30).map(i => 100.0 + 7 * math.sin(i * 0.5))
    val (q, r, p0) = (0.01, 1.0, 1.0)
    // independent fold
    var x = 0.0; var p = 0.0; var seen = 0
    val exp = vals.map { z =>
      seen += 1
      if (seen == 1) { x = z; p = p0; (x, None: Option[Double], p) }
      else {
        val pp = p + q; val k = pp / (pp + r)
        x = x + k * (z - x); p = (1 - k) * pp
        (x, Some(k), p)
      }
    }
    def run(part: Int) = series(vals)
      .select(col("time"), SeededAggs.kalman(col("close"), q, r, p0, part, WI.w()).as("v"))
      .orderBy("time").collect()
      .map(rw => if (rw.isNullAt(1)) None else Some(rw.getDouble(1)))
    assert(run(0).toSeq == exp.map(e => Some(e._1)))
    assert(run(1).toSeq == exp.map(_._2))
    assert(run(2).toSeq == exp.map(e => Some(e._3)))
    // the gain is monotone non-increasing toward its fixed point
    val gains = exp.flatMap(_._2)
    assert(gains.zip(gains.tail).forall { case (a, b) => b <= a + 1e-15 })
  }

  test("Holt-Winters skips null inputs and stays null through warm-up") {
    val df = Seq(
      (new Timestamp(0L), "S", Some(1.0)), (new Timestamp(5000L), "S", None),
      (new Timestamp(10000L), "S", Some(2.0)), (new Timestamp(15000L), "S", Some(3.0)))
      .toDF("time", "symbol", "close")
    val got = df.select(
      SeededAggs.holtWinters(col("close"), 3, 0.2, 0.1, 0.25, 0, WI.w()).as("v"))
      .orderBy("v").collect().map(r => if (r.isNullAt(0)) None else Some(r.getDouble(0)))
    // 3 non-null inputs -> seeded exactly at the last row: mean(1,2,3)=2
    assert(got.count(_.isDefined) == 1 && got.flatten.head == 2.0)
  }
}
