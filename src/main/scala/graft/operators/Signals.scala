package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.{WindowIndicators => WI}

/** Derived trading signals on top of the indicator machinery: rolling
  * z-score outliers and moving-average crossover events — the alert-side
  * queries a user of the reference pipeline builds next (roadmap.md's
  * alerting direction), expressed with the same one-shuffle-per-symbol
  * window family as the indicators themselves.
  *
  * Determinism contract: comparisons that gate output rows (outlier flag,
  * cross direction) run on 4-dp-rounded values so both engines make
  * identical keep/drop decisions at float boundaries.
  */
object Signals {

  private def r4(c: Column): Column = floor(c * lit(10000) + lit(0.5)) / lit(10000)

  /** Rolling z-score of close vs its n-bar mean/std (ddof=1, matching the
    * Bollinger convention); |z| > threshold flags an outlier bar. One
    * window pass; null until the window fills. */
  def zscoreOutliers(bars: DataFrame, n: Int, threshold: Double): DataFrame = {
    val spec = WI.w()
    val cnt = count(col("close")).over(spec.rowsBetween(-(n - 1), 0))
    val m = avg(col("close")).over(spec.rowsBetween(-(n - 1), 0))
    val sd = stddev_samp(col("close")).over(spec.rowsBetween(-(n - 1), 0))
    bars
      .select(col("symbol"), col("time"), col("close"),
        when(cnt === n, r4((col("close") - m) / nullif(sd, lit(0.0)))).as("z"))
      .withColumn("is_outlier", abs(col("z")) > threshold)
      .filter(col("z").isNotNull)
  }

  /** Moving-average crossover events: rows where the fast SMA crosses the
    * slow SMA (golden/death cross). The sign test runs on the rounded
    * spread and its lag, so a cross is emitted exactly when the spread's
    * 4-dp sign flips between consecutive bars. */
  def smaCrossovers(bars: DataFrame, fast: Int, slow: Int): DataFrame = {
    val spec = WI.w()
    val spread = r4(WI.sma(col("close"), fast, spec) - WI.sma(col("close"), slow, spec))
    val withSpread = bars.select(col("symbol"), col("time"),
      r4(WI.sma(col("close"), fast, spec)).as(s"sma_$fast"),
      r4(WI.sma(col("close"), slow, spec)).as(s"sma_$slow"),
      spread.as("spread"))
    val prev = lag(col("spread"), 1).over(WI.w())
    withSpread
      .withColumn("prev_spread", prev)
      .filter(col("spread").isNotNull && col("prev_spread").isNotNull)
      .withColumn("signal",
        when(col("prev_spread") < 0 && col("spread") >= 0, lit("golden_cross"))
          .when(col("prev_spread") >= 0 && col("spread") < 0, lit("death_cross")))
      .filter(col("signal").isNotNull)
      .select(col("symbol"), col("time"), col(s"sma_$fast"), col(s"sma_$slow"),
        col("signal"))
  }
}
