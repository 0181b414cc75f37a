package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.WindowSpec
import org.apache.spark.sql.functions._

import graft.functions.{SeededAggs, WindowIndicators => WI}
import graft.model.Model

/** The reference's core workload: all 13 technical indicators over a
  * per-symbol time-ordered OHLCV frame, producing the 20-column sink row
  * (trading-etl-python/src/db/backfill.py:12-64 — batch path;
  * trading-etl-python/src/processing/consumer.py:82-135 — live path).
  *
  * Plan shape: every indicator — built-in window aggregates and the custom
  * seeded folds alike — shares `Window.partitionBy(symbol).orderBy(time)`,
  * so Catalyst collapses the whole pipeline into ONE shuffle by symbol and
  * one sort per partition. At 100 TB this scales linearly with symbol
  * cardinality and is skew-bounded by the largest single symbol's history.
  */
object IndicatorPipeline {

  /** Append all 13 indicator columns to a bars frame
    * (time, symbol, open, high, low, close, volume) and project the sink
    * schema in DDL order. Batch/backfill parity: no warm-up gate — every
    * input row is emitted, leading rows carry nulls (backfill.py:134-139). */
  def full(bars: DataFrame): DataFrame = {
    val spec = WI.w()
    withIndicators(bars, spec).select(Model.DbColumns.map(col): _*)
  }

  /** Live-path contract (consumer.py:165-173): a symbol emits nothing until
    * it has ≥26 rows AND sma_20 is non-null. */
  def gated(bars: DataFrame): DataFrame = {
    val spec = WI.w()
    withIndicators(bars, spec)
      .withColumn("rn", row_number().over(spec))
      .filter(col("rn") >= Model.WarmupRows && col("sma_20").isNotNull)
      .select(Model.DbColumns.map(col): _*)
  }

  /** Live-path terminal shape (consumer.py:135,169): only the newest row
    * per symbol survives. */
  def latestPerSymbol(gatedRows: DataFrame): DataFrame = {
    val wDesc = org.apache.spark.sql.expressions.Window
      .partitionBy(col("symbol")).orderBy(col("time").desc)
    gatedRows
      .withColumn("rn_desc", row_number().over(wDesc))
      .filter(col("rn_desc") === 1)
      .select(Model.DbColumns.map(col): _*)
  }

  /** RSI(14): Wilder RMA of gains/losses over close diffs (backfill.py:20);
    * zero average loss ⇒ 100. */
  def rsi14(spec: WindowSpec): Column = {
    val d = col("close") - lag(col("close"), 1).over(spec)
    val gain = when(d.isNotNull, greatest(d, lit(0.0)))
    val loss = when(d.isNotNull, greatest(-d, lit(0.0)))
    val avgGain = SeededAggs.rma(gain, 14, spec)
    val avgLoss = SeededAggs.rma(loss, 14, spec)
    when(avgLoss === 0, lit(100.0))
      .otherwise(lit(100.0) - lit(100.0) / (lit(1.0) + avgGain / avgLoss))
  }

  /** ATR(14): Wilder RMA of the full true-range series (backfill.py:55). */
  def atr14(spec: WindowSpec): Column =
    SeededAggs.rma(WI.trueRange(col("high"), col("low"), col("close"), spec), 14, spec)

  /** ADX(14) over lag-derived (+DM, −DM, TR) (backfill.py:39-44). The TR
    * series starts at row 2 where ±DM are defined, matching the
    * diff-aligned Wilder recursion; ATR smooths the full TR series. */
  def adx14(spec: WindowSpec): Column = {
    val high = col("high"); val low = col("low")
    val up = high - lag(high, 1).over(spec)
    val dn = lag(low, 1).over(spec) - low
    val pdm = when(up.isNotNull, when(up > dn && up > 0, up).otherwise(lit(0.0)))
    val ndm = when(dn.isNotNull, when(dn > up && dn > 0, dn).otherwise(lit(0.0)))
    val tr = WI.trueRange(high, low, col("close"), spec)
    SeededAggs.adx(pdm, ndm, when(up.isNotNull, tr), 14, spec)
  }

  private def withIndicators(bars: DataFrame, spec: WindowSpec): DataFrame = {
    val close = col("close"); val high = col("high"); val low = col("low")
    val (_, bbU, bbL) = WI.bollinger(close, 20, 2.0, spec)
    bars
      .withColumn("sma_20", WI.sma(close, 20, spec))
      .withColumn("ema_10", SeededAggs.ema(close, 10, spec))
      .withColumn("ema_20", SeededAggs.ema(close, 20, spec))
      .withColumn("macd_line",
        SeededAggs.ema(close, 12, spec) - SeededAggs.ema(close, 26, spec))
      .withColumn("adx_14", adx14(spec))
      .withColumn("rsi_14", rsi14(spec))
      .withColumn("stoch_k_14", WI.stochK(high, low, close, 14, 3, spec))
      .withColumn("mfi_14", WI.mfi(high, low, close, col("volume"), 14, spec))
      .withColumn("bb_upper", bbU)
      .withColumn("bb_lower", bbL)
      .withColumn("atr_14", atr14(spec))
      .withColumn("obv", WI.obv(close, col("volume"), spec))
      .withColumn("vwap", WI.vwap(col("time"), col("symbol"), high, low, close, col("volume")))
  }
}
