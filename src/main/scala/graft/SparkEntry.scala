package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.{WindowIndicators => WI}
import graft.operators.IndicatorPipeline
import graft.sources.Tables
import graft.OracleSql._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Every entry in [[queries]] is one operator from SURVEY §2 (or an
  * extended-pipeline operator); [[oracleSql]] carries the equivalent DuckDB
  * SQL the driver hash-compares against at sf0.01. All derived doubles are
  * rounded to 4 dp on both sides; timestamps always go through µs precision.
  */
object SparkEntry {

  /** Deterministic 4-dp rounding: floor(x·10⁴+0.5)/10⁴ in pure double
    * arithmetic — bitwise-identical in Spark and DuckDB, unlike round(),
    * whose half-case handling differs (Spark: decimal-string HALF_UP;
    * DuckDB: IEEE double). Oracle SQL uses the same formula. */
  private def r(c: Column): Column = floor(c * lit(10000) + lit(0.5)) / lit(10000)

  /** Flagship: full 13-indicator backfill over sf0.001 bars. */
  def entry(spark: SparkSession): DataFrame =
    IndicatorPipeline.full(Tables.bars(spark, "/root/testdata/sf0.001"))

  // ---------------------------------------------------------------- parity

  /** P1/P2/P3/F1: JSON field extraction, ms conversion, null guard
    * (producer.py:67-86, consumer.py:146-149). */
  private def qTickParse(s: SparkSession, dir: String): DataFrame =
    Tables.events(s, dir)
      .filter(col("value").isNotNull && col("ts").isNotNull)
      .select(
        col("event_id"),
        col("user_id").cast("string").as("symbol"),
        col("value").as("price"),
        unix_millis(col("ts")).as("ts_ms"),
        get_json_object(col("props"), "$.k").cast("int").as("k"))

  /** S2-analog bar construction: tick stream → hourly OHLCV bars. */
  private def qBarsHourly(s: SparkSession, dir: String): DataFrame =
    Tables.bars(s, dir)

  /** A1 + A6: sma_20 and Bollinger bands (backfill.py:17,30-37). */
  private def qSmaBb(s: SparkSession, dir: String): DataFrame = {
    val spec = WI.w()
    val (_, up, lo) = WI.bollinger(col("close"), 20, 2.0, spec)
    Tables.bars(s, dir).select(
      col("symbol"), col("time"),
      r(WI.sma(col("close"), 20, spec)).as("sma_20"),
      r(up).as("bb_upper"),
      r(lo).as("bb_lower"))
  }

  /** A8: stochastic %K(14) with SMA(3) smoothing (backfill.py:46-53). */
  private def qStoch(s: SparkSession, dir: String): DataFrame = {
    val spec = WI.w()
    Tables.bars(s, dir).select(
      col("symbol"), col("time"),
      r(WI.stochK(col("high"), col("low"), col("close"), 14, 3, spec)).as("stoch_k_14"))
  }

  /** A10: money flow index (backfill.py:58-60). */
  private def qMfi(s: SparkSession, dir: String): DataFrame = {
    val spec = WI.w()
    Tables.bars(s, dir).select(
      col("symbol"), col("time"),
      r(WI.mfi(col("high"), col("low"), col("close"), col("volume"), 14, spec)).as("mfi_14"))
  }

  /** A11: on-balance volume — exact integer math (backfill.py:61). */
  private def qObv(s: SparkSession, dir: String): DataFrame = {
    val spec = WI.w()
    Tables.bars(s, dir).select(
      col("symbol"), col("time"),
      WI.obv(col("close"), col("volume"), spec).as("obv"))
  }

  /** A12: daily-anchored VWAP (backfill.py:62). */
  private def qVwap(s: SparkSession, dir: String): DataFrame =
    Tables.bars(s, dir).select(
      col("symbol"), col("time"),
      r(WI.vwap(col("time"), col("symbol"), col("high"), col("low"), col("close"),
        col("volume"))).as("vwap"))

  /** Extended window-indicator family beyond the reference's 13 (same
    * pandas-ta catalog the reference draws from): Williams %R(14), ROC(12),
    * momentum(10), Donchian(20) channel, Keltner(20, ATR-SMA 10) channel,
    * CCI(20). All pure window expressions over the one shared
    * (symbol, time) WindowSpec — Catalyst collapses the whole family into a
    * single WindowExec, so the marginal cost over q_indicators is zero
    * shuffles. */
  private def qIndicatorsExt(s: SparkSession, dir: String): DataFrame = {
    val spec = WI.w()
    val (dUp, dMid, dLo) = WI.donchian(col("high"), col("low"), 20, spec)
    val (kMid, kUp, kLo) = WI.keltner(col("high"), col("low"), col("close"), 20, 10, 2.0, spec)
    Tables.bars(s, dir).select(
      col("symbol"), col("time"),
      r(WI.williamsR(col("high"), col("low"), col("close"), 14, spec)).as("will_r_14"),
      r(WI.roc(col("close"), 12, spec)).as("roc_12"),
      r(WI.momentum(col("close"), 10, spec)).as("mom_10"),
      r(dUp).as("donch_up"), r(dMid).as("donch_mid"), r(dLo).as("donch_lo"),
      r(kMid).as("kelt_mid"), r(kUp).as("kelt_up"), r(kLo).as("kelt_lo"),
      r(WI.cci(col("high"), col("low"), col("close"), 20, spec)).as("cci_20"))
  }

  /** Rolling order statistics: trailing-20 median and p90 of close per
    * symbol (the rolling sibling of q_percentiles' global aggregates). */
  private def qRollingQuantile(s: SparkSession, dir: String): DataFrame = {
    val spec = WI.w()
    Tables.bars(s, dir).select(
      col("symbol"), col("time"),
      r(WI.rollingQuantile(col("close"), 20, 0.5, spec)).as("med_20"),
      r(WI.rollingQuantile(col("close"), 20, 0.9, spec)).as("p90_20"))
  }

  /** A13 / read-API: latest row per key (roadmap /latest_price). */
  private def qLatestPerKey(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("user_id")).orderBy(col("ts").desc, col("event_id").desc)
    Tables.events(s, dir)
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .select(col("user_id"), col("event_id"), col("ts"), col("event_type"), col("value"))
  }

  /** Read-API: key + time-range scan (roadmap /indicators) — filter reaches
    * the parquet scan as PushedFilters. */
  private def qTimeRange(s: SparkSession, dir: String): DataFrame =
    Tables.eventsRange(s, dir,
        java.sql.Timestamp.from(java.time.Instant.parse("2024-01-10T00:00:00Z")),
        java.sql.Timestamp.from(java.time.Instant.parse("2024-01-20T00:00:00Z")))
      .filter(col("event_type") === "purchase")
      .select(col("event_id"), col("user_id"), col("ts"), col("value"))

  /** ST4/S5: first-write-wins keyed dedup (PK (time,symbol) ON CONFLICT DO
    * NOTHING; setup.py:87, consumer.py:200). */
  private def qDedupFirstWins(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("user_id"), col("event_type"))
      .orderBy(col("ts"), col("event_id"))
    Tables.events(s, dir)
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .select(col("user_id"), col("event_type"), col("event_id"),
        col("ts").as("first_time"), col("value"))
  }

  // ------------------------------------------------- recursive indicators

  import graft.functions.SeededAggs

  /** A2/A3: SMA-seeded EMA (backfill.py:18-19) — custom window aggregate. */
  private def qEma(s: SparkSession, dir: String): DataFrame = {
    val spec = WI.w()
    Tables.bars(s, dir).select(
      col("symbol"), col("time"),
      r(SeededAggs.ema(col("close"), 10, spec)).as("ema_10"),
      r(SeededAggs.ema(col("close"), 20, spec)).as("ema_20"))
  }

  /** Holt linear-trend smoothing + one-step forecast per symbol
    * ([[SeededAggs.HoltAgg]]) — the forecasting extension of the EMA
    * family: level and trend folded together over the running frame,
    * mirrored in the shared recursive oracle's (hl, hb) states. */
  private def qHolt(s: SparkSession, dir: String): DataFrame = {
    val spec = WI.w()
    Tables.bars(s, dir).select(
      col("symbol"), col("time"),
      r(SeededAggs.holt(col("close"), HoltAlpha, HoltBeta, 0, spec)).as("holt_level"),
      r(SeededAggs.holt(col("close"), HoltAlpha, HoltBeta, 1, spec)).as("holt_trend"),
      r(SeededAggs.holt(col("close"), HoltAlpha, HoltBeta, 2, spec)).as("holt_forecast"))
  }

  /** Holt–Winters ADDITIVE triple smoothing, season = the 24-hour bar
    * day ([[SeededAggs.HoltWintersAgg]]) — the seasonal extension of
    * [[qHolt]]: level/trend/season folded together with an O(m) season
    * ring per symbol, mirrored in the shared recursive oracle's
    * (hwsum, hwraw, hws, hwl, hwb) states. */
  private def qHoltWinters(s: SparkSession, dir: String): DataFrame = {
    val spec = WI.w()
    def hw(part: Int) = SeededAggs.holtWinters(
      col("close"), HwM, HoltAlpha, HoltBeta, HwGamma, part, spec)
    Tables.bars(s, dir).select(
      col("symbol"), col("time"),
      r(hw(0)).as("hw_level"), r(hw(1)).as("hw_trend"),
      r(hw(2)).as("hw_season"), r(hw(3)).as("hw_forecast"))
  }

  /** 1-D Kalman filter over the close series ([[SeededAggs.KalmanAgg]])
    * — the adaptive-gain smoother next to the fixed-α EMA family:
    * filtered level, converging gain, and error covariance, mirrored in
    * the shared recursive oracle's (kx, kp, kk) states. */
  private def qKalman(s: SparkSession, dir: String): DataFrame = {
    val spec = WI.w()
    def kf(part: Int) = SeededAggs.kalman(
      col("close"), KalQ, KalR, KalP0, part, spec)
    Tables.bars(s, dir).select(
      col("symbol"), col("time"),
      r(kf(0)).as("kf_level"), r(kf(1)).as("kf_gain"),
      r(kf(2)).as("kf_cov"))
  }

  /** A5: MACD line = EMA(12) − EMA(26) (backfill.py:23-27). */
  private def qMacd(s: SparkSession, dir: String): DataFrame = {
    val spec = WI.w()
    Tables.bars(s, dir).select(
      col("symbol"), col("time"),
      r(SeededAggs.ema(col("close"), 12, spec) -
        SeededAggs.ema(col("close"), 26, spec)).as("macd_line"))
  }

  /** A4: RSI(14) via Wilder RMA of gains/losses (backfill.py:20). */
  private def qRsi(s: SparkSession, dir: String): DataFrame =
    IndicatorPipeline.withRsi14(Tables.bars(s, dir)).select(
      col("symbol"), col("time"), r(col("rsi_14")).as("rsi_14"))

  /** A9: ATR(14) = RMA of true range (backfill.py:55). */
  private def qAtr(s: SparkSession, dir: String): DataFrame =
    IndicatorPipeline.withAtr14(Tables.bars(s, dir)).select(
      col("symbol"), col("time"), r(col("atr_14")).as("atr_14"))

  /** A7: Wilder ADX(14), doubly recursive (backfill.py:39-44). */
  private def qAdx(s: SparkSession, dir: String): DataFrame =
    IndicatorPipeline.withAdx14(Tables.bars(s, dir)).select(
      col("symbol"), col("time"), r(col("adx_14")).as("adx_14"))

  private val doubleIndicatorCols = Seq("sma_20", "ema_10", "ema_20", "macd_line",
    "adx_14", "rsi_14", "stoch_k_14", "mfi_14", "bb_upper", "bb_lower", "atr_14", "vwap")

  private def roundIndicators(df: DataFrame): DataFrame =
    doubleIndicatorCols.foldLeft(df)((d, c) => d.withColumn(c, r(col(c))))

  /** The flagship batch query: full 20-column backfill output
    * (backfill.py:12-64,137) over hourly bars. */
  private def qIndicators(s: SparkSession, dir: String): DataFrame =
    roundIndicators(IndicatorPipeline.full(Tables.bars(s, dir)))

  /** The live-path terminal query (consumer.py:135-173): tick-derived bars
    * (OHLC = price, volume null ⇒ mfi/obv/vwap null), warm-up gate ≥26 rows
    * AND non-null sma_20, newest surviving row per symbol. */
  private def qLiveLatest(s: SparkSession, dir: String): DataFrame =
    roundIndicators(IndicatorPipeline.latestPerSymbol(
      IndicatorPipeline.gated(Tables.liveBars(s, dir))))

  /** The STREAMING indicator read path, promoted to the correctness gate:
    * the sf ticks (first 60 per symbol — the regime where the bounded
    * 60-row stream state is provably identical to the batch windows; the
    * indicators are causal, so the cap is an output filter, not a
    * different computation) are replayed as Kafka-shaped JSON through the
    * REAL streaming pipeline — file-source micro-batches → parse →
    * watermarked replay-dedup → transformWithState on RocksDB → parquet
    * sink — and the SUNK TABLE is what the oracle hash-checks against the
    * batch indicator SQL. Stream == batch parity was spec-proven
    * (StreamingSpec); this makes it a gated, oracle-checked query. */
  private def qStreamIndicators(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.types.{StringType, StructField, StructType}
    s.conf.set(graft.streaming.StreamIngest.rocksdbConf._1,
      graft.streaming.StreamIngest.rocksdbConf._2)
    val work = SessionScoped.scratchDir("graft_stream_ind")
    val wsym = Window.partitionBy(col("symbol")).orderBy(col("time"))
    val ticks = Tables.ticks(s, dir)
      .withColumn("rn", row_number().over(wsym))
      .filter(col("rn") <= graft.model.Model.LookbackRows)
      .select(to_json(struct(col("symbol"), col("price"),
          unix_millis(col("time")).as("timestamp"))).as("value"),
        unix_millis(col("time")).as("ms"))
    // three time-range replay micro-batches (per-symbol time order is
    // preserved because the split is by time) — shared feed machinery
    graft.streaming.Feeder.writeTimeSlicedFeed(ticks, "ms", work, slices = 3)
    val raw = s.readStream
      .schema(StructType(Seq(StructField("value", StringType))))
      .option("maxFilesPerTrigger", "1")
      .parquet(s"$work/feed")
    val q = graft.streaming.StreamIngest.fromRaw(raw)
      .select(col("row.*"))
      .writeStream
      .option("checkpointLocation", s"$work/ckpt")
      .format("parquet").option("path", s"$work/out")
      .start()
    q.processAllAvailable()
    q.stop()
    roundIndicators(s.read.parquet(s"$work/out"))
      .select(graft.model.Model.DbColumns.map(col): _*)
  }

  // ------------------------------------------------------------------ maps

  /** Verify-gate-only queries, excluded from the bench sweep:
    *  - the sketch _check companions hash-check a sketch query's error
    *    contract (exact aggregates + in-band booleans) and deliberately
    *    pay for the exact distinct/percentiles the sketch plan avoids —
    *    timing them would charge the sketch for its oracle;
    *  - q_stream_indicators runs the REAL streaming pipeline (file-replay
    *    micro-batches, RocksDB state store, checkpointing, parquet sink)
    *    to gate the sunk table — ~18 s at sf0.1 of trigger/state-store
    *    machinery, not a query plan; benching it would dominate the sweep
    *    while measuring Structured Streaming overhead, not this library.
    *  - q_stream_cdc likewise replays the CDC changelog through the real
    *    foreachBatch merge (StreamCdc) and gates the final snapshot
    *    against the batch oracle — streaming machinery, not a plan. */
  val verifyOnly: Set[String] =
    Set("q_sketches_check", "q_sketch_rollup_check", "q_topk_sketch_check",
      "q_stream_indicators", "q_stream_cdc", "q_stream_drift",
      "q_stream_dsir", "q_stream_nb", "q_stream_ccnet",
      "q_stream_blocklist", "q_stream_repetition", "q_stream_rules",
      "q_stream_fuzzy_decontam",
      "q_stream_sessionize", "q_stream_join", "q_stream_join_outer",
      "q_stream_topk", "q_stream_topk_check")

  def queries: Map[String, (SparkSession, String) => DataFrame] =
    ExtendedEntries.queries ++ CorpusEntries.queries ++ Map(
    "q_ema" -> qEma,
    "q_holt" -> qHolt,
    "q_holt_winters" -> qHoltWinters,
    "q_kalman" -> qKalman,
    "q_macd" -> qMacd,
    "q_rsi" -> qRsi,
    "q_atr" -> qAtr,
    "q_adx" -> qAdx,
    "q_indicators" -> qIndicators,
    "q_live_latest" -> qLiveLatest,
    "q_stream_indicators" -> qStreamIndicators,
    "q_tick_parse" -> qTickParse,
    "q_bars_hourly" -> qBarsHourly,
    "q_sma_bb" -> qSmaBb,
    "q_stoch" -> qStoch,
    "q_mfi" -> qMfi,
    "q_obv" -> qObv,
    "q_vwap" -> qVwap,
    "q_indicators_ext" -> qIndicatorsExt,
    "q_rolling_quantile" -> qRollingQuantile,
    "q_latest_per_key" -> qLatestPerKey,
    "q_time_range" -> qTimeRange,
    "q_dedup_first_wins" -> qDedupFirstWins)

  /** Oracle for the streaming read path: the batch live-bars indicator SQL
    * over per-symbol rows 26..60 — exactly the warm-up-gated, untruncated
    * regime the stream replay emits (the indicators are causal, so capping
    * the OUTPUT rows at rn ≤ 60 equals capping the input ticks). */
  private val streamIndicatorsOracle: String = recWinQuery(
    s""", findic AS (
       |$fullIndicatorSelect
       |), g AS (
       |  SELECT f.*, b.rn
       |  FROM findic f JOIN b ON b.symbol = f.symbol AND b.time = f.time
       |  WHERE b.rn >= 26 AND b.rn <= 60 AND f.sma_20 IS NOT NULL
       |)
       |SELECT date_trunc('milliseconds', time) AS time,
       |       symbol, open, high, low, close, volume, sma_20, ema_10, ema_20,
       |       macd_line, adx_14, rsi_14, stoch_k_14, mfi_14, bb_upper, bb_lower,
       |       atr_14, obv, vwap
       |FROM g""".stripMargin,
    live = true)
    // ^ the stream's tick timestamps ride the Kafka JSON contract in
    // epoch-MILLISECONDS (producer.py's s→ms conversion), so the sunk
    // table's time is ms-precision; the oracle truncates only its OUTPUT
    // column — the recursion/windows still order by full-µs time

  private val liveLatestOracle: String = recWinQuery(
    s""", findic AS (
       |$fullIndicatorSelect
       |), g AS (
       |  SELECT f.*, b.rn,
       |    row_number() OVER (PARTITION BY f.symbol ORDER BY f.time DESC) AS rnd
       |  FROM findic f JOIN b ON b.symbol = f.symbol AND b.time = f.time
       |  WHERE b.rn >= 26 AND f.sma_20 IS NOT NULL
       |)
       |SELECT time, symbol, open, high, low, close, volume, sma_20, ema_10, ema_20,
       |       macd_line, adx_14, rsi_14, stoch_k_14, mfi_14, bb_upper, bb_lower,
       |       atr_14, obv, vwap
       |FROM g WHERE rnd = 1""".stripMargin,
    live = true)

  def oracleSql: Map[String, String] =
    ExtendedEntries.oracleSql ++ CorpusEntries.oracleSql ++ Map(
    "q_ema" -> recQuery(
      s"""SELECT symbol, time, ${r4(emaOut10)} AS ema_10, ${r4(emaOut20)} AS ema_20
         |FROM rec""".stripMargin),

    "q_holt" -> recQuery(
      s"""SELECT symbol, time, ${r4("hl")} AS holt_level,
         |  ${r4("hb")} AS holt_trend, ${r4("hl + hb")} AS holt_forecast
         |FROM rec""".stripMargin),

    "q_holt_winters" -> recQuery(
      s"""SELECT symbol, time,
         |  ${r4(s"CASE WHEN rn >= $HwM THEN hwl END")} AS hw_level,
         |  ${r4(s"CASE WHEN rn >= $HwM THEN hwb END")} AS hw_trend,
         |  ${r4(s"CASE WHEN rn >= $HwM THEN hws[((rn - 1) % $HwM) + 1] END")} AS hw_season,
         |  ${r4(s"CASE WHEN rn >= $HwM THEN hwl + hwb + hws[(rn % $HwM) + 1] END")} AS hw_forecast
         |FROM rec""".stripMargin),

    "q_kalman" -> recQuery(
      s"""SELECT symbol, time, ${r4("kx")} AS kf_level,
         |  ${r4("kk")} AS kf_gain, ${r4("kp")} AS kf_cov
         |FROM rec""".stripMargin),

    "q_macd" -> recQuery(
      s"SELECT symbol, time, ${r4(macdOut)} AS macd_line FROM rec"),

    "q_rsi" -> recQuery(
      s"SELECT symbol, time, ${r4(rsiOut)} AS rsi_14 FROM rec"),

    "q_atr" -> recQuery(
      s"SELECT symbol, time, ${r4(atrOut)} AS atr_14 FROM rec"),

    "q_adx" -> recQuery(
      s"SELECT symbol, time, ${r4(adxOut)} AS adx_14 FROM rec"),

    "q_indicators" -> recWinQuery(fullIndicatorSelect),

    "q_live_latest" -> liveLatestOracle,
    "q_stream_indicators" -> streamIndicatorsOracle,
    "q_tick_parse" ->
      """SELECT event_id, CAST(user_id AS VARCHAR) AS symbol, value AS price,
        |  epoch_ms(CAST(ts AS TIMESTAMP)) AS ts_ms,
        |  CAST(json_extract_string(props, '$.k') AS INTEGER) AS k
        |FROM events WHERE value IS NOT NULL AND ts IS NOT NULL""".stripMargin,

    "q_bars_hourly" -> withTicksBars("SELECT * FROM bars"),

    "q_sma_bb" -> withTicksBars(
      """, w1 AS (
        |  SELECT symbol, time,
        |    count(close) OVER w20 AS c20,
        |    avg(close) OVER w20 AS m20,
        |    stddev_samp(close) OVER w20 AS sd20
        |  FROM bars
        |  WINDOW w20 AS (PARTITION BY symbol ORDER BY time ROWS BETWEEN 19 PRECEDING AND CURRENT ROW)
        |)
        |SELECT symbol, time,
        |  floor((CASE WHEN c20 = 20 THEN m20 END) * 10000 + 0.5) / 10000 AS sma_20,
        |  floor((CASE WHEN c20 = 20 THEN m20 + 2 * sd20 END) * 10000 + 0.5) / 10000 AS bb_upper,
        |  floor((CASE WHEN c20 = 20 THEN m20 - 2 * sd20 END) * 10000 + 0.5) / 10000 AS bb_lower
        |FROM w1""".stripMargin),

    "q_stoch" -> withTicksBars(
      """, w1 AS (
        |  SELECT symbol, time, close,
        |    count(close) OVER w14 AS c14,
        |    min(low) OVER w14 AS lo14,
        |    max(high) OVER w14 AS hi14
        |  FROM bars
        |  WINDOW w14 AS (PARTITION BY symbol ORDER BY time ROWS BETWEEN 13 PRECEDING AND CURRENT ROW)
        |), w2 AS (
        |  SELECT symbol, time,
        |    CASE WHEN c14 = 14 THEN 100 * (close - lo14) / nullif(hi14 - lo14, 0) END AS rawk
        |  FROM w1
        |), w3 AS (
        |  SELECT symbol, time, count(rawk) OVER ws AS c3, avg(rawk) OVER ws AS k3
        |  FROM w2
        |  WINDOW ws AS (PARTITION BY symbol ORDER BY time ROWS BETWEEN 2 PRECEDING AND CURRENT ROW)
        |)
        |SELECT symbol, time, floor((CASE WHEN c3 = 3 THEN k3 END) * 10000 + 0.5) / 10000 AS stoch_k_14 FROM w3""".stripMargin),

    "q_mfi" -> withTicksBars(
      """, w1 AS (
        |  SELECT symbol, time, volume,
        |    (high + low + close) / 3 AS tp,
        |    (high + low + close) / 3
        |      - lag((high + low + close) / 3) OVER (PARTITION BY symbol ORDER BY time) AS d
        |  FROM bars
        |), w2 AS (
        |  SELECT symbol, time,
        |    count(d) OVER w14 AS c14,
        |    sum(CASE WHEN d IS NULL THEN NULL WHEN d > 0 THEN tp * volume ELSE 0 END) OVER w14 AS pos,
        |    sum(CASE WHEN d IS NULL THEN NULL WHEN d < 0 THEN tp * volume ELSE 0 END) OVER w14 AS neg
        |  FROM w1
        |  WINDOW w14 AS (PARTITION BY symbol ORDER BY time ROWS BETWEEN 13 PRECEDING AND CURRENT ROW)
        |)
        |SELECT symbol, time,
        |  floor((CASE WHEN c14 = 14 THEN 100 * pos / nullif(pos + neg, 0) END) * 10000 + 0.5) / 10000 AS mfi_14
        |FROM w2""".stripMargin),

    "q_obv" -> withTicksBars(
      """, w1 AS (
        |  SELECT symbol, time, volume,
        |    close - lag(close) OVER (PARTITION BY symbol ORDER BY time) AS d
        |  FROM bars
        |)
        |SELECT symbol, time,
        |  CAST(sum(CASE WHEN d IS NULL THEN volume WHEN d > 0 THEN volume
        |                WHEN d < 0 THEN -volume ELSE 0 END)
        |    OVER (PARTITION BY symbol ORDER BY time
        |          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS obv
        |FROM w1""".stripMargin),

    "q_vwap" -> withTicksBars(
      """, w1 AS (
        |  SELECT symbol, time, volume, (high + low + close) / 3 AS tp FROM bars
        |)
        |SELECT symbol, time,
        |  floor((sum(tp * volume) OVER wd / sum(volume) OVER wd) * 10000 + 0.5) / 10000 AS vwap
        |FROM w1
        |WINDOW wd AS (PARTITION BY symbol, CAST(time AS DATE) ORDER BY time
        |              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)""".stripMargin),

    "q_rolling_quantile" -> {
      val (lo5, a5, b5) = WI.quantileWeights(20, 0.5)
      val (lo9, a9, b9) = WI.quantileWeights(20, 0.9)
      withTicksBars(
        s""", w1 AS (
           |  SELECT symbol, time,
           |    count(close) OVER w20 AS cnt,
           |    list_sort(list(close) OVER w20) AS l
           |  FROM bars
           |  WINDOW w20 AS (PARTITION BY symbol ORDER BY time
           |                 ROWS BETWEEN 19 PRECEDING AND CURRENT ROW)
           |)
           |SELECT symbol, time,
           |  ${r4(s"CASE WHEN cnt = 20 THEN l[${lo5 + 1}] * $a5 + l[${lo5 + 2}] * $b5 END")} AS med_20,
           |  ${r4(s"CASE WHEN cnt = 20 THEN l[${lo9 + 1}] * $a9 + l[${lo9 + 2}] * $b9 END")} AS p90_20
           |FROM w1""".stripMargin)
    },

    "q_indicators_ext" -> withTicksBars(
      s""", w1 AS (
         |  SELECT symbol, time, high, low, close,
         |    (high + low + close) / 3 AS tp,
         |    lag(close) OVER w AS pc,
         |    lag(close, 12) OVER w AS c12,
         |    lag(close, 10) OVER w AS c10,
         |    count(close) OVER w14 AS cnt14,
         |    max(high) OVER w14 AS hh14,
         |    min(low) OVER w14 AS ll14,
         |    count(close) OVER w20 AS cnt20,
         |    max(high) OVER w20 AS dup20,
         |    min(low) OVER w20 AS dlo20
         |  FROM bars
         |  WINDOW
         |    w AS (PARTITION BY symbol ORDER BY time),
         |    w14 AS (PARTITION BY symbol ORDER BY time ROWS BETWEEN 13 PRECEDING AND CURRENT ROW),
         |    w20 AS (PARTITION BY symbol ORDER BY time ROWS BETWEEN 19 PRECEDING AND CURRENT ROW)
         |), w2 AS (
         |  SELECT *, CASE WHEN pc IS NULL THEN high - low
         |       ELSE greatest(high - low, abs(high - pc), abs(low - pc)) END AS tr
         |  FROM w1
         |), w3 AS (
         |  SELECT symbol, time, close, tp, c12, c10, cnt14, hh14, ll14,
         |    cnt20, dup20, dlo20,
         |    avg(tp) OVER w20 AS mtp20,
         |    list(tp) OVER w20 AS ltp20,
         |    count(close) OVER w10 AS cnt10,
         |    avg(tr) OVER w10 AS atr10
         |  FROM w2
         |  WINDOW
         |    w20 AS (PARTITION BY symbol ORDER BY time ROWS BETWEEN 19 PRECEDING AND CURRENT ROW),
         |    w10 AS (PARTITION BY symbol ORDER BY time ROWS BETWEEN 9 PRECEDING AND CURRENT ROW)
         |), w4 AS (
         |  SELECT *,
         |    list_aggregate(list_transform(ltp20, x -> abs(x - mtp20)), 'avg') AS mad20
         |  FROM w3
         |)
         |SELECT symbol, time,
         |  ${r4("CASE WHEN cnt14 = 14 AND hh14 <> ll14 THEN -100 * (hh14 - close) / (hh14 - ll14) END")} AS will_r_14,
         |  ${r4("CASE WHEN c12 IS NOT NULL AND c12 <> 0 THEN 100 * (close - c12) / c12 END")} AS roc_12,
         |  ${r4("close - c10")} AS mom_10,
         |  ${r4("CASE WHEN cnt20 = 20 THEN dup20 END")} AS donch_up,
         |  ${r4("CASE WHEN cnt20 = 20 THEN (dup20 + dlo20) / 2 END")} AS donch_mid,
         |  ${r4("CASE WHEN cnt20 = 20 THEN dlo20 END")} AS donch_lo,
         |  ${r4("CASE WHEN cnt20 = 20 THEN mtp20 END")} AS kelt_mid,
         |  ${r4("CASE WHEN cnt20 = 20 AND cnt10 = 10 THEN mtp20 + 2 * atr10 END")} AS kelt_up,
         |  ${r4("CASE WHEN cnt20 = 20 AND cnt10 = 10 THEN mtp20 - 2 * atr10 END")} AS kelt_lo,
         |  ${r4("CASE WHEN cnt20 = 20 AND mad20 <> 0 THEN (tp - mtp20) / (0.015 * mad20) END")} AS cci_20
         |FROM w4""".stripMargin),

    "q_latest_per_key" ->
      """WITH w1 AS (
        |  SELECT user_id, event_id, CAST(ts AS TIMESTAMP) AS ts, event_type, value,
        |    row_number() OVER (PARTITION BY user_id
        |                       ORDER BY CAST(ts AS TIMESTAMP) DESC, event_id DESC) AS rn
        |  FROM events
        |)
        |SELECT user_id, event_id, ts, event_type, value FROM w1 WHERE rn = 1""".stripMargin,

    "q_time_range" ->
      """SELECT event_id, user_id, CAST(ts AS TIMESTAMP) AS ts, value
        |FROM events
        |WHERE CAST(ts AS TIMESTAMP) >= TIMESTAMP '2024-01-10 00:00:00'
        |  AND CAST(ts AS TIMESTAMP) < TIMESTAMP '2024-01-20 00:00:00'
        |  AND event_type = 'purchase'""".stripMargin,

    "q_dedup_first_wins" ->
      """WITH w1 AS (
        |  SELECT user_id, event_type, event_id, CAST(ts AS TIMESTAMP) AS first_time, value,
        |    row_number() OVER (PARTITION BY user_id, event_type
        |                       ORDER BY CAST(ts AS TIMESTAMP), event_id) AS rn
        |  FROM events
        |)
        |SELECT user_id, event_type, event_id, first_time, value FROM w1 WHERE rn = 1""".stripMargin)
}
