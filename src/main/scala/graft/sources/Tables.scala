package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Readers over the driver-provided parquet tables (TESTDATA.md) and the
  * derivations that stand in for the reference's market-data inputs.
  *
  * The reference ingests ticks `{symbol, price, timestamp}` (producer.py:81-86)
  * and daily OHLCV bars (backfill.py:103). The synthetic `events` table plays
  * the tick stream: `user_id` ↔ symbol, `ts` ↔ time, `value` ↔ price. A
  * deterministic synthetic volume (`event_id % 97 + 1`) backs the
  * volume-based indicators (mfi/obv/vwap) that the live path nulls out.
  *
  * Scale notes (100 TB): every reader is a plain parquet scan — column
  * pruning and predicate pushdown reach the file source; bar building is a
  * single hash aggregation shuffled by (symbol, bucket), which is exactly
  * the partitioning every downstream indicator window needs.
  */
object Tables {

  def table(spark: SparkSession, sfDir: String, name: String): DataFrame =
    spark.read.parquet(s"$sfDir/$name.parquet")

  def lineitem(spark: SparkSession, sfDir: String): DataFrame = table(spark, sfDir, "lineitem")
  def orders(spark: SparkSession, sfDir: String): DataFrame = table(spark, sfDir, "orders")
  def customer(spark: SparkSession, sfDir: String): DataFrame = table(spark, sfDir, "customer")
  def nation(spark: SparkSession, sfDir: String): DataFrame = table(spark, sfDir, "nation")
  def region(spark: SparkSession, sfDir: String): DataFrame = table(spark, sfDir, "region")
  def part(spark: SparkSession, sfDir: String): DataFrame = table(spark, sfDir, "part")
  def supplier(spark: SparkSession, sfDir: String): DataFrame = table(spark, sfDir, "supplier")
  /** `events.ts` has shifted physical type across driver data generations:
    * parquet TIMESTAMP(NANOS) (Spark 4 refuses it by default — the legacy
    * conf reads it as raw ns LONG), and plain TIMESTAMP(MICROS) without the
    * UTC flag (Spark reads TIMESTAMP_NTZ). Normalize every variant to a µs
    * instant TIMESTAMP so downstream code and the DuckDB oracle (which
    * truncates TIMESTAMP_NS → TIMESTAMP the same way) see one schema.
    * NTZ reinterpretation relies on the engine-wide session.timeZone=UTC
    * invariant (every entry point sets it). */
  def events(spark: SparkSession, sfDir: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    normalizeTs(table(spark, sfDir, "events"), "ts")
  }

  private def normalizeTs(df: DataFrame, c: String): DataFrame = {
    // The NTZ→TIMESTAMP cast below reinterprets wall-clock fields in the
    // session zone; anywhere but UTC silently shifts every NTZ-generation
    // timestamp. Assert the invariant HERE so a new entry point that forgot
    // to set it fails at the read, not as an oracle hash mismatch far away.
    val tz = df.sparkSession.conf.get("spark.sql.session.timeZone")
    require(tz == "UTC",
      s"events reader requires spark.sql.session.timeZone=UTC (got '$tz'): " +
        "NTZ parquet timestamps are reinterpreted in the session zone")
    df.schema(c).dataType match {
      case org.apache.spark.sql.types.LongType =>
        df.withColumn(c, timestamp_micros(expr(s"$c DIV 1000")))
      case org.apache.spark.sql.types.TimestampNTZType =>
        df.withColumn(c, col(c).cast("timestamp"))
      case org.apache.spark.sql.types.TimestampType => df
      // A new driver data generation with yet another physical type (string,
      // INT96, ...) must fail AT THE SOURCE — flowing through unnormalized
      // would surface as oracle mismatches with no pointer back to the cause.
      case other => throw new IllegalStateException(
        s"events.$c has unsupported physical type $other; " +
          "extend Tables.normalizeTs for this data generation")
    }
  }

  /** Time-range scan over events with the range predicate applied to the
    * RAW stored column (in its native type), so it reaches the parquet scan
    * as a PushedFilter — a predicate on a converted `ts` is a
    * derived-column filter and cannot push (the hypertable-chunk-exclusion
    * analog for this table). */
  def eventsRange(spark: SparkSession, sfDir: String,
      fromTs: java.sql.Timestamp, untilTs: java.sql.Timestamp): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val raw = table(spark, sfDir, "events")
    // ns bounds via Instant so both branches share boundary precision —
    // Timestamp.getTime truncates to ms, which would make sub-ms bounds
    // select different rows depending on which generation is on disk.
    def ns(t: java.sql.Timestamp): Long = {
      val i = t.toInstant
      i.getEpochSecond * 1000000000L + i.getNano
    }
    val (lo, hi) = raw.schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType =>
        (lit(ns(fromTs)), lit(ns(untilTs)))
      case org.apache.spark.sql.types.TimestampNTZType =>
        def ntz(t: java.sql.Timestamp) = lit(java.time.LocalDateTime.ofInstant(
          t.toInstant, java.time.ZoneOffset.UTC))
        (ntz(fromTs), ntz(untilTs))
      case _ => (lit(fromTs), lit(untilTs))
    }
    normalizeTs(raw.filter(col("ts") >= lo && col("ts") < hi), "ts")
  }
  def documents(spark: SparkSession, sfDir: String): DataFrame = table(spark, sfDir, "documents")
  def embeddings(spark: SparkSession, sfDir: String): DataFrame = table(spark, sfDir, "embeddings")

  /** Tick stream stand-in: one row per event.
    * Columns: symbol STRING, time TIMESTAMP, price DOUBLE, volume LONG. */
  def ticks(spark: SparkSession, sfDir: String): DataFrame =
    events(spark, sfDir).select(
      col("user_id").cast("string").as("symbol"),
      col("ts").as("time"),
      col("value").as("price"),
      (col("event_id") % 97 + 1).cast("long").as("volume"))

  /** OHLCV bars bucketed per (symbol, hour) — the batch-path input
    * (backfill.py:103 uses daily bars; hourly keeps enough rows per symbol
    * at small SF for the long-warmup indicators).
    *
    * open/close are arg-min/arg-max of price by time within the bucket;
    * volume is the bucket sum. One shuffle on (symbol, time). */
  def bars(spark: SparkSession, sfDir: String, bucket: String = "hour"): DataFrame =
    ticks(spark, sfDir)
      .groupBy(col("symbol"), date_trunc(bucket, col("time")).as("time"))
      .agg(
        min_by(col("price"), col("time")).as("open"),
        max(col("price")).as("high"),
        min(col("price")).as("low"),
        max_by(col("price"), col("time")).as("close"),
        sum(col("volume")).as("volume"))

  /** Live-path bars: OHLC all faked from the tick price, volume null
    * (consumer.py:153-159). One row per tick. */
  def liveBars(spark: SparkSession, sfDir: String): DataFrame =
    ticks(spark, sfDir).select(
      col("time"),
      col("symbol"),
      col("price").as("open"),
      col("price").as("high"),
      col("price").as("low"),
      col("price").as("close"),
      lit(null).cast("long").as("volume"))
}
