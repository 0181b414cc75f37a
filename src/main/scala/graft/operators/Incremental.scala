package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Incremental (mergeable-state) bar aggregation — the batch analog of a
  * streaming partial aggregate, and the pattern every 100 TB pipeline
  * needs for append-only reprocessing: yesterday's materialized partials
  * + today's delta slice merge into exactly the bars a full recompute
  * would produce, without rescanning history.
  *
  * The state is associative + commutative by construction:
  *   - open/close travel as (time, price) structs under struct MIN/MAX —
  *     Spark orders structs field-by-field, so the earliest (tie: lowest
  *     price) and latest (tie: highest price) tick win regardless of how
  *     the input was sliced. arg_min/min_by is NOT mergeable across
  *     partials (a partial only retains its own winner's value, not the
  *     key to re-compare) — the struct keeps both, which is what makes
  *     the merge exact;
  *   - high/low/volume/n_ticks merge as max/min/sum/sum.
  *
  * The DuckDB oracle recomputes bars from ALL ticks in one pass with the
  * same explicit (time, price) tie-break, so the correctness gate proves
  * the merge algebra, not just the happy path.
  */
object Incremental {

  /** Mergeable partial bar state over one tick slice. */
  def partialBars(ticks: DataFrame, bucket: String = "hour"): DataFrame =
    ticks.groupBy(col("symbol"), date_trunc(bucket, col("time")).as("time"))
      .agg(
        min(struct(col("time").as("t"), col("price").as("p"))).as("first_tick"),
        max(struct(col("time").as("t"), col("price").as("p"))).as("last_tick"),
        max(col("price")).as("high"),
        min(col("price")).as("low"),
        sum(col("volume")).as("volume"),
        count(lit(1)).as("n_ticks"))

  /** Merge any number of partial-state slices (associative). */
  def mergeBars(parts: DataFrame*): DataFrame =
    parts.reduce(_ unionByName _)
      .groupBy(col("symbol"), col("time"))
      .agg(
        min(col("first_tick")).as("first_tick"),
        max(col("last_tick")).as("last_tick"),
        max(col("high")).as("high"),
        min(col("low")).as("low"),
        sum(col("volume")).as("volume"),
        sum(col("n_ticks")).as("n_ticks"))

  /** Partial state → the user-facing OHLCV bar relation. */
  def finalizeBars(partial: DataFrame): DataFrame =
    partial.select(col("symbol"), col("time"),
      col("first_tick.p").as("open"), col("high"), col("low"),
      col("last_tick.p").as("close"), col("volume"), col("n_ticks"))
}
