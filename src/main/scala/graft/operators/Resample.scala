package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Regular-grid resampling with forward fill — the missing half of bar
  * construction (trading-etl-python/src/db/backfill.py:103 downsamples to
  * bars; a chart/API consumer then needs every grid slot present, carrying
  * the last observation across gaps).
  *
  * Shape: per-key min/max span (one partial aggregate), `sequence()` +
  * `explode` to manufacture the dense grid (rows ∝ span/step per key — no
  * cartesian), a keyed left join back to the observed rows, and one
  * `last(ignoreNulls)` running window per key for the fill. At 100 TB:
  * the grid is tiny relative to the fact table (keys × slots), the join
  * shuffles on the same (key, time) the window needs, and AQE coalesces
  * the small grid side; nothing is driver-side.
  */
object Resample {

  /** Dense per-key time grid from each key's min to max observed `time`,
    * stepping `step` (a Spark interval literal, e.g. "1 hour"). */
  def grid(df: DataFrame, key: String, time: String, step: String): DataFrame =
    df.groupBy(col(key))
      .agg(min(col(time)).as("t0"), max(col(time)).as("t1"))
      .select(col(key),
        explode(sequence(col("t0"), col("t1"), expr(s"INTERVAL $step"))).as(time))

  /** Missing-slot runs per key — gaps-and-islands over the dense grid.
    * Each maximal run of absent grid slots becomes one row (key,
    * gap_start, gap_end, gap_slots): consecutive missing slots share
    * `slot_ordinal − row_number`, the standard islands key. The slot
    * ordinal is a row_number over the full grid, so any `step` the grid
    * supports works unchanged (no second step parameter to keep in sync).
    * Cost: the grid windows plus one aggregate on the (tiny) missing-slot
    * set. The data-completeness audit a feed operator runs before
    * trusting a table. Same contract as [[ffill]]: observations must lie
    * exactly on the grid. */
  def gaps(df: DataFrame, key: String, time: String, step: String): DataFrame = {
    val w = Window.partitionBy(col(key)).orderBy(col(time))
    val g = grid(df, key, time, step).withColumn("slot", row_number().over(w))
    val missing = g.join(
        df.select(col(key), col(time)).withColumn("obs", lit(1)),
        Seq(key, time), "left")
      .filter(col("obs").isNull)
    missing
      .withColumn("island", col("slot") - row_number().over(w))
      .groupBy(col(key), col("island"))
      .agg(min(col(time)).as("gap_start"), max(col(time)).as("gap_end"),
        count(lit(1)).as("gap_slots"))
      .select(col(key), col("gap_start"), col("gap_end"), col("gap_slots"))
  }

  /** Left-join `df` onto its dense grid and forward-fill `fillCols`:
    * a missing slot carries the most recent observed value (the first slot
    * per key is always observed — the grid starts at min(time)). Adds
    * `filled` = 1 for manufactured rows.
    *
    * CONTRACT: observations must lie exactly on the step grid anchored at
    * each key's min(time) — i.e. the input is already bucketed (the
    * output of [[graft.sources.Tables.bars]], a date_trunc'd series, …).
    * An off-grid timestamp would silently miss the equality join and read
    * as a gap; bucket first (`date_trunc`) for raw feeds. */
  def ffill(df: DataFrame, key: String, time: String, step: String,
      fillCols: Seq[String]): DataFrame = {
    val g = grid(df, key, time, step)
    val joined = g.join(df, Seq(key, time), "left")
    val w = Window.partitionBy(col(key)).orderBy(col(time))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val filled = when(col(fillCols.head).isNull, lit(1)).otherwise(lit(0))
    fillCols.foldLeft(joined.withColumn("filled", filled)) { (acc, c) =>
      acc.withColumn(c, last(col(c), ignoreNulls = true).over(w))
    }
  }
}
