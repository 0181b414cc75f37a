package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew-mitigation utilities for hot keys.
  *
  * `saltedAgg` is the classic two-phase aggregation: widen the grouping key
  * with a deterministic salt so a hot key's rows spread over `buckets`
  * partial groups, then combine partials. Spark's hash aggregate already
  * does map-side partial aggregation, so this matters mostly for (a)
  * collect-type aggregates that don't combine map-side and (b) extreme
  * single-key skew where even the reduce side of one key overflows a task;
  * at 100 TB it's the standard fix for power-law keys (SCALE.md).
  */
object Skew {

  /** Deterministic salt from arbitrary columns (stable across retries —
    * never use rand() for salting: task retries would re-deal rows).
    * Pass the most-distinct columns available: salting by a near-constant
    * column collapses every row into one bucket and silently disables the
    * spread. */
  def salt(buckets: Int, cols: Column*): Column =
    pmod(hash(cols: _*), lit(buckets))

  /** Two-phase sum/count per key with salted first phase. Returns
    * (key, total, n). Salts over ALL input columns — constant-value hot
    * keys (the canonical skew case) still spread as long as any column
    * varies; fully-duplicate rows are the one shape this can't split. */
  def saltedAgg(df: DataFrame, key: String, value: String, buckets: Int): DataFrame = {
    val partial = df
      .withColumn("__salt", salt(buckets, df.columns.map(col): _*))
      .groupBy(col(key), col("__salt"))
      .agg(sum(col(value)).as("__psum"), count(lit(1)).as("__pn"))
    partial.groupBy(col(key))
      .agg(sum(col("__psum")).as("total"), sum(col("__pn")).cast("long").as("n"))
  }
}
