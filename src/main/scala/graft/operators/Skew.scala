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
    * never use rand() for salting: task retries would re-deal rows). */
  def salt(buckets: Int, cols: Column*): Column =
    pmod(hash(cols: _*), lit(buckets))

  /** Two-phase sum/count per key with salted first phase. Returns
    * (key, total, n). */
  def saltedAgg(df: DataFrame, key: String, value: String, buckets: Int): DataFrame = {
    val partial = df
      .withColumn("__salt", salt(buckets, col(value)))
      .groupBy(col(key), col("__salt"))
      .agg(sum(col(value)).as("__psum"), count(lit(1)).as("__pn"))
    partial.groupBy(col(key))
      .agg(sum(col("__psum")).as("total"), sum(col("__pn")).cast("long").as("n"))
  }
}
