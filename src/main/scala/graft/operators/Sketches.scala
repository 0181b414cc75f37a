package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Mergeable-sketch pre-aggregation — the canonical 100 TB distinct-count
  * architecture. Exact COUNT DISTINCT cannot pre-aggregate (distinct
  * users per day don't sum to distinct users per week), so at scale the
  * corpus is reduced once to per-partition DataSketches HLL sketches
  * (binary column, persisted) and every later rollup merges sketches
  * instead of re-scanning raw data. HLL union is register-wise max, so
  * merging partition sketches yields EXACTLY the sketch of the union —
  * the merged estimate is bit-identical to sketching the raw corpus in
  * one pass (asserted in SketchSpec), under any partitioning.
  *
  * Engine-specific binary (no DuckDB mirror) ⇒ the shipped query is
  * rows-only at the oracle gate, like q_sketches; the algebraic
  * merge == direct identity is what the spec pins instead.
  */
object Sketches {

  /** Phase 1 (run once over raw events): per-(day, event_type) HLL
    * sketches of distinct users + exact row counts. This is the table a
    * real pipeline persists, partitioned by day. */
  def dailyUserSketches(events: DataFrame): DataFrame =
    events
      .groupBy(to_date(col("ts")).as("day"), col("event_type"))
      .agg(hll_sketch_agg(col("user_id")).as("user_sketch"),
        count(lit(1)).as("n_events"))

  /** Phase 2 (runs against the persisted sketch table only): global
    * per-type distinct-user estimates via sketch union — no raw-data
    * scan. Input size is O(days × types), so this aggregates in
    * milliseconds at any corpus scale. */
  def rollupUsers(daily: DataFrame): DataFrame =
    daily
      .groupBy(col("event_type"))
      .agg(hll_sketch_estimate(hll_union_agg(col("user_sketch")))
          .as("approx_users"),
        sum(col("n_events")).as("n_events"),
        count(lit(1)).as("n_days"))
}
