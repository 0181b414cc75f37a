package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Table profiling (the ANALYZE/data-quality primitive): per-column
  * row/null/distinct counts and min/max, in ONE scan of the table.
  *
  * All per-column metrics are computed in a single wide aggregate — the
  * plan is one scan + one Expand-based aggregation (Spark rewrites the
  * multiple COUNT DISTINCTs into grouping sets), then a `stack` unpivot
  * of the single result row into long format. No per-column scans, no
  * driver-side loop over columns.
  *
  * min/max are computed on the TYPED column and cast to string afterwards
  * (so "min of a long" is numeric order, not lexicographic), which keeps
  * one output schema for any column mix.
  *
  * At 100 TB exact COUNT DISTINCT is the expensive metric (it's what the
  * Expand shuffles); [[approxProfile]] swaps it for HyperLogLog++
  * `approx_count_distinct` — same shape, one ordinary aggregate, the
  * variant a cluster job would run (engine-specific sketch ⇒ no DuckDB
  * oracle, spec-tested instead).
  */
object Profile {

  private def aggs(cols: Seq[String], exact: Boolean) =
    count(lit(1)).as("__total") +: cols.flatMap { c =>
      Seq(
        count(col(c)).as(s"__cnt_$c"),
        (if (exact) countDistinct(col(c))
         else approx_count_distinct(col(c))).as(s"__nd_$c"),
        min(col(c)).cast("string").as(s"__mn_$c"),
        max(col(c)).cast("string").as(s"__mx_$c"))
    }

  private def unpivot(one: DataFrame, cols: Seq[String]): DataFrame = {
    val stackArgs = cols
      .map(c => s"'$c', __total - __cnt_$c, __nd_$c, __mn_$c, __mx_$c")
      .mkString(", ")
    one.selectExpr("__total AS n_rows",
      s"stack(${cols.size}, $stackArgs) AS (col_name, n_null, n_distinct, min_s, max_s)")
      .select(col("col_name"), col("n_rows"), col("n_null"),
        col("n_distinct"), col("min_s"), col("max_s"))
  }

  /** Exact profile (oracle-checkable). */
  def profile(df: DataFrame, cols: Seq[String]): DataFrame = {
    val a = aggs(cols, exact = true)
    unpivot(df.agg(a.head, a.tail: _*), cols)
  }

  /** HLL++ profile — the 100 TB variant (approximate n_distinct). */
  def approxProfile(df: DataFrame, cols: Seq[String]): DataFrame = {
    val a = aggs(cols, exact = false)
    unpivot(df.agg(a.head, a.tail: _*), cols)
  }
}
