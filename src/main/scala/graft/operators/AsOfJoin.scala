package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of join: for every left row, attach the adjacent right row within
  * the same key — the canonical market-data enrichment (tick → prevailing
  * bar/quote), with the full pandas `merge_asof` parameter surface:
  *
  *   - direction = backward (default): most recent `right.time <=
  *     left.time` (inclusive);
  *   - direction = forward: first `right.time >= left.time` (inclusive);
  *   - direction = nearest: the closer of the two, ties → backward;
  *   - toleranceUs ≥ 0: matches farther than the tolerance (in µs of
  *     event time) are nulled out — rows stay (left-join semantics),
  *     their `asof_*` columns become NULL.
  *
  * Built by composition (preference order (a): no custom planner node
  * needed): tag both sides, union, and carry the right row across the
  * union with `last(_, ignoreNulls)` over a (key, time, side)-ordered
  * running frame (backward), or `first(_, ignoreNulls)` over the
  * following frame with the tie order flipped (forward) — the side sort
  * key makes both directions INCLUSIVE at equal timestamps, matching
  * DuckDB's native `ASOF JOIN` with `>=` / `<=` (which the oracles use).
  *
  * Scale: ONE shuffle on the key; backward/forward add one sort each
  * (nearest: two sorts, same exchange) — strictly cheaper than the naive
  * range-join (shuffle both sides, per-key sort-merge with backward
  * scan), and no custom SparkPlan to maintain. Skewed keys behave like
  * any window op (bounded by the largest single key's rows).
  */
object AsOfJoin {

  /** `left`/`right` both carry (`key`, `time`); `rightVals` are the right
    * columns to attach (prefixed `asof_` in the output, plus
    * `asof_time`).
    *
    * The right row travels as ONE struct, carried forward atomically:
    * per-column `last(_, ignoreNulls)` would resurrect older non-null
    * values past a newer right row's genuine NULL and could stitch fields
    * from different right rows together. */
  def asof(left: DataFrame, right: DataFrame, key: String, time: String,
      rightVals: Seq[String], direction: String = "backward",
      toleranceUs: Long = -1L): DataFrame = {
    require(Set("backward", "forward", "nearest")(direction),
      s"unknown as-of direction: $direction")
    val leftCols = left.columns.toSeq
    val rstruct = struct(col(time).as("t") +: rightVals.map(col): _*)
    val rstructType = right.select(rstruct.as("__r")).schema("__r").dataType
    // __side: left = 1, right = 0 (the backward sort puts right first at
    // equal times; the forward spec flips the tie with -__side)
    val l2 = left
      .withColumn("__side", lit(1))
      .withColumn("__r", lit(null).cast(rstructType))
      .select(Seq(col(key), col(time), col("__side"), col("__r")) ++
        leftCols.filterNot(Seq(key, time).contains).map(col): _*)
    val r2 = right
      .withColumn("__side", lit(0))
      .withColumn("__r", rstruct)
      .select(Seq(col(key), col(time), col("__side"), col("__r")) ++
        leftCols.filterNot(Seq(key, time).contains)
          .map(c => lit(null).cast(left.schema(c).dataType).as(c)): _*)
    val unioned = l2.unionByName(r2)

    val wb = Window.partitionBy(col(key)).orderBy(col(time), col("__side"))
      .rowsBetween(Window.unboundedPreceding, 0)
    val wf = Window.partitionBy(col(key))
      .orderBy(col(time), (lit(0) - col("__side")).as("__ord"))
      .rowsBetween(0, Window.unboundedFollowing)

    def withinTol(m: Column, dist: Column): Column =
      if (toleranceUs < 0) m
      else when(dist <= lit(toleranceUs), m)

    val distB = unix_micros(col(time)) - unix_micros(col("__mb.t"))
    val distF = unix_micros(col("__mf.t")) - unix_micros(col(time))

    val carried = direction match {
      case "backward" =>
        unioned.withColumn("__mb", last(col("__r"), ignoreNulls = true).over(wb))
          .withColumn("__match", withinTol(col("__mb"), distB))
      case "forward" =>
        unioned.withColumn("__mf", first(col("__r"), ignoreNulls = true).over(wf))
          .withColumn("__match", withinTol(col("__mf"), distF))
      case "nearest" =>
        unioned
          .withColumn("__mb", last(col("__r"), ignoreNulls = true).over(wb))
          .withColumn("__mf", first(col("__r"), ignoreNulls = true).over(wf))
          .withColumn("__b2", withinTol(col("__mb"), distB))
          .withColumn("__f2", withinTol(col("__mf"), distF))
          // both in tolerance → closer wins, tie → backward (pandas)
          .withColumn("__match",
            when(col("__b2").isNotNull && col("__f2").isNotNull,
              when(distB <= distF, col("__b2")).otherwise(col("__f2")))
              .otherwise(coalesce(col("__b2"), col("__f2"))))
    }
    carried.filter(col("__side") === 1)
      .withColumn("asof_time", col("__match.t"))
      .withColumns(rightVals.map(c => s"asof_$c" -> col(s"__match.$c")).toMap)
      .drop("__side", "__r", "__match", "__mb", "__mf", "__b2", "__f2")
  }
}
