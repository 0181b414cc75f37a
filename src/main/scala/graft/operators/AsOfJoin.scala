package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of join: for every left row, attach the most recent right row with
  * `right.time <= left.time` within the same key — the canonical
  * market-data enrichment (tick → prevailing bar/quote).
  *
  * Built by composition (preference order (a): no custom planner node
  * needed): tag both sides, union, and carry right-side values forward
  * with `last(_, ignoreNulls)` over one (key, time, side)-ordered window;
  * right sorts before left at equal timestamps, making the match
  * inclusive — the same semantics as DuckDB's native `ASOF JOIN` with
  * `t >= b.time` (which the oracle uses).
  *
  * Scale: ONE shuffle on the key and one sort — strictly cheaper than the
  * naive range-join (shuffle both sides, per-key sort-merge with backward
  * scan), and no custom SparkPlan to maintain. Skewed keys behave like any
  * window op (bounded by the largest single key's rows).
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
      rightVals: Seq[String]): DataFrame = {
    val leftCols = left.columns.toSeq
    val rstruct = struct(col(time).as("t") +: rightVals.map(col): _*)
    val rstructType = right.select(rstruct.as("__r")).schema("__r").dataType
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
    val w = Window.partitionBy(col(key)).orderBy(col(time), col("__side"))
      .rowsBetween(Window.unboundedPreceding, 0)
    val carried = l2.unionByName(r2)
      .withColumn("__match", last(col("__r"), ignoreNulls = true).over(w))
    carried.filter(col("__side") === 1)
      .withColumn("asof_time", col("__match.t"))
      .withColumns(rightVals.map(c => s"asof_$c" -> col(s"__match.$c")).toMap)
      .drop("__side", "__r", "__match")
  }
}
