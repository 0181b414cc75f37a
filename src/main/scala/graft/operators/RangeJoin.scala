package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Bucketized range (interval) join. Spark has no range-join optimizer: a
  * bare `e.ts >= iv.lo AND e.ts < iv.hi` join condition has no equi-key,
  * so Catalyst plans BroadcastNestedLoopJoin — every event × every
  * interval, the N² shape that kills 100 TB runs (DuckDB/Trino special-case
  * this with an interval tree; Databricks with a range-join hint).
  *
  * The portable fix is binning: quantize time into fixed-width buckets,
  * explode each interval into the buckets it covers, and equi-join events
  * to interval-buckets on the bucket id, re-checking the exact range on
  * the (tiny) candidate set. One keyed shuffle, parallel in bucket count.
  * An event's timestamp lives in exactly one bucket, so a matching
  * interval meets it in exactly one bucket row — no dedup pass needed.
  *
  * Bucket width trades shuffle size against candidate precision: width ≈
  * the typical interval length keeps the explode factor ~2 and the false
  * candidates near zero.
  */
object RangeJoin {

  /** Join `left` rows (timestamp column `leftTs`, µs precision) to
    * `intervals` rows covering them: `lo <= leftTs < hi`. All three
    * bound columns are TIMESTAMP; `bucketWidthUs` is the bin width in
    * microseconds. Returns left ⋈ interval with all columns of both. */
  def binned(left: DataFrame, leftTs: Column,
      intervals: DataFrame, lo: Column, hi: Column,
      bucketWidthUs: Long): DataFrame = {
    require(bucketWidthUs > 0, "bucketWidthUs must be positive")
    val w = lit(bucketWidthUs)
    val evBucket = floor(unix_micros(leftTs) / w).cast("long")
    // interval covers buckets floor(lo/w) .. floor((hi-1µs)/w)  (hi exclusive)
    val ivBuckets = sequence(
      floor(unix_micros(lo) / w).cast("long"),
      floor((unix_micros(hi) - 1) / w).cast("long"))
    val ev = left.withColumn("_bucket", evBucket)
    val iv = intervals.withColumn("_bucket", explode(ivBuckets))
    ev.join(iv, "_bucket")
      .filter(leftTs >= lo && leftTs < hi)
      .drop("_bucket")
  }
}
