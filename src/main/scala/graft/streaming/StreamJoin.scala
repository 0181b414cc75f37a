package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery

/** Stream-stream event-time interval join — the remaining canonical
  * Structured Streaming shape after the keyed-state (indicators, dedup,
  * CDC), stateless-per-batch (drift), and session-window families: two
  * LIVE streams joined on a key plus a bounded event-time window, the
  * "did B follow A within T?" primitive (action→error attribution here;
  * impression→click, order→fill, request→timeout in general).
  *
  * Spark buffers both sides in keyed state and joins as matches become
  * possible; the event-time watermarks plus the two-sided time-range
  * condition bound that state — a row is dropped the moment the other
  * side's watermark passes its window, so state is O(window × arrival
  * rate) per key, never history. An INNER join emits each match in the
  * micro-batch where both sides are first present (no flush sentinel
  * needed, unlike the session-window append); LEFT OUTER additionally
  * emits null-matched lefts exactly when eviction proves them
  * unmatched — the same state machine, exercised on its timeout edge.
  *
  * Parity contract (StreamJoinSpec + verify-only q_stream_join gated on
  * a plain batch-SQL oracle): the streamed match set equals the batch
  * interval join row for row — the join condition is exact event-time
  * arithmetic, so nothing is approximate. Sink = the exactly-once
  * streaming FileSink, same as StreamSessionize.
  *
  * 100 TB shape: state shuffles once on the join key; output appends;
  * the same plan runs at 1000 executors with RocksDB-backed state. */
object StreamJoin {

  /** `left` rows matched to `right` rows of the same `keyCol` whose `ts`
    * falls in [left.ts, left.ts + windowUs]; emits key, both ids, and
    * the event-time gap. Both inputs must carry (keyCol, idCol, ts).
    *
    * `joinType` "inner" emits matches as they become possible;
    * "left_outer" ALSO emits each unmatched left row (null right_id /
    * gap_us) — but only once the watermark proves no right row can
    * still arrive inside its window. The eviction watermark is the MIN
    * across BOTH sides' watermark nodes, so a bounded replay must
    * append a far-future sentinel row to EACH stream to flush the tail
    * (advancing one side alone flushes nothing — spec-measured); the
    * caller filters the reserved sentinel key from the report.
    *
    * `lateDelay` is the out-of-order tolerance (`withWatermark` delay on
    * BOTH sides): a row arriving with an event time up to `lateDelay`
    * behind the stream's max still joins; older rows are dropped as
    * late, and with "left_outer" their would-be partners finalize as
    * null matches — the deterministic late-data contract, spec-pinned in
    * StreamJoinSpec. The price is state: rows are evictable only
    * `lateDelay` later, so state is O((window + lateDelay) × arrival
    * rate) per key. "0 seconds" (the parity default) admits only
    * non-decreasing event times, which is what the ordered replay feeds
    * deliver. */
  def run(left: DataFrame, right: DataFrame, keyCol: String, idCol: String,
      windowUs: Long, workDir: String, joinType: String = "inner",
      lateDelay: String = "0 seconds"): StreamingQuery = {
    val a = left.withWatermark("ts", lateDelay).alias("a")
    val b = right.withWatermark("ts", lateDelay).alias("b")
    a.join(b, expr(
        s"""a.$keyCol = b.$keyCol AND
           |b.ts >= a.ts AND
           |b.ts <= a.ts + INTERVAL $windowUs MICROSECOND""".stripMargin),
        joinType)
      .select(col(s"a.$keyCol").as(keyCol),
        col(s"a.$idCol").as("left_id"), col(s"b.$idCol").as("right_id"),
        (unix_micros(col("b.ts")) - unix_micros(col("a.ts"))).as("gap_us"))
      .writeStream
      .outputMode("append")
      .option("checkpointLocation", s"$workDir/ckpt")
      .format("parquet")
      .option("path", s"$workDir/matches")
      .start()
  }

  /** All matches streamed so far. */
  def report(spark: SparkSession, workDir: String): DataFrame =
    spark.read.parquet(s"$workDir/matches")
}
