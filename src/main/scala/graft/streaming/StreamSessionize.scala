package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery

/** Event-time sessionization over a live stream — the streaming face of
  * the batch gap-cut query (q_sessionize), completing the batch↔stream
  * pairing the other ingest gates already have (dedup, decontamination,
  * CDC, drift). Built on Structured Streaming's native `session_window`
  * aggregation: per-key windows that merge while events keep arriving
  * within the gap, finalized and APPENDED once the event-time watermark
  * passes the session's merge horizon — so state holds only OPEN
  * sessions, bounded by (active keys × one window), never history.
  * Reference semantics: trading-etl-python keeps count-bounded per-key
  * state (consumer.py:33,162-163); the gap-bounded variant is the same
  * keyed-state shape with an event-time eviction rule.
  *
  * Parity contract (pinned in StreamSessionizeSpec and oracle-gated by
  * q_stream_sessionize against the BATCH query's own DuckDB oracle):
  * identical sessions to the batch window-sum — including the exact-gap
  * edge. Batch keeps gap ≤ G µs in one session; `session_window(ts, G)`
  * merges INCLUSIVELY (an event exactly at the horizon still joins —
  * verified by the spec's exact-gap test, where a G+1 duration wrongly
  * merged a G+1 gap), so the same G is the bit-equal choice.
  *
  * The sink is the exactly-once streaming FileSink (its _spark_metadata
  * commit log makes at-least-once replays invisible to readers) — no
  * hand-rolled idempotence needed, unlike the overwrite-keyed screens.
  *
  * Flush: append mode only emits sessions the watermark has passed, so
  * a bounded replay ends with its final sessions still open. The caller
  * appends ONE sentinel event (far-future ts, reserved key) as a last
  * feed file; it advances the global watermark past every real session,
  * the no-data-batch machinery emits them, and [[report]] drops the
  * sentinel key (whose own session never closes — by design).
  *
  * 100 TB shape: the aggregation hash-shuffles once on the session key;
  * state is per-OPEN-key only (RocksDB-backed at scale), output appends
  * — the same plan at 1000 executors, no driver state.
  */
object StreamSessionize {

  /** Reserved key for the watermark-flush sentinel; [[report]] drops it. */
  val SentinelUser = -1L

  /** Inactivity gap (µs), shared by batch cut and session_window. */
  val GapUs = 1800000000L

  /** events-shaped stream (user_id, ts, value, …) → finalized sessions
    * appended under `workDir/sessions`, checkpoint under `workDir/ckpt`.
    *
    * `lateDelay` is the out-of-order tolerance (the `withWatermark`
    * delay), the session analog of [[StreamJoin.run]]'s knob — with one
    * session-window subtlety: Spark's late filter drops on the window
    * END, and an event's provisional window is [ts, ts+gap), so the
    * hard drop line is `max − lateDelay − gap` (not `max − lateDelay`).
    * An event up to `lateDelay` behind the stream's max is FULLY safe:
    * its session cannot have finalized yet (the watermark trails by
    * `lateDelay`), so it merges exactly as in batch. An event more than
    * `lateDelay + gap` behind is deterministically dropped and its
    * session finalizes without it (spec-measured via
    * numRowsDroppedByWatermark) — never a silent mis-merge. Between the
    * two lines, an event is admitted but may open a FRESH session if
    * its batch-session already finalized — size `lateDelay` to the
    * feed's real disorder to stay out of that zone. The price is state
    * lifetime: sessions emit only once `max − lateDelay` passes their
    * merge horizon. "0 seconds" (the parity default) is exact for the
    * non-decreasing event times the ordered replay feeds deliver. */
  def run(stream: DataFrame, workDir: String,
      lateDelay: String = "0 seconds"): StreamingQuery =
    stream
      .withWatermark("ts", lateDelay)
      .groupBy(col("user_id"),
        session_window(col("ts"), s"$GapUs microseconds"))
      .agg(
        min(col("ts")).as("session_start"),
        max(col("ts")).as("session_end"),
        count(lit(1)).as("n_events"),
        sum(floor(col("value") * 100 + lit(0.5)).cast("long")).as("vc"))
      .select(col("user_id"), col("session_start"), col("session_end"),
        col("n_events"), col("vc"))
      .writeStream
      .outputMode("append")
      .option("checkpointLocation", s"$workDir/ckpt")
      .format("parquet")
      .option("path", s"$workDir/sessions")
      .start()

  /** All finalized sessions, numbered per user in start order — exactly
    * the batch query's output shape. Per-user sessions are disjoint
    * ordered intervals, so ranking closed sessions by start time yields
    * the same ordinals as the batch cumulative session-start sum. */
  def report(spark: SparkSession, workDir: String): DataFrame = {
    val w = Window.partitionBy(col("user_id")).orderBy(col("session_start"))
    spark.read.parquet(s"$workDir/sessions")
      .filter(col("user_id") =!= lit(SentinelUser))
      .withColumn("session_id", row_number().over(w).cast("long"))
      .select(col("user_id"), col("session_id"), col("session_start"),
        col("session_end"), col("n_events"),
        (col("vc") / lit(100.0)).as("total_value"))
  }
}
