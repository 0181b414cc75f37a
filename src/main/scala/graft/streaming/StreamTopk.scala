package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery

import graft.functions.FreqSketch

/** Streaming heavy hitters — the streaming face of the Misra–Gries
  * sketch family ([[graft.functions.FreqSketch]]), completing the
  * "every batch family has a streaming sibling" pattern for sketches
  * (dedup, decontamination, CDC, drift, sessionization already do).
  *
  * Shape: every micro-batch writes ITS OWN O(k) MG summary as one
  * binary-column segment, overwrite-keyed by batch id — so at-least-once
  * replays are idempotent by construction (re-processing batch b
  * overwrites b's segment with the identical sketch of the identical
  * slice; no read-modify-write state to double-merge, the failure mode a
  * running-summary design would have). The queryable corpus summary is
  * one associative `mg_merge` over the segments at READ time — the
  * sketch family's reduce-once/roll-up-forever contract as a stream:
  * per-batch cost is one scan of the batch, segments are O(k) each, and
  * the rollup never rescans raw data.
  *
  * Exactness: MG item estimates are merge-order dependent, but the
  * summary THEOREMS — est ≤ true ≤ est + d for every reported item,
  * presence of every item with true > d, d ≤ n/k, and n exactly the
  * total mass — hold under arbitrary merge trees (Agarwal et al.,
  * Mergeable Summaries, PODS'12), so the per-batch/merge-at-read split
  * changes nothing the contract-gated companion checks. With k larger
  * than the live vocabulary no trim ever fires and the merged summary is
  * EXACT and merge-order independent (stream == batch bit-for-bit,
  * pinned in StreamTopkSpec).
  */
object StreamTopk {

  /** item stream (one STRING column `itemCol`) → per-batch MG sketch
    * segments under `workDir/topk`, checkpoint under `workDir/ckpt`. */
  def run(stream: DataFrame, itemCol: String, k: Int,
      workDir: String): StreamingQuery =
    stream.writeStream
      .option("checkpointLocation", s"$workDir/ckpt")
      .foreachBatch { (mb: DataFrame, batchId: Long) =>
        mb.agg(FreqSketch.mgSketch(col(itemCol), k).as("sk"))
          .withColumn("batch_id", lit(batchId))
          .write.mode("overwrite").parquet(f"$workDir/topk/b-$batchId%09d")
        ()
      }
      .start()

  /** All per-batch sketch segments (binary `sk` + `batch_id`). */
  def segments(spark: SparkSession, workDir: String): DataFrame =
    spark.read.option("recursiveFileLookup", "true").parquet(s"$workDir/topk")

  /** The merged corpus summary so far — one associative mg_merge over
    * the O(k)-sized segments, never a raw-data rescan. */
  def merged(spark: SparkSession, workDir: String, k: Int): DataFrame =
    segments(spark, workDir).agg(FreqSketch.mgMerge(col("sk"), k).as("s"))
}
