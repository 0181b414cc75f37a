package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery

import graft.operators.Drift
import graft.operators.Materialize.MatOps

/** Ingest-time distribution-drift monitor — the streaming face of
  * [[Drift]], completing the ingest-gate family (dedup text/vector,
  * decontamination, CDC merge, now data-quality): a REFERENCE histogram
  * source (a known-good snapshot) is fixed at stream start, and every
  * micro-batch emits the full per-bin PSI/JS drift table for ITS OWN
  * rows, tagged with the batch id — the per-arrival signal a pipeline
  * pages on when an upstream schema/unit/source change skews a feed.
  *
  * Stateless across batches (each batch is compared to the reference,
  * not to its predecessors), so the only state is the output table
  * itself — written overwrite-keyed by batch id, making at-least-once
  * replays idempotent exactly like the other screens. The reference
  * frame is materialized once at start; at 100 TB you persist its
  * binned counts instead and the per-batch cost is one scan of the
  * batch plus a k-bin join. */
object StreamDrift {

  /** rows stream → per-batch drift tables under `workDir/drift`,
    * checkpoint under `workDir/ckpt`. */
  def run(stream: DataFrame, ref: DataFrame, valueCol: String,
      binWidth: Double, maxBin: Int, workDir: String): StreamingQuery = {
    val refM = ref.materialize // one histogram source, scanned per batch
    stream.writeStream
      .option("checkpointLocation", s"$workDir/ckpt")
      .foreachBatch { (mb: DataFrame, batchId: Long) =>
        Drift.drift(refM, mb, valueCol, binWidth, maxBin)
          .withColumn("batch_id", lit(batchId))
          .write.mode("overwrite").parquet(f"$workDir/drift/b-$batchId%09d")
        ()
      }
      .start()
  }

  /** Every batch's drift table so far (the queryable monitor output). */
  def report(spark: SparkSession, workDir: String): DataFrame =
    spark.read.option("recursiveFileLookup", "true")
      .parquet(s"$workDir/drift")
}
