package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.streaming.StreamingQuery

/** Streaming form of the STATELESS per-document quality gates — the
  * blocklist and repetition filters are pure scans (a document's verdict
  * depends only on its own tokens: no model, no thresholds learned from
  * other documents, no cross-document state), so their ingest-time form
  * is the thinnest member of the streaming gate family
  * ([[StreamDedup]]/[[StreamDecontaminate]]/[[StreamDsir]]/
  * [[StreamClassify]]/[[StreamPerplexity]]): one foreachBatch applying
  * the SAME batch operator to every micro-batch.
  *
  * Because the gate closes over nothing but constants (the term list /
  * the thresholds), stream == batch at ANY slicing or arrival order by
  * construction — stronger than the fixed-model gates, which at least
  * need their model materialized at stream start. Pinned empirically in
  * StreamDedupSpec and hash-gated against the batch oracles as
  * q_stream_blocklist / q_stream_repetition.
  *
  * At 100 TB these are the gates to run FIRST at the ingest edge (the
  * same reasoning that put blocklist first in [[graft.Curate]]): zero
  * shuffle for blocklist, one keyed micro-batch-local aggregate for
  * repetition's gram counts, zero streaming state, so back-pressure is
  * bounded by scan throughput alone.
  *
  * Reference lineage: the reference validates each polled record
  * stateless-ly at ingest, before any stateful transform
  * (trading-etl-python src/processing/consumer.py:146-149 — parse +
  * field checks per message, malformed rows skipped); this generalizes
  * that per-record validate-at-ingest shape to per-document content
  * gates. */
object StreamGate {

  /** docs stream → per-doc gate report under `workDir/report`, one
    * overwrite-keyed dir per batch so an at-least-once replay cannot
    * duplicate report rows. `gate` must be a stateless per-document
    * DataFrame transform (every output row derived from one input doc). */
  def run(stream: DataFrame, gate: DataFrame => DataFrame,
      workDir: String): StreamingQuery =
    stream.writeStream
      .option("checkpointLocation", s"$workDir/ckpt")
      .foreachBatch { (mb: DataFrame, batchId: Long) =>
        gate(mb).write.mode("overwrite").parquet(f"$workDir/report/b-$batchId%09d")
        ()
      }
      .start()

  def report(spark: SparkSession, workDir: String): DataFrame =
    spark.read.option("recursiveFileLookup", "true")
      .parquet(s"$workDir/report")
}
