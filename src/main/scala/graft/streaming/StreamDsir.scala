package graft.streaming

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.streaming.StreamingQuery

import graft.operators.{Materialize, TextAnalysis}

/** Streaming DSIR quality weighting — the ingest-time form of
  * [[TextAnalysis.dsirWeights]], completing the streaming quality-gate
  * family next to [[StreamDedup]]/[[StreamDecontaminate]]/[[StreamDrift]]:
  * every micro-batch of incoming documents is scored for target-vs-raw
  * importance against the two FIXED hashed-n-gram bucket LMs.
  *
  * Like [[StreamDecontaminate]] this operator is STATELESS across
  * batches — the weight of a document depends only on its own grams and
  * the two bucket LMs, which are estimated ONCE at stream start from the
  * reference corpus (each is exactly nBuckets rows, bounded by
  * construction, so both broadcast into every batch). Every batch is one
  * linear pass sharing [[TextAnalysis.dsirBuckets]]/[[TextAnalysis
  * .dsirScore]] with the batch operator, so stream == batch by
  * construction — still pinned empirically in StreamDedupSpec, and
  * hash-gated against q_dsir's DuckDB oracle as q_stream_dsir.
  *
  * At 100 TB the reference-corpus LM estimation is the one corpus-sized
  * job, paid once offline; the per-batch cost is linear in batch bytes
  * with zero state, so the gate adds no memory footprint to the ingest
  * path (contrast the dedup screens, whose seen-set state grows with the
  * corpus).
  */
object StreamDsir {

  /** docs (doc_id LONG, text STRING) stream → per-doc weight report
    * under `workDir/report`, one overwrite-keyed dir per batch so an
    * at-least-once replay cannot duplicate report rows. `refDocs` +
    * `targetPred` define the two bucket LMs (target = the refDocs slice
    * matching the predicate, raw = all of refDocs). */
  def run(stream: DataFrame, refDocs: DataFrame, targetPred: Column,
      nBuckets: Int, workDir: String): StreamingQuery = {
    // one feature-extraction pass over the reference corpus, reused by
    // both LM estimates; the resulting LM tables are nBuckets rows each
    val refGrams = Materialize(TextAnalysis.dsirBuckets(refDocs, nBuckets))
    val tgt = Materialize(TextAnalysis.dsirModel(
      refGrams.join(refDocs.filter(targetPred).select("doc_id"), "doc_id"),
      nBuckets))
    val raw = Materialize(TextAnalysis.dsirModel(refGrams, nBuckets))
    stream.writeStream
      .option("checkpointLocation", s"$workDir/ckpt")
      .foreachBatch { (mb: DataFrame, batchId: Long) =>
        TextAnalysis.dsirScore(mb,
            TextAnalysis.dsirBuckets(mb, nBuckets), tgt, raw)
          .write.mode("overwrite").parquet(f"$workDir/report/b-$batchId%09d")
        ()
      }
      .start()
  }

  def report(spark: SparkSession, workDir: String): DataFrame =
    spark.read.option("recursiveFileLookup", "true")
      .parquet(s"$workDir/report")
}
