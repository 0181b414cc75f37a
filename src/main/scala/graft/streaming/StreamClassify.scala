package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.streaming.StreamingQuery

import graft.operators.TextAnalysis

/** Streaming Naive Bayes classification — the ingest-time form of
  * [[TextAnalysis.nbClassify]], extending the streaming quality-gate
  * family ([[StreamDedup]]/[[StreamDecontaminate]]/[[StreamDsir]]) with
  * the classifier-routing step real ingest stacks run (CCNet's lang/
  * domain routing; quality-classifier gating): every micro-batch of
  * incoming documents is scored under the FIXED model trained once at
  * stream start from the labeled reference corpus.
  *
  * Like [[StreamDsir]] this gate is STATELESS across batches — a
  * document's prediction depends only on its own tokens and the trained
  * model (a C-row class table plus the ≤C·V-row count table, both
  * materialized once), so stream == batch at any slicing by
  * construction; pinned empirically in StreamDedupSpec and hash-gated
  * against q_nb_classify's DuckDB oracle as q_stream_nb.
  *
  * At 100 TB the one corpus-sized job is model estimation, paid once
  * offline; per-batch cost is one explode + a bounded broadcast widen +
  * a keyed count join, with zero streaming state.
  */
object StreamClassify {

  /** docs (doc_id LONG, text STRING, <labelCol> STRING) stream →
    * per-doc prediction report under `workDir/report`, one
    * overwrite-keyed dir per batch so an at-least-once replay cannot
    * duplicate report rows. */
  def run(stream: DataFrame, trainDocs: DataFrame, labelCol: String,
      workDir: String): StreamingQuery = {
    val model = TextAnalysis.nbModel(trainDocs, labelCol)
    stream.writeStream
      .option("checkpointLocation", s"$workDir/ckpt")
      .foreachBatch { (mb: DataFrame, batchId: Long) =>
        TextAnalysis.nbScore(mb, model, labelCol)
          .write.mode("overwrite").parquet(f"$workDir/report/b-$batchId%09d")
        ()
      }
      .start()
  }

  def report(spark: SparkSession, workDir: String): DataFrame =
    spark.read.option("recursiveFileLookup", "true")
      .parquet(s"$workDir/report")
}
