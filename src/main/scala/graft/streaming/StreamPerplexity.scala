package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.streaming.StreamingQuery

import graft.operators.TextAnalysis

/** Streaming CCNet perplexity routing — the ingest-time form of
  * [[TextAnalysis.ccnetBucketsFixed]], completing the streaming
  * quality-gate family ([[StreamDedup]]/[[StreamDecontaminate]]/
  * [[StreamDsir]]/[[StreamClassify]]) with its PERPLEXITY leg: the
  * Kneser–Ney model is estimated once at stream start from the target
  * corpus, the head/middle/tail cut-points are calibrated once from a
  * scored sample (Wenzek et al. 2020 §3.3 — this is why the FIXED-
  * threshold form exists: a micro-batch cannot know the full corpus's
  * terciles, so the streamable contract is "fixed model + fixed
  * thresholds"), and every incoming micro-batch is routed statelessly.
  *
  * Stateless across batches — a document's bucket depends only on its
  * own tokens, the model tables, and two threshold doubles — so
  * stream == batch at any slicing by construction; hash-gated against
  * q_ccnet_fixed's DuckDB oracle as q_stream_ccnet.
  *
  * At 100 TB the corpus-sized work (model estimation + calibration) is
  * paid once offline; per-batch cost is one gram explode + the
  * vocabulary-bounded keyed joins, with zero streaming state.
  */
object StreamPerplexity {

  /** docs (doc_id LONG, text STRING) stream → per-doc bucket report
    * under `workDir/report`, one overwrite-keyed dir per batch so an
    * at-least-once replay cannot duplicate report rows. */
  def run(stream: DataFrame, trainDocs: DataFrame, calibDocs: DataFrame,
      workDir: String): StreamingQuery = {
    val model = TextAnalysis.knModel(trainDocs)
    val th = TextAnalysis.ccnetThresholds(model, calibDocs)
    stream.writeStream
      .option("checkpointLocation", s"$workDir/ckpt")
      .foreachBatch { (mb: DataFrame, batchId: Long) =>
        TextAnalysis.ccnetRoute(mb, model, th)
          .write.mode("overwrite").parquet(f"$workDir/report/b-$batchId%09d")
        ()
      }
      .start()
  }

  def report(spark: SparkSession, workDir: String): DataFrame =
    spark.read.option("recursiveFileLookup", "true")
      .parquet(s"$workDir/report")
}
