package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.streaming.StreamingQuery
import org.apache.spark.sql.functions._

import graft.operators.{Dedup, Materialize}

/** Streaming FUZZY decontamination — the ingest-time form of
  * [[Dedup.fuzzyDecontaminate]], completing the near-dup leg of the
  * streaming quality gate next to [[StreamDecontaminate]] (exact grams):
  * every micro-batch of incoming documents is MinHash-banded and screened
  * against the held-out eval set for near-copy contamination.
  *
  * Like the exact screen this is STATELESS across batches — the eval set
  * is FIXED, so its shingle index and band table are built once at stream
  * start (a benchmark suite is thousands of docs; both tables broadcast)
  * and each batch is one cross-set band probe + candidate verify. A doc's
  * report depends only on (doc, eval set), so stream == batch regardless
  * of micro-batch boundaries, and the per-batch overwrite-keyed output
  * dirs make at-least-once replays idempotent (re-processing batch b
  * rewrites b's report identically). */
object StreamFuzzyDecontam {

  /** docs (doc_id LONG, text STRING) stream → contaminated-doc report
    * (doc_id, eval_match, max_jaccard, n_eval_matches) under
    * `workDir/report`, one dir per batch. */
  def run(stream: DataFrame, evalDocs: DataFrame, workDir: String,
      tau: Double, n: Int = 3): StreamingQuery = {
    val evalIdx = Materialize(Dedup.shingleIndex(evalDocs, n))
    val evalBands = Materialize(
      Dedup.bandsOf(Dedup.minhashSignaturesFromIndex(evalIdx)))
    stream.writeStream
      .option("checkpointLocation", s"$workDir/ckpt")
      .foreachBatch { (mb: DataFrame, batchId: Long) =>
        val batchIdx = Materialize(Dedup.shingleIndex(mb, n))
        val batchBands = Dedup.bandsOf(
          Dedup.minhashSignaturesFromIndex(batchIdx))
        Dedup.fuzzyScreenBands(batchBands, evalBands,
            batchIdx.unionByName(evalIdx), tau)
          .write.mode("overwrite").parquet(f"$workDir/report/b-$batchId%09d")
        ()
      }
      .start()
  }

  def report(spark: SparkSession, workDir: String): DataFrame =
    spark.read.option("recursiveFileLookup", "true")
      .parquet(s"$workDir/report")
}
