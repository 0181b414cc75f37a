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
    * `workDir/report`, one dir per batch.
    *
    * CONTRACT: stream doc_ids must be DISJOINT from eval doc_ids — the
    * verify step unions both sides' shingle indexes, so a shared id would
    * silently merge the two documents' shingle sets and corrupt every
    * Jaccard it participates in. Asserted per batch (one broadcast
    * semi-probe against the benchmark-sized eval id set; limit-1 action). */
  def run(stream: DataFrame, evalDocs: DataFrame, workDir: String,
      tau: Double, n: Int = 3): StreamingQuery = {
    val evalIdx = Materialize(Dedup.shingleIndex(evalDocs, n))
    val evalIds = Materialize(evalIdx.select(col("doc_id")).distinct())
    val evalBands = Materialize(
      Dedup.bandsOf(Dedup.minhashSignaturesFromIndex(evalIdx)))
    stream.writeStream
      .option("checkpointLocation", s"$workDir/ckpt")
      .foreachBatch { (mb: DataFrame, batchId: Long) =>
        val batchIdx = Materialize(Dedup.shingleIndex(mb, n))
        require(batchIdx.select(col("doc_id")).distinct()
            .join(broadcast(evalIds), "doc_id").isEmpty,
          s"batch $batchId carries doc_ids that collide with the eval set " +
            "— stream and eval ids must be disjoint")
        val batchBands = Dedup.bandsOf(
          Dedup.minhashSignaturesFromIndex(batchIdx))
        Dedup.fuzzyScreenBands(batchBands, evalBands,
            batchIdx.unionByName(evalIdx), tau)
          .write.mode("overwrite").parquet(f"$workDir/report/b-$batchId%09d")
        ()
      }
      .start()
  }

  /** Report schema (shared by the read path and the zero-batch case). */
  private val ReportSchema = org.apache.spark.sql.types.StructType.fromDDL(
    "doc_id BIGINT, eval_match BIGINT, max_jaccard DOUBLE, n_eval_matches BIGINT")

  /** Concatenated per-batch reports. An empty feed writes NO batch dirs
    * (foreachBatch never fires), so the read would throw on the missing
    * path — an empty stream is a valid run and returns an empty report
    * with the same schema instead. */
  def report(spark: SparkSession, workDir: String): DataFrame = {
    val p = new org.apache.hadoop.fs.Path(s"$workDir/report")
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(p))
      spark.createDataFrame(spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
        ReportSchema)
    else
      spark.read.option("recursiveFileLookup", "true")
        .parquet(s"$workDir/report")
  }
}
