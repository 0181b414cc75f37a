package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery

import graft.operators.Dedup
import graft.operators.Materialize.MatOps

/** Streaming near-dup screening — the online half of [[Dedup.incremental]]
  * (the way [[CusumMonitor]] is the online half of Signals.cusum): every
  * micro-batch of incoming documents is screened against the corpus LSH
  * index plus everything admitted in earlier micro-batches, emitting the
  * same per-doc (status, match_id, counts) report the batch operator
  * produces. Feeding micro-batches in id order reproduces the one-shot
  * batch report bit-for-bit (StreamDedupSpec).
  *
  * State is the accumulated SHINGLE INDEX of seen stream docs — (doc_id,
  * h) rows appended per batch to parquet, the durable-band-index analog of
  * IdempotentSink's parquet state (restart-safe, readable by the next
  * batch, and exactly what [[Dedup.screenBatch]]'s verification needs; raw
  * text is never retained). At 100 TB the same layout holds: the corpus +
  * seen index is the big side, bucketed by shingle hash, and each
  * micro-batch is a small probe joined against it — the stream never
  * self-joins the corpus.
  *
  * foreachBatch is at-least-once on restart: a replayed batch re-appends
  * its decisions. The ingest path's IdempotentSink (anti-join on doc_id)
  * is the standard fix where the decisions table must be a primary-keyed
  * store; the seen-index re-append is harmless (verifyJaccard reads
  * distinct shingle rows).
  */
object StreamDedup {

  /** docs (doc_id LONG, text STRING) stream → per-micro-batch screening
    * decisions appended to `workDir/decisions`, seen-index state under
    * `workDir/seen_idx`, checkpoint under `workDir/ckpt`. */
  def run(stream: DataFrame, corpusDocs: DataFrame, workDir: String,
      tau: Double, n: Int = 3): StreamingQuery = {
    val spark = corpusDocs.sparkSession
    // one-time at stream start; a production deployment persists this
    // (bucketed by h) instead of re-deriving it from corpus text
    val corpusIdx = Dedup.shingleIndex(corpusDocs, n)
      .select(col("doc_id"), col("h"), lit(true).as("is_corpus"))
      .materialize
    stream.writeStream
      .option("checkpointLocation", s"$workDir/ckpt")
      .foreachBatch { (mb: DataFrame, _: Long) =>
        val batchIdx = Dedup.shingleIndex(mb, n).materialize
        val refIdx = corpusIdx.unionByName(seenIdx(spark, workDir)
          .select(col("doc_id"), col("h"), lit(false).as("is_corpus")))
        Dedup.screenBatch(refIdx, batchIdx, tau)
          .write.mode("append").parquet(s"$workDir/decisions")
        batchIdx.write.mode("append").parquet(s"$workDir/seen_idx")
        ()
      }
      .start()
  }

  /** Accumulated (doc_id, h) index of stream docs seen so far; empty
    * before the first batch lands. */
  def seenIdx(spark: SparkSession, workDir: String): DataFrame =
    scala.util.Try(spark.read.parquet(s"$workDir/seen_idx")).getOrElse {
      import org.apache.spark.sql.types._
      spark.createDataFrame(new java.util.ArrayList[org.apache.spark.sql.Row](),
        StructType(Seq(StructField("doc_id", LongType), StructField("h", LongType))))
    }

  /** All decisions emitted so far (the queryable output table). */
  def decisions(spark: SparkSession, workDir: String): DataFrame =
    spark.read.parquet(s"$workDir/decisions")
}
