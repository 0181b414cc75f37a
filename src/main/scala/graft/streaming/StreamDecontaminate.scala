package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.streaming.StreamingQuery
import org.apache.spark.sql.functions._

import graft.operators.{Decontamination, Dedup, Materialize}

/** Streaming benchmark decontamination — the ingest-time form of
  * [[Decontamination.screen]], completing the streaming quality gate
  * next to [[StreamDedup]]/[[StreamEmbedDedup]]: every micro-batch of
  * incoming documents is shingled and checked against the held-out eval
  * set's n-gram hashes.
  *
  * Unlike the dedup screens this operator is STATELESS across batches —
  * contamination is membership in a FIXED eval-gram set, so the set is
  * built once at stream start (eval benchmarks are thousands of docs;
  * their distinct grams broadcast) and every batch is one linear pass:
  * stream == batch trivially, micro-batch boundaries cannot matter
  * (still pinned in StreamDedupSpec).
  */
object StreamDecontaminate {

  /** docs (doc_id LONG, text STRING) stream → per-doc contamination
    * report under `workDir/report`, one overwrite-keyed dir per batch so
    * an at-least-once replay cannot duplicate report rows. */
  def run(stream: DataFrame, evalDocs: DataFrame, workDir: String,
      n: Int, minHits: Int): StreamingQuery = {
    val evalGrams = Materialize(
      Dedup.shingleIndex(evalDocs, n).select(col("h")).distinct())
    stream.writeStream
      .option("checkpointLocation", s"$workDir/ckpt")
      .foreachBatch { (mb: DataFrame, batchId: Long) =>
        Decontamination.screenAgainst(Dedup.shingleIndex(mb, n),
            evalGrams, minHits)
          .write.mode("overwrite").parquet(f"$workDir/report/b-$batchId%09d")
        ()
      }
      .start()
  }

  def report(spark: SparkSession, workDir: String): DataFrame =
    spark.read.option("recursiveFileLookup", "true")
      .parquet(s"$workDir/report")
}
