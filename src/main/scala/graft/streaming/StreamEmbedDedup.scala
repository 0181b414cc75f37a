package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery

import graft.operators.{Materialize, Similarity}

/** Streaming EMBEDDING near-dup screening — the vector sibling of
  * [[StreamDedup]]: each micro-batch of (vec_id, embedding) rows is
  * SRP-coded and screened against the corpus code table plus everything
  * admitted in earlier micro-batches via [[Similarity.screenEmbedBatch]].
  *
  * State is the accumulated CODE TABLE of seen vectors — (vec_id,
  * embedding, nrm, code) parquet rows appended per batch: exactly the
  * precomputed-code-table layout a corpus-scale ANN deployment persists
  * next to its embeddings (the embedding rides along because the exact
  * cosine verify needs it; the 64-bit code is what the band join keys
  * on). Feeding micro-batches in id order reproduces the one-shot
  * [[Similarity.incrementalEmbed]] report bit-for-bit (StreamDedupSpec).
  */
object StreamEmbedDedup {

  /** (vec_id LONG, embedding ARRAY<FLOAT>) stream → decisions appended
    * to `workDir/decisions`, coded-state under `workDir/seen_coded`. */
  def run(stream: DataFrame, corpusEmb: DataFrame, workDir: String,
      tau: Double): StreamingQuery = {
    val spark = corpusEmb.sparkSession
    val corpusCoded = Materialize(
      Similarity.srpCoded(corpusEmb).withColumn("is_corpus", lit(true)))
    stream.writeStream
      .option("checkpointLocation", s"$workDir/ckpt")
      .foreachBatch { (mb: DataFrame, _: Long) =>
        val batchCoded = Materialize(Similarity.srpCoded(mb))
        val ref = corpusCoded.unionByName(
          seenCoded(spark, workDir).withColumn("is_corpus", lit(false)))
        Similarity.screenEmbedBatch(ref, batchCoded, tau)
          .write.mode("append").parquet(s"$workDir/decisions")
        batchCoded.write.mode("append").parquet(s"$workDir/seen_coded")
        ()
      }
      .start()
  }

  /** Accumulated code table of stream vectors seen so far. */
  def seenCoded(spark: SparkSession, workDir: String): DataFrame =
    scala.util.Try(spark.read.parquet(s"$workDir/seen_coded")).getOrElse {
      import org.apache.spark.sql.types._
      spark.createDataFrame(new java.util.ArrayList[org.apache.spark.sql.Row](),
        StructType(Seq(
          StructField("vec_id", LongType),
          StructField("embedding", ArrayType(FloatType)),
          StructField("nrm", DoubleType),
          StructField("code", LongType))))
    }

  def decisions(spark: SparkSession, workDir: String): DataFrame =
    spark.read.parquet(s"$workDir/decisions")
}
