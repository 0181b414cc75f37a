package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery
import org.apache.spark.sql.types._

import graft.operators.{Materialize, Similarity}

/** Streaming EMBEDDING near-dup screening — the vector sibling of
  * [[StreamDedup]]: each micro-batch of (vec_id, embedding) rows is
  * SRP-coded and screened against the corpus code table plus everything
  * admitted in earlier micro-batches via [[Similarity.screenEmbedBatch]].
  *
  * State is the accumulated CODE TABLE of seen vectors — (vec_id,
  * embedding, nrm, code) rows in a [[SegmentedState]] store: exactly the
  * precomputed-code-table layout a corpus-scale ANN deployment persists
  * next to its embeddings (the embedding rides along because the exact
  * cosine verify needs it; the 64-bit code is what the band join keys
  * on). Feeding micro-batches in id order reproduces the one-shot
  * [[Similarity.incrementalEmbed]] report bit-for-bit (StreamDedupSpec).
  *
  * Same idempotency contract as [[StreamDedup]]: per-batch overwrite
  * writes keyed by batch id, replay-stable [[SegmentedState.readAsOf]]
  * reads, and periodic compaction bounding long-run state file counts.
  */
object StreamEmbedDedup {

  /** Schema of the coded-state rows. */
  val CodedSchema = StructType(Seq(
    StructField("vec_id", LongType),
    StructField("embedding", ArrayType(FloatType)),
    StructField("nrm", DoubleType),
    StructField("code", LongType)))

  /** (vec_id LONG, embedding ARRAY<FLOAT>) stream → decisions under
    * `workDir/decisions`, coded-state under `workDir/seen_coded`.
    *
    * Band width is sized ONCE at stream setup from the standing corpus
    * ([[Similarity.bandsFor]]) and held for the stream's lifetime — codes
    * in state are `LshBands × bandBits` bits wide, so the width is part
    * of the state schema and must not drift between batches. Pass
    * `bandBits` explicitly when parity with a separately-sized one-shot
    * run ([[Similarity.incrementalEmbed]]) matters. */
  def run(stream: DataFrame, corpusEmb: DataFrame, workDir: String,
      tau: Double, bandBits: Option[Int] = None,
      compactEvery: Int = 16): StreamingQuery = {
    val spark = corpusEmb.sparkSession
    val bb = bandBits.getOrElse(Similarity.bandsFor(corpusEmb.count()))
    val nPlanes = Similarity.LshBands * bb
    val corpusCoded = Materialize(
      Similarity.srpCoded(corpusEmb, nPlanes)
        .withColumn("is_corpus", lit(true)))
    stream.writeStream
      .option("checkpointLocation", s"$workDir/ckpt")
      .foreachBatch { (mb: DataFrame, batchId: Long) =>
        val batchCoded = Materialize(Similarity.srpCoded(mb, nPlanes))
        val ref = corpusCoded.unionByName(
          seenCodedAsOf(spark, workDir, batchId).withColumn("is_corpus", lit(false)))
        Similarity.screenEmbedBatch(ref, batchCoded, tau, nPlanes, bb)
          .write.mode("overwrite").parquet(f"$workDir/decisions/b-$batchId%09d")
        SegmentedState.maybeCompact(spark, s"$workDir/seen_coded", batchId,
          compactEvery, sortKeys = Seq("code"))
        SegmentedState.write(batchCoded.select(CodedSchema.fieldNames.map(col): _*),
          s"$workDir/seen_coded", batchId)
        ()
      }
      .start()
  }

  private def seenCodedAsOf(spark: SparkSession, workDir: String,
      batchId: Long): DataFrame =
    SegmentedState.readAsOf(spark, s"$workDir/seen_coded", batchId, CodedSchema)

  /** Accumulated code table of stream vectors seen so far. Missing state
    * dir → empty frame; other read failures propagate. */
  def seenCoded(spark: SparkSession, workDir: String): DataFrame =
    SegmentedState.readAll(spark, s"$workDir/seen_coded", CodedSchema)

  def decisions(spark: SparkSession, workDir: String): DataFrame =
    spark.read.option("recursiveFileLookup", "true")
      .parquet(s"$workDir/decisions")
}
