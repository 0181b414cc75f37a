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
  * cosine verify needs it; the per-band INT keys in `code` are what the
  * band join keys on). Feeding micro-batches in id order reproduces the
  * one-shot [[Similarity.incrementalEmbed]] report bit-for-bit
  * (StreamDedupSpec).
  *
  * Same idempotency contract as [[StreamDedup]]: per-batch overwrite
  * writes keyed by batch id, replay-stable [[SegmentedState.readAsOf]]
  * reads, and periodic compaction bounding long-run state file counts.
  */
object StreamEmbedDedup {

  /** Schema of the coded-state rows: `code` is one INT band key per band
    * ([[Similarity.srpCoded]]). */
  val CodedSchema = StructType(Seq(
    StructField("vec_id", LongType),
    StructField("embedding", ArrayType(FloatType)),
    StructField("nrm", DoubleType),
    StructField("code", ArrayType(IntegerType))))

  /** (vec_id LONG, embedding ARRAY<FLOAT>) stream → decisions under
    * `workDir/decisions`, coded-state under `workDir/seen_coded`.
    *
    * Band width is sized ONCE — at the FIRST stream setup, from the
    * standing corpus ([[Similarity.bandsFor]]) — and then PERSISTED in
    * `workDir/band_bits`: codes in state were computed at that width, so
    * a restart that re-derived the width from a corpus that has since
    * crossed a [[Similarity.bandsFor]] power-of-two boundary would
    * reinterpret old state codes at a new width and silently miss
    * duplicates. On restart the persisted width is adopted when the
    * caller passed none, and a mismatching explicit `bandBits` fails
    * loudly instead of corrupting the band join. Pass `bandBits`
    * explicitly when parity with a separately-sized one-shot run
    * ([[Similarity.incrementalEmbed]]) matters. */
  def run(stream: DataFrame, corpusEmb: DataFrame, workDir: String,
      tau: Double, bandBits: Option[Int] = None,
      compactEvery: Int = 16): StreamingQuery = {
    val spark = corpusEmb.sparkSession
    val bb = resolveBandBits(workDir,
      bandBits.getOrElse(Similarity.bandsFor(corpusEmb.count())),
      explicit = bandBits.isDefined)
    val nBands = Similarity.lshBandsFor(bb)
    val corpusCoded = Materialize(
      Similarity.srpCoded(corpusEmb, bb, nBands)
        .withColumn("is_corpus", lit(true)))
    stream.writeStream
      .option("checkpointLocation", s"$workDir/ckpt")
      .foreachBatch { (mb: DataFrame, batchId: Long) =>
        val batchCoded = Materialize(Similarity.srpCoded(mb, bb, nBands))
        val ref = corpusCoded.unionByName(
          seenCodedAsOf(spark, workDir, batchId).withColumn("is_corpus", lit(false)))
        Similarity.screenEmbedBatch(ref, batchCoded, tau)
          .write.mode("overwrite").parquet(f"$workDir/decisions/b-$batchId%09d")
        SegmentedState.maybeCompact(spark, s"$workDir/seen_coded", batchId,
          compactEvery, sortKeys = Seq("code"))
        SegmentedState.write(batchCoded.select(CodedSchema.fieldNames.map(col): _*),
          s"$workDir/seen_coded", batchId)
        ()
      }
      .start()
  }

  /** First run records the width in `workDir/band_bits`; later runs adopt
    * it (or, when the caller insists on a different width, fail loudly —
    * the persisted seen_coded codes are only valid at the width they were
    * computed at). */
  private def resolveBandBits(workDir: String, derived: Int,
      explicit: Boolean): Int = {
    val path = java.nio.file.Paths.get(workDir, "band_bits")
    if (java.nio.file.Files.exists(path)) {
      val persisted =
        new String(java.nio.file.Files.readAllBytes(path), "UTF-8").trim.toInt
      require(!explicit || persisted == derived,
        s"stream state at $workDir was coded at bandBits=$persisted but " +
          s"caller passed bandBits=$derived — persisted codes cannot be " +
          "reinterpreted at a different width; restart with the persisted " +
          "width or a fresh workDir")
      persisted
    } else {
      java.nio.file.Files.createDirectories(path.getParent)
      java.nio.file.Files.write(path, derived.toString.getBytes("UTF-8"))
      derived
    }
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
