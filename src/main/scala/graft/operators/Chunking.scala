package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Fixed-window token chunking and passage-level dedup — the document →
  * training-example step of an LLM data pipeline.
  *
  * Chunking is a per-row explode (no shuffle): each document yields
  * ⌈n/stride⌉ overlapping windows of `size` tokens. Passage dedup then
  * groups chunks by content hash corpus-wide — one keyed shuffle on the
  * md5, first-wins by (doc_id, chunk_id) — so boilerplate passages repeated
  * across documents are dropped even when the documents are not duplicates.
  */
object Chunking {

  /** Overlapping token windows: start positions 1, 1+stride, 1+2·stride, …
    * each taking `size` tokens (the tail chunk may be shorter). Output one
    * row per (doc_id, chunk_id) with the chunk text and its md5. */
  def chunk(docs: DataFrame, chunkSize: Int = 40, stride: Int = 30): DataFrame = {
    require(chunkSize > 0 && stride > 0, "chunkSize and stride must be positive")
    docs
      .select(col("doc_id"), TextAnalysis.tokens(col("text")).as("toks"))
      .select(col("doc_id"), col("toks"),
        explode(sequence(lit(1), size(col("toks")), lit(stride))).as("start"))
      .select(col("doc_id"),
        // start − 1 is always an exact multiple of stride ⇒ exact division
        ((col("start") - 1) / stride).cast("long").as("chunk_id"),
        col("start").cast("long").as("start_token"),
        slice(col("toks"), col("start"), lit(chunkSize)).as("ctoks"))
      .select(col("doc_id"), col("chunk_id"), col("start_token"),
        size(col("ctoks")).cast("long").as("n_chunk_tokens"),
        md5(concat_ws(" ", col("ctoks"))).as("chunk_md5"))
  }

  /** First-wins passage dedup over the chunk table: within each identical
    * chunk the (doc_id, chunk_id)-smallest occurrence is canonical, the
    * rest are duplicates. One shuffle keyed by chunk_md5. */
  def passageDedup(chunks: DataFrame): DataFrame = {
    val w = Window.partitionBy(col("chunk_md5"))
      .orderBy(col("doc_id"), col("chunk_id"))
    chunks
      .withColumn("canonical_doc_id", first(col("doc_id")).over(w))
      .withColumn("canonical_chunk_id", first(col("chunk_id")).over(w))
      .withColumn("is_duplicate",
        col("doc_id") =!= col("canonical_doc_id") ||
          col("chunk_id") =!= col("canonical_chunk_id"))
      .select(col("doc_id"), col("chunk_id"), col("chunk_md5"),
        col("canonical_doc_id"), col("canonical_chunk_id"), col("is_duplicate"))
  }
}
