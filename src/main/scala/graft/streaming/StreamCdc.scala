package graft.streaming

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.streaming.StreamingQuery

import graft.operators.Cdc

/** Streaming CDC ingest — the online half of [[Cdc.applyChangelog]] (as
  * [[StreamDedup]] is the online half of Dedup.incremental): every
  * micro-batch of keyed changes (upserts + deletes) folds into a
  * persisted snapshot, last-write-wins. Feeding the changelog in time
  * slices reproduces the one-shot batch merge bit-for-bit — that is
  * exactly [[Cdc]]'s slice-associativity law, and q_stream_cdc gates it
  * against the batch query's own DuckDB oracle.
  *
  * State = GENERATIONAL SNAPSHOTS: batch b reads the newest generation
  * strictly below b (or the base snapshot if none) and overwrites
  * `snap/gen-<b>` with the merged result. foreachBatch is at-least-once
  * on restart, so this layout is idempotent by construction: a replayed
  * batch cannot see its own first attempt's output — it re-reads the
  * same predecessor generation and rewrites gen-<b> identically
  * (the [[SegmentedState]] discipline, applied to replace-state instead
  * of append-state). Generations older than `retain` batches are GC'd.
  *
  * Scale: at test scale each generation is a full snapshot rewrite; at
  * 100 TB the snapshot is partitioned by the merge key's bucket and the
  * per-batch write becomes a dynamic partition overwrite of only the
  * buckets containing touched keys — the changelog (delta-sized) decides
  * which, so the rewrite is proportional to the delta, not the corpus.
  */
object StreamCdc {

  private def genPath(workDir: String, batchId: Long) =
    f"$workDir/snap/gen-$batchId%09d"

  /** Newest COMMITTED generation with id strictly below `batchId`, else
    * `base`. Reads pin the base schema so a generation written by an
    * older code version with extra columns can't widen the snapshot. */
  def snapshotAsOf(spark: SparkSession, workDir: String, batchId: Long,
      base: DataFrame): DataFrame =
    listGens(spark, workDir).filter(_ < batchId).maxOption
      .map(id => spark.read.schema(base.schema).parquet(genPath(workDir, id)))
      .getOrElse(base)

  /** The current merged snapshot (newest committed generation, else
    * `base`). */
  def snapshot(spark: SparkSession, workDir: String, base: DataFrame): DataFrame =
    snapshotAsOf(spark, workDir, Long.MaxValue, base)

  /** Only generations whose write COMMITTED (_SUCCESS present) count — a
    * crash mid-write leaves gen-<b> with no marker, and readers must fall
    * back to the intact predecessor instead of failing on (or partially
    * reading) a torn directory. */
  private def listGens(spark: SparkSession, workDir: String): Seq[Long] = {
    val dir = new Path(s"$workDir/snap")
    val fs = dir.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(dir)) Seq.empty
    else fs.listStatus(dir).toSeq.map(_.getPath)
      .filter(p => p.getName.startsWith("gen-") &&
        fs.exists(new Path(p, "_SUCCESS")))
      .map(_.getName.stripPrefix("gen-").toLong)
  }

  /** changes stream (base columns + `opCol`) → snapshot generations under
    * `workDir/snap`, checkpoint under `workDir/ckpt`. */
  def run(stream: DataFrame, base: DataFrame, workDir: String,
      keyCols: Seq[String], tsCol: String, seqCol: String, opCol: String,
      retain: Int = 4): StreamingQuery = {
    // retain < 2 would GC the predecessor a replayed batch must re-read
    // (snapshotAsOf would silently fall back to the ORIGINAL base and
    // drop every previously merged change); retain = 0 would delete the
    // generation just written
    require(retain >= 2, s"retain must be >= 2 (got $retain)")
    val spark = base.sparkSession
    stream.writeStream
      .option("checkpointLocation", s"$workDir/ckpt")
      .foreachBatch { (mb: DataFrame, batchId: Long) =>
        val prev = snapshotAsOf(spark, workDir, batchId, base)
        Cdc.applyChangelog(prev, mb, keyCols, tsCol, seqCol, opCol)
          .write.mode("overwrite").parquet(genPath(workDir, batchId))
        // GC: a replay can only need the replayed batch's predecessor,
        // and restarts resume at most `retain` committed batches back
        val fs = new Path(workDir).getFileSystem(
          spark.sparkContext.hadoopConfiguration)
        listGens(spark, workDir).sorted.dropRight(retain)
          .foreach(id => fs.delete(new Path(genPath(workDir, id)), true))
        ()
      }
      .start()
  }
}
