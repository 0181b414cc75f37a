package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{StringType, StructType}

/** Batch corpus ingestion: JSONL / CSV readers with per-record error
  * isolation, and the partition-layout writer for curated output.
  *
  * The reference ingests JSON records one message at a time and drops
  * malformed ones without crashing the pipeline
  * (trading-etl-python/src/processing/consumer.py:184-186); the batch
  * analog keeps every raw line alongside its parse so one bad line in a
  * 100 TB crawl quarantines that LINE, not the file or the job.
  *
  * Design: read as splittable line-text, then `from_json` / `from_csv` in
  * the projection. Parsing in the projection (rather than the raw file
  * source's PERMISSIVE mode) keeps the original line as a first-class
  * column — Spark's file sources forbid plans that reference only the
  * internal corrupt-record column, and Catalyst's column pruning makes
  * that easy to trip from a quarantine query — and it stays inside
  * whole-stage codegen either way.
  *
  * Scale notes: line-oriented text is byte-range splittable, so a single
  * huge file still fans out across executors. The writer lays out
  * `partitionBy` directories for partition pruning and sorts within
  * partitions so parquet row-group min/max statistics prune reads on the
  * sort key.
  */
object TextIngest {

  val CorruptCol = "_corrupt_record"

  private def withCorrupt(schema: StructType): StructType =
    schema.add(CorruptCol, StringType, nullable = true)

  /** Splittable JSONL read: one output row per line, the raw line in `raw`,
    * parsed fields from `schema`, malformed lines flagged in
    * [[CorruptCol]]. */
  def readJsonl(spark: SparkSession, path: String, schema: StructType): DataFrame =
    spark.read.text(path)
      .select(col("value").as("raw"),
        from_json(col("value"), withCorrupt(schema),
          Map("mode" -> "PERMISSIVE",
            "columnNameOfCorruptRecord" -> CorruptCol)).as("r"))
      .select(col("raw") +: (schema.fieldNames :+ CorruptCol)
        .map(f => col(s"r.$f")): _*)

  /** CSV with a header line, same quarantine contract as [[readJsonl]].
    * The header is identified by content (`from_csv` has no header
    * handling): every line equal to the schema's comma-joined field names
    * is dropped — which also makes concatenated / multi-file CSVs with
    * repeated headers parse cleanly. */
  def readCsv(spark: SparkSession, path: String, schema: StructType): DataFrame = {
    val header = schema.fieldNames.mkString(",")
    spark.read.text(path)
      .filter(col("value") =!= lit(header))
      .select(col("value").as("raw"),
        from_csv(col("value"), withCorrupt(schema),
          Map("mode" -> "PERMISSIVE",
            "columnNameOfCorruptRecord" -> CorruptCol)).as("r"))
      .select(col("raw") +: (schema.fieldNames :+ CorruptCol)
        .map(f => col(s"r.$f")): _*)
  }

  /** Split an ingested frame into (clean, quarantined): clean rows drop the
    * bookkeeping columns; quarantined rows keep the raw line for
    * replay/repair — mirror of the reference's log-and-continue. */
  def quarantine(df: DataFrame): (DataFrame, DataFrame) = {
    val clean = df.filter(col(CorruptCol).isNull).drop(CorruptCol, "raw")
    val bad = df.filter(col(CorruptCol).isNotNull).select(col("raw"))
    (clean, bad)
  }

  /** Curated-corpus writer: shuffle on (directory keys + a bounded salt)
    * so each partition value fans out across up to `filesPerPartition`
    * tasks — repartitioning on the keys alone would funnel a dominant
    * value (80% of a crawl is one language) through ONE task, while no
    * repartition at all writes one-file-per-(task × value). Rows are then
    * sorted within tasks so parquet row-group min/max statistics prune
    * scans on `sortCols`. The salt hashes the sort columns, keeping each
    * file internally sorted AND value-clustered. */
  def writePartitioned(df: DataFrame, path: String,
      partitionCols: Seq[String], sortCols: Seq[String],
      filesPerPartition: Int = 8, format: String = "parquet"): Unit = {
    require(filesPerPartition > 0, "filesPerPartition must be positive")
    require(Set("parquet", "orc").contains(format),
      s"unsupported columnar format $format") // both carry row-group/stripe stats
    val salt = pmod(hash((partitionCols ++ sortCols).map(col): _*),
      lit(filesPerPartition))
    df.withColumn("_salt", salt)
      .repartition(partitionCols.map(col) :+ col("_salt"): _*)
      .sortWithinPartitions((partitionCols ++ sortCols).map(col): _*)
      .drop("_salt")
      .write
      .partitionBy(partitionCols: _*)
      .mode("overwrite")
      .format(format)
      .save(path)
  }
}
