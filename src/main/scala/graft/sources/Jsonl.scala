package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types.StructType

/** JSON-Lines corpus interchange — the de-facto wire format for LLM
  * training corpora (one JSON object per line, gzip-compressed shards).
  * A 100 TB pipeline ingests vendor/crawl drops as .jsonl.gz and exports
  * curated subsets the same way; parquet stays the internal format.
  *
  * Scale rules encoded here rather than rediscovered per caller:
  *   - reads are SCHEMA-PINNED, never inferred — inference is a full
  *     extra pass over the input and can widen types per-file, silently
  *     changing the schema between drops;
  *   - the read mode is explicit: FAILFAST here for round-trip/export
  *     paths (corruption in data WE wrote must be loud); raw crawl
  *     intake — where one bad line must not kill a 100 TB job — already
  *     lives in [[TextIngest.readJsonl]] (splittable text + from_json
  *     with quarantine capture);
  *   - gzip is the interchange default (splittability is already lost on
  *     .gz; shard-per-file parallelism comes from MANY files, which is
  *     how jsonl corpora ship).
  */
object Jsonl {

  /** Export a frame as compressed JSON-Lines shards (one file per
    * partition — pre-partition to the shard count you want to ship). */
  def write(df: DataFrame, path: String, compression: String = "gzip"): Unit =
    df.write.mode("overwrite").option("compression", compression).json(path)

  /** Strict schema-pinned read: any malformed line fails the job —
    * the contract for data we wrote ourselves (round trips, re-imports
    * of exported shards). UNTRUSTED intake goes through
    * [[TextIngest.readJsonl]] instead, which captures malformed lines in
    * a quarantine column rather than failing the job. */
  def read(spark: SparkSession, path: String, schema: StructType): DataFrame =
    spark.read.schema(schema).option("mode", "FAILFAST").json(path)
}
