package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic hash sampling for training-data curation.
  *
  * Sampling at 100 TB must be reproducible (re-running the pipeline must
  * pick the same rows), shuffle-free, and composable with stratification.
  * `rand()` fails all three. The standard trick: bucket each row by a salted
  * content hash and keep rows whose bucket falls under the rate threshold —
  * a pure codegen filter that pushes down to the scan, no state, no RNG.
  *
  * Buckets are the first 4 hex chars of md5 (65536 buckets); the threshold
  * compare is done ON THE HEX STRING (fixed width, lowercase `0-9a-f`, so
  * lexicographic order == numeric order) — portable bit-for-bit to any
  * engine with md5, which is how the DuckDB oracle mirrors it.
  */
object Sampling {

  /** 16-bit bucket (0..65535) of a salted key: deterministic, uniform. */
  def hashBucket(key: Column, salt: String): Column =
    conv(substring(md5(concat(lit(salt), key.cast("string"))), 1, 4), 16, 10)
      .cast("long")

  /** Keep iff the salted key's bucket < rate·65536 (rate in [0,1]). */
  def sampledBy(key: Column, salt: String, rate: Double): Column = {
    val threshold = math.round(rate * 65536).toInt
    substring(md5(concat(lit(salt), key.cast("string"))), 1, 4) <
      lit(f"$threshold%04x")
  }

  /** Uniform deterministic sample. */
  def sample(df: DataFrame, key: Column, salt: String, rate: Double): DataFrame =
    df.filter(sampledBy(key, salt, rate))

  /** Stratified deterministic sample: per-stratum rates (e.g. downsample a
    * dominant language, upsample rare ones), default rate otherwise. The
    * stratum column only selects the threshold — the hash stays on the key,
    * so changing strata never reshuffles which rows a stratum keeps. */
  def stratifiedBy(key: Column, stratum: Column, salt: String,
      rates: Map[String, Double], defaultRate: Double): Column = {
    val bucket = substring(md5(concat(lit(salt), key.cast("string"))), 1, 4)
    val threshold = rates.foldLeft(
      lit(f"${math.round(defaultRate * 65536).toInt}%04x")) {
      case (acc, (value, rate)) =>
        when(stratum === value, lit(f"${math.round(rate * 65536).toInt}%04x"))
          .otherwise(acc)
    }
    bucket < threshold
  }
}
