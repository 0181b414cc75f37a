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
  * engine with md5, which is how the DuckDB oracle mirrors it. Rates that
  * round to the full 65536 buckets (or to 0) cannot be expressed as a
  * 4-char compare — `keep` short-circuits them to true/false literals
  * instead of emitting a 5-char threshold that would compare wrong.
  */
object Sampling {

  /** Integer bucket threshold for a rate in [0, 1] (0..65536). */
  private def bucketThreshold(rate: Double): Int =
    math.max(0, math.min(65536, math.round(rate * 65536).toInt))

  /** 4-hex-char threshold literal for the DuckDB oracle mirror. Only rates
    * strictly inside (0, 1) have one — full/empty rates are literal
    * booleans on both sides. */
  def thresholdHex(rate: Double): String = {
    val t = bucketThreshold(rate)
    require(t > 0 && t < 65536,
      s"rate $rate rounds to $t/65536 buckets - not expressible as a 4-char threshold")
    f"$t%04x"
  }

  /** 16-bit bucket (0..65535) of a salted key: deterministic, uniform. */
  def hashBucket(key: Column, salt: String): Column =
    conv(substring(md5(concat(lit(salt), key.cast("string"))), 1, 4), 16, 10)
      .cast("long")

  private def bucketHex(key: Column, salt: String): Column =
    substring(md5(concat(lit(salt), key.cast("string"))), 1, 4)

  /** Keep iff the salted key's bucket < rate·65536 (rate in [0, 1]; rates
    * rounding to all/none of the buckets become literal true/false). */
  def sampledBy(key: Column, salt: String, rate: Double): Column =
    bucketThreshold(rate) match {
      case 0 => lit(false)
      case 65536 => lit(true)
      case t => bucketHex(key, salt) < lit(f"$t%04x")
    }

  /** Uniform deterministic sample. */
  def sample(df: DataFrame, key: Column, salt: String, rate: Double): DataFrame =
    df.filter(sampledBy(key, salt, rate))

  /** Stratified deterministic sample: per-stratum rates (e.g. downsample a
    * dominant language, keep all of a rare one), default rate otherwise.
    * The stratum column only selects the rate — the hash stays on the key,
    * so changing strata never reshuffles which rows a stratum keeps. */
  def stratifiedBy(key: Column, stratum: Column, salt: String,
      rates: Map[String, Double], defaultRate: Double): Column =
    rates.foldLeft(sampledBy(key, salt, defaultRate)) {
      case (acc, (value, rate)) =>
        when(stratum === value, sampledBy(key, salt, rate)).otherwise(acc)
    }

  /** Priority sampling (Duffield–Lund–Thorup): exact-N WEIGHTED sample
    * without replacement. Each row gets priority w / u with u uniform in
    * (0, 1) derived from the salted hash bucket (u = (bucket + 0.5) /
    * 65536 — never 0 or 1); the N highest priorities win. Heavier rows
    * draw proportionally larger priorities, reproducibly.
    *
    * Chosen over the ln-based exponential-jitter scheme (A-ES) because
    * w / u is PURE IEEE division — bit-identical in any engine, so the
    * oracle can replay the exact ranking; ln() differs by ulps across
    * libm implementations and could flip the rank-N boundary.
    *
    * Scale: orderBy + limit plans as TakeOrderedAndProject — per-partition
    * top-N heaps merged on one reducer over N·#partitions rows, never a
    * global sort. Adds `priority` (raw double). */
  def prioritySample(df: DataFrame, key: Column, weight: Column,
      salt: String, n: Int): DataFrame = {
    require(n > 0, "n must be positive")
    val u = (hashBucket(key, salt).cast("double") + lit(0.5)) / lit(65536.0)
    df.withColumn("priority", weight.cast("double") / u)
      .orderBy(col("priority").desc, key)
      .limit(n)
  }

  /** Deterministic train/val/test assignment: the salted 16-bit bucket of
    * the key is cut at cumulative fraction thresholds. Same guarantees as
    * [[sampledBy]] — reproducible across runs/engines, shuffle-free, pure
    * codegen — plus the split-specific one: the three sets are DISJOINT
    * and EXHAUSTIVE by construction (cuts of one bucket value), which
    * per-set rate sampling does not give. Fractions must sum to ≤ 1; any
    * remainder falls into the last split. */
  def splitBy(key: Column, salt: String, cuts: Seq[(String, Double)]): Column = {
    require(cuts.size >= 2, "need at least two splits")
    val cum = cuts.init.scanLeft(0.0) { case (acc, (_, f)) => acc + f }.tail
    val thresholds = cuts.init.map(_._1).zip(cum.map(bucketThreshold))
    val bucket = bucketHex(key, salt)
    thresholds.reverse.foldLeft(lit(cuts.last._1)) {
      case (acc, (name, t)) =>
        when(bucket < lit(f"$t%04x"), lit(name)).otherwise(acc)
    }
  }

  /** Exact-count stratified sample: the first `n` rows of each stratum in
    * salted-hash order (key as tiebreak) — the "exactly N docs per
    * language/source" balancing primitive, where a rate-based sample only
    * hits N in expectation. Deterministic: the hash order is a fixed
    * permutation per salt. One shuffle keyed by stratum; per-stratum
    * ranking is a window, so a mega-stratum serializes into one task —
    * at that point cap it with a rate-sample prefilter first (compose
    * [[sampledBy]] before this). Adds `sample_rank` (1-based). */
  def stratifiedExactN(df: DataFrame, key: Column, stratum: Column,
      salt: String, n: Int): DataFrame = {
    require(n > 0, "n must be positive")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(stratum)
      .orderBy(md5(concat(lit(salt), key.cast("string"))), key)
    df.withColumn("sample_rank", row_number().over(w).cast("long"))
      .filter(col("sample_rank") <= n)
  }
}
