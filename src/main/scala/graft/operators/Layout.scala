package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.operators.Materialize.MatOps

/** Data-layout operators: Z-order (Morton) keys for multi-dimensional
  * file clustering.
  *
  * A 100 TB table range-partitioned and sorted on ONE column prunes on
  * that column only; a filter on any other dimension reads everything.
  * Interleaving the bits of two dimensions into one sort key gives every
  * file a tight bounding box in BOTH dimensions, so parquet row-group
  * min/max stats (and file-level pruning) cut reads for either-dimension
  * predicates — the standard Z-order layout trick, here as a pure int64
  * column expression (codegen, no UDF, oracle-portable integer math).
  *
  * Usage at write time:
  * `df.repartitionByRange(n, zkey).sortWithinPartitions(zkey).write…` —
  * the layout cost is one range shuffle at write, paid once, saved on
  * every read.
  */
object Layout {

  /** Morton-interleave two non-negative int columns, `bits` bits each
    * (bits ≤ 31; key fits int64 for bits ≤ 31). Bit i of `a` lands at
    * position 2i, bit i of `b` at 2i+1, so sorting by the key recursively
    * visits quadrants of the (a, b) grid. Inputs are masked to `bits`
    * bits — callers bucket/clamp first. */
  def zorder2(a: Column, b: Column, bits: Int = 16): Column = {
    require(bits > 0 && bits <= 31, "bits must be in 1..31")
    val terms = (0 until bits).flatMap { i =>
      Seq(
        shiftleft(shiftright(a.cast("long"), i).bitwiseAND(lit(1L)), 2 * i),
        shiftleft(shiftright(b.cast("long"), i).bitwiseAND(lit(1L)), 2 * i + 1))
    }
    terms.reduce(_.bitwiseOR(_))
  }

  /** The matching DuckDB SQL expression (single source of truth for the
    * oracle side). */
  def zorder2Sql(a: String, b: String, bits: Int = 16): String = {
    require(bits > 0 && bits <= 31, "bits must be in 1..31")
    val terms = (0 until bits).flatMap { i =>
      Seq(s"((($a >> $i) & 1) << ${2 * i})", s"((($b >> $i) & 1) << ${2 * i + 1})")
    }
    terms.mkString("(", " | ", ")")
  }

  /** Z-ordered write: one range shuffle on the interleaved key, sorted
    * within partitions so row-group stats are tight on both dimensions. */
  def writeZOrdered(df: DataFrame, zkey: Column, path: String,
      numFiles: Int): Unit =
    df.withColumn("_z", zkey)
      .repartitionByRange(numFiles, col("_z"))
      .sortWithinPartitions(col("_z"))
      .drop("_z")
      .write.mode("overwrite").parquet(path)

  /** Compact a parquet directory into ~`targetBytes`-sized files — the
    * small-file remedy for streaming/micro-batch sinks (a 100 TB table fed
    * by per-trigger appends degrades every scan with open/seek overhead
    * and tiny row groups; periodic compaction restores scan bandwidth).
    *
    * The output file count is ⌈input bytes / targetBytes⌉, sized from the
    * ON-DISK (compressed) listing, so the target is phrased in the same
    * units operators reason about. With `sortKeys` the rewrite is a range
    * shuffle + in-partition sort (re-establishing clustered layout and
    * tight row-group stats); without, a plain round-robin repartition.
    * Returns the file count written. */
  def compact(spark: org.apache.spark.sql.SparkSession, inPath: String,
      outPath: String, targetBytes: Long = 128L << 20,
      sortKeys: Seq[String] = Nil): Int =
    compactPaths(spark, Seq(inPath), outPath, targetBytes, sortKeys)

  /** Multi-directory variant of [[compact]] — the shape streaming state
    * stores need (fold a base generation plus per-batch segment dirs into
    * one new generation, see graft.streaming.SegmentedState). */
  def compactPaths(spark: org.apache.spark.sql.SparkSession,
      inPaths: Seq[String], outPath: String, targetBytes: Long = 128L << 20,
      sortKeys: Seq[String] = Nil): Int = {
    require(inPaths.nonEmpty, "compactPaths needs at least one input path")
    val fs = new org.apache.hadoop.fs.Path(inPaths.head)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    // recursive walk: a partitioned layout keeps its files in
    // subdirectories — a flat listing would size the input at 0 bytes and
    // funnel the whole table through one partition
    def sizeOf(path: org.apache.hadoop.fs.Path): Long = {
      val it = fs.listFiles(path, true)
      var bytes = 0L
      while (it.hasNext) {
        val f = it.next()
        if (f.getPath.getName.endsWith(".parquet")) bytes += f.getLen
      }
      bytes
    }
    val totalBytes = inPaths.map(p => sizeOf(new org.apache.hadoop.fs.Path(p))).sum
    val n = math.max(1, math.ceil(totalBytes.toDouble / targetBytes).toInt)
    val df = spark.read.parquet(inPaths: _*)
    val out =
      if (sortKeys.nonEmpty)
        df.repartitionByRange(n, sortKeys.map(col): _*)
          .sortWithinPartitions(sortKeys.map(col): _*)
      else df.repartition(n)
    out.write.mode("overwrite").parquet(outPath)
    // range partitioning can leave empty partitions (skew, few distinct
    // keys) which write no file — report what actually landed, not n
    val written = fs.listFiles(new org.apache.hadoop.fs.Path(outPath), true)
    var count = 0
    while (written.hasNext) {
      if (written.next().getPath.getName.endsWith(".parquet")) count += 1
    }
    count
  }

  /** Deterministic seeded GLOBAL SHUFFLE into exact fixed-size training
    * shards — the layout step between curation and training: samples must
    * reach the trainer in a reproducible random order, cut into
    * equal-size shards so data loaders stride without coordination. A
    * `rand()` sort fails reproducibility; a plain `repartition(n)` gives
    * hash-balanced but UNORDERED, non-replayable shards.
    *
    * The permutation is the salted 60-bit md5 hash of the key ([[
    * graft.operators.TextAnalysis.hash60]]); the global rank over (hash,
    * key) is computed WITHOUT a single-partition sort: rows bucket by the
    * hash's top `log2(nBuckets)` bits, per-bucket counts (an nBuckets-row
    * aggregate) prefix-sum into bucket offsets on the driver-side-tiny
    * frame, and each bucket ranks independently under its offset. Because
    * the bucket is a PREFIX of the sort key, (bucket, hash, key) order IS
    * (hash, key) order — exact global ranks from one hash-partitioned
    * window plus one broadcast of nBuckets rows. At 100 TB: nBuckets
    * scales so a bucket fits a task (md5 is uniform, so buckets are
    * balanced — no planted skew is possible), the only wide exchange is
    * the bucket hash-partition, and every shard except the last is
    * exactly `shardSize` rows.
    *
    * Output: (key, shard, pos) — shard = rank/shardSize, pos within it. */
  def shuffleShards(df: DataFrame, key: Column, salt: String,
      shardSize: Int, nBuckets: Int = 1024): DataFrame = {
    require(shardSize > 0, "shardSize must be positive")
    // >= 2, not >= 1: one bucket degenerates the construction into exactly
    // the single-partition global sort the no-collect contract forbids
    // (the whole corpus ranks in one window partition) — ADVICE r15
    require(nBuckets >= 2 && (nBuckets & (nBuckets - 1)) == 0 && nBuckets <= (1 << 20),
      "nBuckets must be a power of two in [2, 2^20]")
    val shift = 60 - java.lang.Integer.numberOfTrailingZeros(nBuckets)
    val keyed = df
      .select(key.as("k"),
        TextAnalysis.hash60(concat(lit(salt), key.cast("string"))).as("_h"))
      .withColumn("_b", shiftright(col("_h"), shift))
      .materialize // counts and ranks read the same hashed frame once
    val offs = keyed.groupBy("_b").agg(count(lit(1)).as("_n"))
      .withColumn("_off",
        coalesce(
          sum(col("_n")).over(Window.orderBy(col("_b"))
            .rowsBetween(Window.unboundedPreceding, -1)),
          lit(0L)))
      .select(col("_b"), col("_off"))
    val inBucket = Window.partitionBy(col("_b")).orderBy(col("_h"), col("k"))
    keyed
      .join(broadcast(offs), "_b")
      .withColumn("_rk",
        col("_off") + row_number().over(inBucket).cast("long") - 1)
      .select(col("k"),
        expr(s"_rk DIV $shardSize").as("shard"),
        (col("_rk") % shardSize).as("pos"))
  }

  /** End-to-end sharded TRAINING-DATA EXPORT — the deliverable a curation
    * pipeline hands to a trainer: [[shuffleShards]]' seeded global
    * permutation cut into exact `shardSize`-row shards, each shard written
    * as ONE `.jsonl.gz` file (the de-facto corpus interchange format,
    * [[graft.sources.Jsonl]]), plus a MANIFEST parquet the loader checks
    * before touching data.
    *
    * Manifest row per shard: `m_n_rows` (exact row count) and
    * `m_checksum` — a POSITION-WEIGHTED content checksum
    * Σ (pos+1) · (hash60(checksumCol) mod 1000003), so it pins not just
    * which rows a shard holds but the exact position of each: a dropped
    * line, a swapped pair, or a re-ordered write all change it. Both are
    * computed from the assignment frame at write time; re-aggregating the
    * shards after read-back and comparing proves the export lossless
    * end-to-end (q_export_shards gates this against the parquet originals).
    *
    * Layout: `outDir/shards/shard=N/part-*.json.gz` (one file per shard —
    * rows hash-partition BY SHARD before the partitioned write, so each
    * shard's rows land in exactly one task), `outDir/manifest` (parquet).
    * `pos` is exported as a data column — the loader's in-shard order key,
    * and what lets a reader re-verify the positional checksum without
    * trusting line order through decompression.
    *
    * Scale shape: assignment is shuffleShards' bucket-offset construction
    * (no single-partition sort), the join back to full rows is keyed on
    * `key` (which must be unique — doc_id/seq_id), and the manifest is a
    * per-shard aggregate of corpus-sized input into output rows / shardSize
    * rows. One extra wide exchange total (the partition-by-shard), which
    * the write itself requires. */
  def exportShards(docs: DataFrame, key: Column, salt: String,
      shardSize: Int, checksumCol: Column, outDir: String,
      nBuckets: Int = 1024): Unit = {
    val assign = shuffleShards(docs.select(key.as("_ek")), col("_ek"),
        salt, shardSize, nBuckets)
      .select(col("k").as("_ek"), col("shard"), col("pos"))
    val rows = docs.withColumn("_ek", key).join(assign, "_ek").drop("_ek")
      .materialize // two consumers: shard write + manifest aggregate
    rows
      .repartition(col("shard"))
      .sortWithinPartitions(col("shard"), col("pos"))
      .write.mode("overwrite").partitionBy("shard")
      .option("compression", "gzip").json(s"$outDir/shards")
    rows.groupBy(col("shard"))
      .agg(count(lit(1)).as("m_n_rows"),
        sum((col("pos") + 1) *
          pmod(TextAnalysis.hash60(checksumCol), lit(1000003L)))
          .as("m_checksum"))
      .write.mode("overwrite").parquet(s"$outDir/manifest")
  }

  /** MIXTURE-PRESERVING variant of [[shuffleShards]]: every shard carries
    * (to within rounding) the corpus's global stratum proportions — the
    * property a training loader needs for a stationary data mixture, which
    * a plain seeded shuffle only delivers in expectation (a run of shards
    * can drift source-heavy by chance; curriculum-sensitive training
    * notices).
    *
    * Classic deterministic stride interleave: within each stratum, rows
    * take their seeded rank r (same salted-hash order as shuffleShards);
    * a stratum of n_s rows then emits evenly-spaced positions
    * frac = (2r+1)/(2·n_s) in [0, 1), and the global order is
    * (frac, stratum, key). Any window of width w in [0,1) contains
    * ≈ w·n_s of each stratum, so every shardSize-row cut is proportional
    * to ±O(1) per stratum. frac is an exact small-integer division —
    * bit-identical in any IEEE engine, which is what lets the oracle
    * replay the interleave verbatim.
    *
    * Scale shape: the in-stratum rank reuses the bucket-offset
    * construction PER STRATUM ((stratum, bucket) counts — strata-count ×
    * nBuckets rows, broadcast), and the global rank reuses it over
    * floor(frac·nBuckets), which is monotone in frac (prefix-aligned
    * again). Two wide exchanges total, no single-partition sort, no
    * stratum ever collected. */
  def stratifiedShards(df: DataFrame, key: Column, stratum: Column,
      salt: String, shardSize: Int, nBuckets: Int = 1024): DataFrame = {
    require(shardSize > 0, "shardSize must be positive")
    // >= 2, not >= 1: one bucket degenerates the construction into exactly
    // the single-partition global sort the no-collect contract forbids
    // (the whole corpus ranks in one window partition) — ADVICE r15
    require(nBuckets >= 2 && (nBuckets & (nBuckets - 1)) == 0 && nBuckets <= (1 << 20),
      "nBuckets must be a power of two in [2, 2^20]")
    val shift = 60 - java.lang.Integer.numberOfTrailingZeros(nBuckets)
    val keyed = df
      .select(key.as("k"), stratum.cast("string").as("s"),
        TextAnalysis.hash60(concat(lit(salt), key.cast("string"))).as("_h"))
      .withColumn("_b", shiftright(col("_h"), shift))
      .materialize
    // in-stratum seeded rank r and stratum size n_s, bucket-offset style
    val sOffs = keyed.groupBy("s", "_b").agg(count(lit(1)).as("_n"))
      .withColumn("_off",
        coalesce(
          sum(col("_n")).over(Window.partitionBy(col("s")).orderBy(col("_b"))
            .rowsBetween(Window.unboundedPreceding, -1)),
          lit(0L)))
      .withColumn("_ns", sum(col("_n")).over(Window.partitionBy(col("s"))))
      .select(col("s"), col("_b"), col("_off"), col("_ns"))
    val inSB = Window.partitionBy(col("s"), col("_b")).orderBy(col("_h"), col("k"))
    val fracs = keyed
      .join(broadcast(sOffs), Seq("s", "_b"))
      .withColumn("_r",
        col("_off") + row_number().over(inSB).cast("long") - 1)
      .select(col("k"), col("s"),
        ((col("_r") * 2 + 1).cast("double") / (col("_ns") * 2).cast("double"))
          .as("_f"))
      .withColumn("_fb", floor(col("_f") * nBuckets).cast("long"))
      .materialize
    // global rank over (frac, stratum, key), bucketed by the frac prefix
    val gOffs = fracs.groupBy("_fb").agg(count(lit(1)).as("_n"))
      .withColumn("_off",
        coalesce(
          sum(col("_n")).over(Window.orderBy(col("_fb"))
            .rowsBetween(Window.unboundedPreceding, -1)),
          lit(0L)))
      .select(col("_fb"), col("_off"))
    val inFb = Window.partitionBy(col("_fb"))
      .orderBy(col("_f"), col("s"), col("k"))
    fracs
      .join(broadcast(gOffs), "_fb")
      .withColumn("_rk",
        col("_off") + row_number().over(inFb).cast("long") - 1)
      .select(col("k"), col("s"),
        expr(s"_rk DIV $shardSize").as("shard"),
        (col("_rk") % shardSize).as("pos"))
  }
}
