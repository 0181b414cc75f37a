package graft.sources

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, TimestampNTZType, TimestampType}

/** Synthesizes an N×-scale copy of a testdata directory for the scale-TREND
  * bench ([[graft.BenchTrend]]): every sf0.1 perf floor is a single-SF
  * number, so an accidentally super-linear constant (a band-key hot spot, a
  * forgotten broadcast that flips to shuffle) is invisible to the 2× gate.
  * Unioning id-shifted copies gives a bigger input with the SAME distributional
  * shape — no oracle is needed because this is a trend check, not a
  * correctness gate (the driver's DuckDB gate stays on the real dirs).
  *
  * Design goal: each copy must look like "more of the same data", NOT like a
  * duplicate of it — otherwise the trend measures the blowup of
  * cross-copy duplicate pairs, which is semantic output growth, not a plan
  * defect. Per table family:
  *
  *  - Relational keys (`*_custkey/orderkey/partkey/suppkey`, `event_id`,
  *    `user_id` on nothing — see events below, `doc_id`, `vec_id`) are
  *    shifted by `copy × KeyStride`, so each copy is a disjoint key space:
  *    joins and the lineitem-derived graphs become `c` independent
  *    components and should scale LINEARLY. `nation`/`region` are genuine
  *    25/5-row dimensions and are copied unchanged (so `*_nationkey`
  *    references stay valid — at 100 TB the dimension side doesn't grow).
  *  - `events.ts` is shifted by `copy × span`: same symbols (`user_id` plays
  *    the symbol, Tables.scala:10), c× longer history — the natural growth
  *    model for a time series. Shifting user_id instead would multiply the
  *    symbol count and make q_corr_matrix's |symbols|² output grow
  *    quadratically BY DESIGN, poisoning the trend signal.
  *  - `documents.text` goes through a per-copy lowercase-alphabet rotation
  *    (`translate`): lengths, token boundaries and within-copy duplicate
  *    structure are preserved exactly, but shingle/minhash/simhash spaces
  *    are disjoint across copies, so near-dup pair counts scale linearly.
  *  - `embeddings.embedding` is rotated by a per-copy offset: norms and
  *    within-copy geometry are bit-preserved, cross-copy cosine decorrelates,
  *    so LSH/IVF dedup blocks don't fill with artificial exact duplicates.
  */
object ScaleSynth {

  /** Key-space stride between copies — far above any generated key. */
  val KeyStride = 10000000000L

  /** Bump on ANY synthesis-semantics change: the completion marker
    * records it, so a cached synth dir from an older rule set is
    * regenerated instead of silently feeding the trend bench stale
    * data shapes. */
  val SynthVersion = 2

  private val Alphabet = "abcdefghijklmnopqrstuvwxyz"
  private def rotated(n: Int): String = {
    val r = ((n % 26) + 26) % 26
    Alphabet.drop(r) + Alphabet.take(r)
  }

  /** Columns shifted per copy, by table. Everything else passes through. */
  private val ShiftCols: Map[String, Seq[String]] = Map(
    "customer" -> Seq("c_custkey"),
    "orders"   -> Seq("o_orderkey", "o_custkey"),
    "lineitem" -> Seq("l_orderkey", "l_partkey", "l_suppkey"),
    "part"     -> Seq("p_partkey"),
    "supplier" -> Seq("s_suppkey"),
    "events"   -> Seq("event_id"),
    "documents" -> Seq("doc_id"),
    "embeddings" -> Seq("vec_id"),
    "nation"   -> Seq.empty,
    "region"   -> Seq.empty
  )

  /** Tables copied once, unchanged (constant-size dimensions). */
  private val DimTables = Set("nation", "region")

  def tables: Seq[String] = ShiftCols.keys.toSeq.sorted

  /** One scaled table: the union of `copies` transformed reads. Copy 0 is
    * the identity, so the base data is a subset of every synth dir. */
  def scaleTable(spark: SparkSession, baseDir: String, name: String,
      copies: Int, keepStopwords: Boolean = false): DataFrame = {
    require(copies >= 1, s"copies must be >= 1 (got $copies)")
    // events.ts arrives as nanos-LONG in some driver data generations
    // (Tables.events sets the same conf before its read).
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val base = spark.read.parquet(s"$baseDir/$name.parquet")
    if (DimTables(name)) return base

    val shifts = ShiftCols.getOrElse(name, Seq.empty)

    // Per-copy ts shift for events: span of the column + 1h gap, in the
    // column's own physical representation so the written file round-trips
    // through Tables.events identically to the original generation.
    val tsSpan: Option[(String, Long)] =
      if (name == "events") {
        val tsType = base.schema("ts").dataType
        val asLong = tsType match {
          case LongType => col("ts") // raw nanos
          case TimestampType | TimestampNTZType => unix_micros(col("ts").cast(TimestampType))
          case other => sys.error(s"events.ts: unhandled type $other")
        }
        val Array(mn, mx) = base.agg(min(asLong), max(asLong)).head.toSeq.toArray
        val unitPerHour = tsType match {
          case LongType => 3600L * 1000 * 1000 * 1000
          case _        => 3600L * 1000 * 1000
        }
        Some((tsType match {
          case LongType => "long"
          case TimestampNTZType => "ntz"
          case _ => "ts"
        }, mx.asInstanceOf[Long] - mn.asInstanceOf[Long] + unitPerHour))
      } else None

    (0 until copies).map { i =>
      var df = base
      shifts.foreach { c => df = df.withColumn(c, col(c) + lit(i * KeyStride)) }
      tsSpan.foreach { case (kind, span) =>
        val shift = i * span
        df = kind match {
          case "long" => df.withColumn("ts", col("ts") + lit(shift))
          case "ntz"  => df.withColumn("ts",
            timestamp_micros(unix_micros(col("ts").cast(TimestampType)) + lit(shift))
              .cast(TimestampNTZType))
          case _      => df.withColumn("ts",
            timestamp_micros(unix_micros(col("ts")) + lit(shift)))
        }
      }
      // 7 is coprime to 26, so rotations are distinct for copies <= 26
      // (past that the Caesar family repeats and cross-copy texts become
      // identical — raise the alphabet step logic before going wider)
      if (name == "documents" && i > 0) {
        val rot = (c: Column) => translate(c, Alphabet, rotated(i * 7))
        df =
          if (!keepStopwords)
            df.withColumn("text", rot(col("text")))
          else {
            // stopword-PRESERVING rotation (composition-trend mode): the
            // plain rotation leaves copies with zero English stopwords,
            // so any stopword-keyed gate (quality rules minStopDistinct,
            // lang-id, DSIR's en target) removes every copy at its first
            // filter and the downstream pipeline silently shrinks back to
            // base size — the r16 CurateTrend run measured exactly that.
            // Keeping the marker tokens intact preserves per-stage pass
            // rates while shingle/embedding spaces stay copy-disjoint
            // (most shingles contain a rotated content token).
            val stopArr = array(
              graft.operators.TextAnalysis.Stopwords.map(lit): _*)
            df.withColumn("text",
              array_join(
                transform(split(col("text"), " "),
                  t => when(array_contains(stopArr, t), t).otherwise(rot(t))),
                " "))
          }
      }
      if (name == "embeddings" && i > 0) {
        // rotate the vector by r dims: same norm, disjoint direction family.
        // r = 1 + (i-1) mod (dim-1): full period dim-1, so no copy is the
        // identity AND no two copies below dim share a rotation (the old
        // i*7 step cycled with period 9 for 64-dim vectors, making copies
        // i and i+9 exact cross-copy duplicates)
        val r = s"(1 + pmod(${i - 1}, size(embedding) - 1))"
        df = df.withColumn("embedding",
          expr(s"concat(slice(embedding, $r + 1, size(embedding) - $r), " +
            s"slice(embedding, 1, $r))"))
      }
      df
    }.reduce(_ union _)
  }

  /** Writes every table of `baseDir` at `copies`× into `outDir`, with a
    * completion marker so an interrupted synth is never mistaken for a
    * finished one. No-op if the marker for the same (base, copies) exists. */
  def synthesize(spark: SparkSession, baseDir: String, outDir: String,
      copies: Int, keepStopwords: Boolean = false): Unit = {
    val markerPath = java.nio.file.Paths.get(outDir, "_SYNTH_DONE")
    val stamp = s"v=$SynthVersion base=$baseDir copies=$copies" +
      (if (keepStopwords) " keepStopwords" else "")
    if (java.nio.file.Files.exists(markerPath) &&
        java.nio.file.Files.readString(markerPath).trim == stamp) return
    tables.foreach { t =>
      scaleTable(spark, baseDir, t, copies, keepStopwords)
        .write.mode("overwrite").parquet(s"$outDir/$t.parquet")
    }
    java.nio.file.Files.writeString(markerPath, stamp + "\n")
  }
}
