package graft

import org.apache.spark.sql.SparkSession

import graft.operators.Unigram

/** Vocabulary-scale unigram-LM training sweep (offline tooling, the
  * BpeSweep precedent): the shipped q_unigram_train proves the EM loop at
  * a 47-piece toy vocabulary; the 100 TB claim is "EM cost ∝ dictionary,
  * not corpus", and this sweep measures one realistic point per axis:
  *
  *  - VOCAB axis: train at 1k / 4k / 16k final pieces (two-round prune
  *    schedule keep = [3k/2, k], the shipped shape) over the SAME corpus —
  *    if the claim holds, wall time is near-flat in k because each
  *    EM round is one dictionary-sized Viterbi pass whose per-word cost
  *    is bounded by MaxPiece window lookups, not vocabulary size (the
  *    vocabulary enters only as a broadcast hash map).
  *  - CORPUS axis: the same 4k config at base sf0.1 and at the 10×
  *    ScaleSynth dir — the delta isolates the one corpus-sized pass
  *    (the word count feeding the dictionary).
  *
  *  - WIDE-VOCAB axis: ScaleSynth repeats vocabulary, so the sf corpora
  *    saturate at a few hundred USED pieces and the 16k point is vacuous
  *    (measured: 372 multi pieces in use at keep=16384). A syllable-
  *    composed Zipfian corpus (the BpeSweep wide-plateau precedent:
  *    200k distinct words over 500 shared syllables) gives the EM loop a
  *    real 16k-piece candidate space, so the large-k cost actually
  *    exercises the dictionary term.
  *
  * Run: java … -cp <classes:spark-jars> graft.UnigramSweep \
  *   [baseDir] [synthDir] — synthDir is synthesized (10×) if absent.
  */
object UnigramSweep {
  def main(args: Array[String]): Unit = {
    val baseDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val synthDir = args.lift(1).getOrElse(
      s"/tmp/graft_trend/${new java.io.File(baseDir).getName}x10")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      // plan strings of lineage-kept iterative loops are exponential to
      // DESCRIBE (generateTreeString expands a DAG as a tree) — cap so the
      // driver never OOMs stringifying a plan (r16 sweep, SCALE.md)
      .config("spark.sql.maxPlanStringLength", (1 << 20).toString)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    if (!java.nio.file.Files.exists(java.nio.file.Paths.get(synthDir))) {
      System.err.println(s"[unigram-sweep] synthesizing $synthDir = ${baseDir} x10")
      sources.ScaleSynth.synthesize(spark, baseDir, synthDir, 10)
    }

    def docs(dir: String) = sources.Tables.documents(spark, dir)

    def measure(tag: String, dir: String, k: Int): Unit = {
      val keep = Seq(k * 3 / 2, k)
      val t0 = System.nanoTime()
      val rows = Unigram.train(docs(dir), seedMulti = k * 3 / 2, keep = keep)
        .collect()
      val t = (System.nanoTime() - t0) / 1e9
      val multi = rows.count(_.getString(0).length > 1)
      println(f"| $tag | $dir | $k | ${rows.length} | $multi | $t%.1f |")
    }

    println(s"# unigram vocab-scale sweep: base=$baseDir synth=$synthDir")
    println("| axis | dir | keep_k | pieces | multi_pieces | wall_s |")
    println("|---|---|---|---|---|---|")
    // warm the scan/codegen path once so the first measured config does
    // not absorb first-read costs (the BpeSweep warmup rationale)
    Unigram.train(docs(synthDir), seedMulti = 96, keep = Seq(64, 48)).collect()

    measure("vocab", synthDir, 1024)
    measure("vocab", synthDir, 4096)
    measure("vocab", synthDir, 16384)
    measure("corpus", baseDir, 4096)

    // wide-vocabulary Zipfian corpus: words composed from a shared
    // syllable pool so substrings repeat ACROSS words (per-word-unique
    // substrings would never accumulate usage and the vocab would
    // saturate like the synth corpora do)
    import spark.implicits._
    val syl = (0 until 500).map { i =>
      val a = ('a' + i % 26).toChar
      val b = ('a' + (i * 7 + i / 26) % 26).toChar
      s"$a$b"
    }
    val zipf = (0 until 200000).map { i =>
      var x = i * 2654435761L & 0x7fffffffL
      val w = new StringBuilder
      (0 until 4).foreach { _ => w ++= syl((x % syl.length).toInt); x /= 37 }
      val cnt = math.min(200, 2000000 / (i + 1) + 1)
      (i.toLong, (w.toString + " ") * cnt)
    }.toDF("doc_id", "text")

    def measureDf(tag: String, docs: org.apache.spark.sql.DataFrame, k: Int): Unit = {
      val keep = Seq(k * 3 / 2, k)
      val t0 = System.nanoTime()
      val rows = Unigram.train(docs, seedMulti = k * 3 / 2, keep = keep).collect()
      val t = (System.nanoTime() - t0) / 1e9
      val multi = rows.count(_.getString(0).length > 1)
      println(f"| $tag | (generated) | $k | ${rows.length} | $multi | $t%.1f |")
    }
    measureDf("zipf", zipf, 1024)
    measureDf("zipf", zipf, 4096)
    measureDf("zipf", zipf, 16384)

    spark.stop()
  }
}
