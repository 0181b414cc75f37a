package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.operators.Bpe

/** ≥512-merge BPE amortization demo (offline sweep tooling, like PqSweep /
  * RerankSweep): measures how many Spark refresh rounds a real merge
  * budget costs under the batched acceptance vs the sequential
  * one-merge-per-round loop, and verifies the two merge tables are
  * bit-identical at that scale.
  *
  * Two corpora, because the batching win is SHAPE-dependent:
  *  - the sf documents table: the synthetic text's greedy sequence is
  *    cascade-dominated (each best pair extends the symbol the previous
  *    merge built), so batches stay small — the honest no-win case;
  *  - a Zipfian plateau corpus (many symbol-DISJOINT near-tie pairs, the
  *    shape of a real vocabulary's early merge rounds): batches are
  *    large and refreshes collapse to a small fraction of the merge
  *    count — the amortization case a 32k-merge production vocabulary
  *    actually hits.
  *
  * Run: java … -cp <classes:spark-jars> graft.BpeSweep [sfDir] [iters]
  */
object BpeSweep {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val iters = args.lift(1).map(_.toInt).getOrElse(512)
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
    import spark.implicits._

    def measure(tag: String, docs: org.apache.spark.sql.DataFrame,
        alsoSequential: Boolean): Unit = {
      // warm the dict build + codegen paths so the first-measured mode
      // (batched) doesn't absorb JIT/first-scan cost the second avoids
      Bpe.trainMergesStats(docs, 4)._1.collect()
      val t0 = System.nanoTime()
      val (mb, rb) = Bpe.trainMergesStats(docs, iters)
      val batchedRows = mb.collect()
      val tb = (System.nanoTime() - t0) / 1e9
      println(f"| $tag | batched | ${batchedRows.length} | $rb | $tb%.1f |")
      if (alsoSequential) {
        val t1 = System.nanoTime()
        val (ms, rs) = Bpe.trainMergesStats(docs, iters, batched = false)
        val seqRows = ms.collect()
        val ts = (System.nanoTime() - t1) / 1e9
        println(f"| $tag | sequential | ${seqRows.length} | $rs | $ts%.1f |")
        val same = batchedRows.map(_.toSeq).toSeq == seqRows.map(_.toSeq).toSeq
        println(s"| $tag | tables bit-identical | $same | | |")
        require(same, s"$tag: batched merge table diverged from sequential greedy")
      }
    }

    println(s"# bpe sweep: iters=$iters, sf=$sfDir")
    println("| corpus | mode | merges | refreshes | wall_s |")
    println("|---|---|---|---|---|")

    // Zipfian plateau: 1500 distinct 6-char words over a 30-letter
    // alphabet with Zipf-ish counts — early rounds are crowded with
    // near-tie pairs, but batch width is CAPPED at ~alphabet/2 (accepted
    // merges must be symbol-disjoint), the realistic middle case
    val alpha = ('a' to 'z') ++ Seq('α', 'β', 'γ', 'δ')
    val words = (0 until 1500).map { i =>
      val w = new StringBuilder
      var x = i * 2654435761L & 0x7fffffffL
      (0 until 6).foreach { _ => w += alpha((x % alpha.length).toInt); x /= alpha.length }
      val cnt = 3000 / (i + 1) + 1 // Zipf-ish
      (i.toLong, (w.toString + " ") * cnt)
    }
    val plateau = words.toDF("doc_id", "text")
    measure("plateau", plateau, alsoSequential = true)

    // wide plateau: the same shape over a 1200-symbol alphabet (the
    // byte-vocab + merged-symbol population a production tokenizer
    // actually trains over), so disjoint batches are bounded by maxN /
    // BatchFetch rather than the alphabet — the amortization case
    val wide = (0 until 1400).map { i =>
      val a = (0x4E00 + (i * 2) % 1200).toChar    // distinct CJK letters
      val b = (0x4E00 + (i * 2 + 1) % 1200).toChar
      val cnt = 4000 / (i + 1) + 1
      (i.toLong, (s"$a$b " * cnt))
    }.toDF("doc_id", "text")
    measure("wide", wide, alsoSequential = true)

    val docs = sources.Tables.documents(spark, sfDir)
    measure("documents", docs, alsoSequential = false)

    spark.stop()
  }
}
