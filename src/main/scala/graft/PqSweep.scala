package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.operators.{ProductQuantizer, Similarity}

/** IVFADC operating-point sweep (dev tooling, not part of the library):
  * recall@5 vs exact brute-force cosine and search latency across
  * (subspaces m) × (codebook size k) × nprobe at a given SF, with the
  * shipped cluster count. One index build per (m, k); the three probe
  * depths reuse it — exactly how the knobs separate in production (index
  * build is amortized, nprobe is per-query). Results land in SCALE.md;
  * the chosen default's recall floor is pinned in PqSpec.
  *
  * Usage: graft.PqSweep [sfDir]   (default /root/testdata/sf0.1)
  */
object PqSweep {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
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

    val dim = Similarity.LshDim
    val (nQ, topK, c, ivfIters, pqIters) = (50, 5, 4, 2, 2)
    val emb = sources.Tables.embeddings(spark, sfDir)

    val exact = Similarity.cosineTopK(emb, nQ, topK)
      .select(col("query_id"), col("neighbor_id")).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet

    println(s"# IVFADC sweep @ $sfDir: C=$c, queries=$nQ, top-$topK, " +
      s"exact baseline ${exact.size} pairs")
    println("| m | k | nprobe | recall@5 | search_s | build_s |")
    println("|---|---|---|---|---|---|")
    for (m <- Seq(4, 8, 16); k <- Seq(16, 64, 256)) {
      val t0 = System.nanoTime()
      val (cent, cbs, codes) = ProductQuantizer.ivfPqIndex(
        emb, c, ivfIters, m, dim / m, k, pqIters)
      val codesM = operators.Materialize(codes)
      codesM.count() // force the build before timing searches
      val buildS = (System.nanoTime() - t0) / 1e9
      for (nprobe <- Seq(1, 2, 4)) {
        val t1 = System.nanoTime()
        val got = ProductQuantizer.searchIvfPq(emb, cent, cbs, codesM,
          nQ, topK, m, dim / m, nprobe)
          .select(col("query_id"), col("neighbor_id")).collect()
          .map(r => (r.getLong(0), r.getLong(1))).toSet
        val searchS = (System.nanoTime() - t1) / 1e9
        val recall = (got & exact).size.toDouble / exact.size
        println(f"| $m | $k | $nprobe | $recall%.3f | $searchS%.2f | $buildS%.2f |")
      }
    }
    spark.stop()
  }
}
