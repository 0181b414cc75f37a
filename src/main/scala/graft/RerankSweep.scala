package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.operators.{ProductQuantizer, Similarity}

/** Rerank operating-point sweep (dev tooling, sibling of [[PqSweep]]):
  * recall@5 and search latency of the two-stage IVFADC serving path
  * (ADC shortlist → exact re-rank) across nprobe × shortlist, at the
  * SHIPPED index point (16×4, k=64). The interesting structure: recall
  * saturates in `shortlist` at the probe ceiling (the exact re-rank of
  * EVERYTHING the probe admits — a true neighbor outside the probed
  * clusters can never appear), so the sweep separates "shortlist too
  * small" from "need another probe". Results land in SCALE.md; the
  * chosen point's recall floor is pinned in PqSpec.
  *
  * Usage: graft.RerankSweep [sfDir]   (default /root/testdata/sf0.1)
  */
object RerankSweep {
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
    import ProductQuantizer.{DefaultSubspaces => m, DefaultSubDim => sub,
      DefaultK => k}
    val emb = sources.Tables.embeddings(spark, sfDir)

    val exact = Similarity.cosineTopK(emb, nQ, topK)
      .select(col("query_id"), col("neighbor_id")).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet

    val (cent, cbs, codes) = ProductQuantizer.ivfPqIndex(
      emb, c, ivfIters, m, sub, k, pqIters)
    val codesM = operators.Materialize(codes)
    codesM.count()

    // probe-ceiling row: a shortlist >= the corpus can never truncate, so
    // it measures recall bounded by the probe alone (and stays inside
    // searchIvfPqRerank's nQueries*shortlist broadcast guard, unlike a
    // blanket 10^6 sentinel)
    val ceiling = codesM.select(col("vec_id")).distinct().count().toInt
    println(s"# rerank sweep @ $sfDir: index $m×$sub k=$k C=$c, " +
      s"queries=$nQ, top-$topK (shortlist=$ceiling ≈ probe ceiling)")
    println("| nprobe | shortlist | recall@5 | search_s |")
    println("|---|---|---|---|")
    for (nprobe <- Seq(1, 2, 3);
         shortlist <- Seq(topK, 4 * topK, 8 * topK, 16 * topK, ceiling)) {
      val t1 = System.nanoTime()
      val got = ProductQuantizer.searchIvfPqRerank(emb, cent, cbs, codesM,
        nQ, topK, m, sub, nprobe, shortlist)
        .select(col("query_id"), col("neighbor_id")).collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
      val searchS = (System.nanoTime() - t1) / 1e9
      val recall = (got & exact).size.toDouble / exact.size
      println(f"| $nprobe | $shortlist | $recall%.3f | $searchS%.2f |")
    }
    spark.stop()
  }
}
