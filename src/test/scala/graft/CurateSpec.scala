package graft

import java.nio.file.Files

import org.scalatest.funsuite.AnyFunSuite

/** End-to-end curation pipeline: stage funnel is monotone, deterministic
  * across reruns, and the written corpus matches the surviving chunk
  * count. */
class CurateSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  test("curate pipeline: monotone funnel, reproducible, output matches") {
    val out = graft.SessionScoped.scratchDir("graft_curate")
    val f = Curate.run(spark, "/root/testdata/sf0.001", out)
    // each stage can only shrink the corpus (chunks explode rows, excluded)
    assert(f.input >= f.blocklist)
    assert(f.blocklist >= f.quality)
    assert(f.quality >= f.rules)
    assert(f.rules >= f.repetition)
    assert(f.repetition >= f.dedup)
    assert(f.dedup >= f.semdedup)
    assert(f.semdedup >= f.decontaminated)
    assert(f.decontaminated >= f.fuzzyClean)
    assert(f.fuzzyClean >= f.dsir)
    assert(f.dsir >= f.ccnet)
    assert(f.ccnet >= f.sampled)
    // the gates actually gate on the synthetic corpus: the blocklist term
    // is planted in ~5% of docs, SemDeDup finds at least one semantic
    // near-dup class, the DSIR cut keeps a non-trivial target-like slice,
    // and the CCNet tail tercile drops scored docs — all without
    // emptying the funnel
    assert(f.blocklist < f.input)
    assert(f.semdedup < f.dedup)
    assert(f.dsir > 0 && f.dsir < f.fuzzyClean)
    assert(f.ccnet > 0 && f.ccnet < f.dsir)
    // every stage leaves a non-trivial corpus on the synthetic data
    assert(f.sampled > 0 && f.chunks >= f.sampled)
    // packing: sequence count ≈ total tokens / 512, never above chunk count
    assert(f.seqs > 0 && f.seqs <= f.chunks)
    // tokenizer artifact: full merge table learned, non-trivial vocabulary
    assert(f.merges == 32 && f.vocab > 26)
    // shard layout: every 16-sequence shard full except the last
    assert(f.shards == (f.seqs + 15) / 16)
    // data card: written next to the shards, one row per surviving
    // stratum, shares normalized — and ZERO exact dups (the dedup stage
    // ran upstream, so the manifest must certify a dup-free deliverable)
    // the blocklist contract end-to-end: NO surviving document contains
    // the planted blocked term (any-hit-drops at maxFrac=0)
    locally {
      import org.apache.spark.sql.functions._
      val survivors = spark.read.parquet(s"$out/chunks")
        .select("doc_id").distinct()
      val blockedIds = graft.sources.Tables
        .documents(spark, "/root/testdata/sf0.001")
        .filter(array_contains(split(col("text"), " "), "dup"))
        .select("doc_id")
      assert(survivors.join(blockedIds, "doc_id").count() == 0)
    }
    val card = spark.read.parquet(s"$out/data_card").collect()
    assert(card.nonEmpty)
    assert(card.map(_.getAs[Long]("n_docs")).sum == f.sampled)
    assert(card.forall(_.getAs[Long]("n_exact_dups") == 0L))
    assert(math.abs(card.map(_.getAs[Double]("share_pct")).sum - 1.0) < 0.01)
    // deterministic: a rerun lands the identical funnel
    val out2 = graft.SessionScoped.scratchDir("graft_curate2")
    assert(Curate.run(spark, "/root/testdata/sf0.001", out2) == f)
    // the bloom-prescreened decontamination path is bit-exact by
    // contract, so the whole funnel must be unchanged under it
    val out3 = graft.SessionScoped.scratchDir("graft_curate3")
    assert(Curate.run(spark, "/root/testdata/sf0.001", out3,
      bloomScreen = true) == f)
  }
}
