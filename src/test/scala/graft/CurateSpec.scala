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
    assert(f.input >= f.quality)
    assert(f.quality >= f.rules)
    assert(f.rules >= f.repetition)
    assert(f.repetition >= f.dedup)
    assert(f.dedup >= f.semdedup)
    assert(f.semdedup >= f.decontaminated)
    assert(f.decontaminated >= f.fuzzyClean)
    assert(f.fuzzyClean >= f.dsir)
    assert(f.dsir >= f.sampled)
    // the two new gates actually gate on the synthetic corpus: SemDeDup
    // finds at least one semantic near-dup class, and the DSIR cut keeps a
    // non-trivial target-like slice without emptying the funnel
    assert(f.semdedup < f.dedup)
    assert(f.dsir > 0 && f.dsir < f.fuzzyClean)
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
