package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Dedup

/** Near-dup decontamination ([[Dedup.fuzzyDecontaminate]]): planted
  * contamination cases — verbatim copy, reworded near-copy, below-threshold
  * overlap, multi-benchmark hits — and the output contract (training docs
  * only, best match by (jaccard desc, eval id), clean docs absent). */
class DecontamFuzzySpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  // eval set = ids 1000/1001 (evalPred below); training docs 1..6
  private val docs = Seq(
    (1000L, "the quick brown fox jumps over the lazy dog near the river bank"),
    (1001L, "large language models memorize benchmark answers when training data leaks"),
    // verbatim copy of eval 1000 → jaccard 1.0
    (1L, "the quick brown fox jumps over the lazy dog near the river bank"),
    // reworded near-copy of eval 1001 (one token changed)
    (2L, "large language models memorize benchmark answers when training data spills"),
    // shares a few tokens with 1000 but far below tau
    (3L, "a brown bear walked across the river in the early morning fog today"),
    // completely unrelated
    (4L, "solar panels convert sunlight directly into usable electrical energy"),
    // near-copy of BOTH eval docs concatenation? no — near-copy of 1000 with
    // a different single-token edit (second contaminated doc for the same
    // benchmark, exercises per-doc independence)
    (5L, "the quick brown fox jumps over the lazy dog near the wide river bank"),
    // exact duplicate of training doc 1 (train-train dup must NOT be flagged
    // by a decontamination screen)
    (6L, "the quick brown fox jumps over the lazy dog near the river bank"))
    .toDF("doc_id", "text")

  private val evalPred = col("doc_id") >= 1000L

  test("flags verbatim and reworded copies with the right best-match") {
    val out = Dedup.fuzzyDecontaminate(docs, evalPred, tau = 0.5)
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getDouble(2), r.getLong(3)))).toMap
    // verbatim copies: jaccard exactly 1.0 against eval 1000
    assert(out(1L) == ((1000L, 1.0, 1L)))
    assert(out(6L) == ((1000L, 1.0, 1L)))
    // reworded near-copy of 1001
    assert(out.contains(2L) && out(2L)._1 == 1001L && out(2L)._2 >= 0.5)
    // one-token-edited copy of 1000
    assert(out.contains(5L) && out(5L)._1 == 1000L)
    // below-threshold and unrelated docs are absent
    assert(!out.contains(3L) && !out.contains(4L))
    // eval docs are never reported
    assert(out.keys.forall(_ < 1000L))
  }

  test("multi-benchmark hit counts matches, best by (jaccard desc, eval id)") {
    // a doc near-duplicating BOTH eval docs at different strengths
    val twoHits = docs.union(Seq(
      (7L, "the quick brown fox jumps over the lazy dog near the river edge"),
      // second eval doc identical to 1000 except one token — doc 7 also
      // matches it, but weaker than its 1000 match
      (1002L, "the quick brown fox jumps over the lazy dog near the river banks"))
      .toDF("doc_id", "text"))
    val out = Dedup.fuzzyDecontaminate(twoHits, col("doc_id") >= 1000L, tau = 0.5)
      .filter(col("doc_id") === 7L).collect()
    assert(out.length == 1)
    val r = out.head
    assert(r.getLong(3) >= 2L, s"expected >=2 eval matches, got $r")
    // best match is the verbatim-closer eval doc 1000 (higher jaccard); a
    // tie would break to the LOWER eval id — also 1000
    assert(r.getLong(1) == 1000L)
  }

  test("threshold is respected: tau=1.0 keeps only exact copies") {
    val out = Dedup.fuzzyDecontaminate(docs, evalPred, tau = 1.0)
      .collect().map(_.getLong(0)).toSet
    assert(out == Set(1L, 6L))
  }
}
