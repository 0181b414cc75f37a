package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{Graph, ProductQuantizer, Profile, Similarity, TextAnalysis}

/** Round-18 optimization equivalence pins: each rewrite replaced a plan
  * shape (window rank, position explode+distinct, mixed sort-aggregate)
  * with a cheaper one that must be VALUE-identical, including at the
  * exact tie points the original tiebreak rules ordered. These tests
  * craft the ties on purpose — the oracle gate covers the shipped
  * corpora, these cover the corner the corpora may not contain. */
class OptEquivalenceSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  test("ivfAssignTop nprobe=1 argmax-aggregate honors (score desc, id asc) at exact ties") {
    // centroids 7 and 3 are IDENTICAL vectors: every cosine ties at 4dp
    // exactly, so the winner must be the LOWER centroid id (3), matching
    // the window formulation's (cscore desc, centroid_id) order
    val emb = Seq(
      (100L, Array(1.0f, 0.0f)),
      (101L, Array(0.6f, 0.8f)),
      (102L, Array(-1.0f, 0.25f))).toDF("vec_id", "embedding")
    val cent = Seq(
      (7L, Array(0.5f, 0.5f)),
      (3L, Array(0.5f, 0.5f))).toDF("centroid_id", "ce")
    val got = Similarity.ivfAssignTop(emb, cent, 1)
      .orderBy("vec_id").collect()
    assert(got.map(_.getLong(1)).toSeq == Seq(3L, 3L, 3L))
    // and the decoded cscore must be the 4dp r4 double the window path
    // produced: floor(cos·10⁴+0.5)/10⁴ exactly
    val want = Similarity.ivfAssignTop(emb, cent, 2)
      .filter(col("probe_rank") === 1) // window path (nprobe > 1)
      .orderBy("vec_id").collect()
    assert(got.map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSeq ==
      want.map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSeq)
  }

  test("PQ l2Assign argmin-aggregate ties to the lowest code") {
    // codebook entries 5 and 2 identical in every subspace: all
    // distances tie, the assignment must pick code 2
    val emb = Seq(
      (0L, Array(0.3f, -0.4f, 0.1f, 0.9f)),
      (1L, Array(-0.2f, 0.8f, 0.5f, -0.1f))).toDF("vec_id", "embedding")
    val cbs = Seq(
      (0, 5L, Array(0.1f, 0.2f)), (0, 2L, Array(0.1f, 0.2f)),
      (1, 5L, Array(-0.3f, 0.4f)), (1, 2L, Array(-0.3f, 0.4f)))
      .toDF("m", "code", "ce")
    val codes = ProductQuantizer.encodeOn(emb, cbs, subspaces = 2, subDim = 2)
      .orderBy("vec_id", "m").collect()
    assert(codes.map(_.getLong(2)).forall(_ == 2L))
  }

  test("labelPropagation vote tie breaks to the smallest label (aggregate = window)") {
    // node 1 has exactly one edge to each of 10 and 20: vote counts tie
    // 1-1, so round 1 must adopt label 10, not 20
    val edges = Seq((1L, 10L), (1L, 20L), (10L, 10L), (20L, 20L))
      .toDF("src", "dst")
    val labels = Graph.labelPropagation(edges, iters = 1)
      .orderBy("node").collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(labels.toMap.apply(1L) == 10L)
  }

  test("repetitionNgrams dup coverage: interval-union fold equals distinct positions on overlapping spans") {
    // tokens a a a a a a b: the 5-gram "a a a a a" occurs at starts 0 and
    // 1 — overlapping spans [0,4] and [1,5], union = 6 of 7 positions.
    // The fold must count 6 (not 10, the double-counted explode total).
    val docs = Seq((1L, "a a a a a a b")).toDF("doc_id", "text")
    val row = TextAnalysis.repetitionNgrams(docs).collect().head
    val frac = row.getAs[Double]("dup_5gram_frac")
    assert(frac == math.floor(6.0 / 7.0 * 10000 + 0.5) / 10000)
    // no other dup-n fires: the only other repeated grams are shorter
    assert(row.getAs[Double]("dup_6gram_frac") == 0.0)
  }

  test("profile split (distinct-agg × min/max-agg) equals the single-aggregate metrics") {
    val df = Seq(
      (Some(1L), Some("b")), (Some(1L), None),
      (Some(3L), Some("a")), (None, Some("a")))
      .toDF("k", "s")
    val got = Profile.profile(df, Seq("k", "s"))
      .orderBy("col_name").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getString(4), r.getString(5)))
    assert(got.toSeq == Seq(
      ("k", 4L, 1L, 2L, "1", "3"),
      ("s", 4L, 1L, 2L, "a", "b")))
  }
}
