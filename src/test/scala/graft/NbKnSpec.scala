package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.TextAnalysis

/** Hand-computed invariants for the Naive Bayes classifier and the
  * Kneser–Ney LM that the oracle gate can't express: known-answer
  * classifications, tie-break determinism, and the closed-form KN
  * probabilities on a corpus small enough to verify by hand. */
class NbKnSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  test("nb classify: obvious classes, deterministic tie-break, unseen counts") {
    val train = Seq(
      (0L, "the cat", "en"), (2L, "the dog", "en"),
      (4L, "der hund", "de"), (6L, "der katze", "de"))
      .toDF("doc_id", "text", "lang")
    val score = Seq(
      (1L, "the cat", "en"), (3L, "der hund", "de"), (5L, "zzz zzz", "en"))
      .toDF("doc_id", "text", "lang")
    val out = TextAnalysis.nbClassify(train, score)
      .collect().map(r => r.getAs[Long]("doc_id") -> r).toMap
    assert(out(1L).getAs[String]("pred") == "en")
    assert(out(1L).getAs[Boolean]("correct"))
    assert(out(3L).getAs[String]("pred") == "de")
    // every token of doc 5 is unseen in BOTH classes and the priors are
    // equal → an exact integer NLL tie, broken by label asc → "de"
    assert(out(5L).getAs[String]("pred") == "de")
    assert(!out(5L).getAs[Boolean]("correct"))
    assert(out(5L).getAs[Long]("n_unseen") == 2L)
    // doc 1, class en: prior ln2, p(the)=(2+1)/(4+6)=0.3, p(cat)=0.2
    val nll = math.floor(-math.log(0.5) * 10000 + 0.5) +
      math.floor(-math.log(0.3) * 10000 + 0.5) +
      math.floor(-math.log(0.2) * 10000 + 0.5)
    assert(math.abs(out(1L).getAs[Double]("nll") - nll / 10000.0) < 1e-9)
    assert(out(1L).getAs[Long]("n_unseen") == 0L)
  }

  test("nb risk-coverage: margin separates clean from ambiguous docs, " +
      "cumulative laws hold") {
    val train = Seq(
      (0L, "the cat sat here", "en"), (2L, "the dog sat there", "en"),
      (4L, "der hund war da", "de"), (6L, "der katze war dort", "de"))
      .toDF("doc_id", "text", "lang")
    // doc 1: strongly English (large margin); doc 3: strongly German;
    // doc 5: every token unseen → both classes tie on smoothing alone →
    // margin 0 → the LEAST confident band
    val score = Seq(
      (1L, "the cat sat the cat sat", "en"),
      (3L, "der hund war der hund war", "de"),
      (5L, "zzz qqq", "en"))
      .toDF("doc_id", "text", "lang")
    val out = TextAnalysis.nbRiskCoverage(train, score,
        bandMicros = 2500L, nBands = 10)
      .collect().map(r => r.getAs[Long]("band") -> r).toMap
    // all three docs accounted for; coverage reaches exactly 1.0
    assert(out.values.map(_.getAs[Long]("n_docs")).sum == 3L)
    val full = out(out.keys.min)
    assert(full.getAs[Long]("cum_docs") == 3L)
    assert(full.getAs[Double]("coverage") == 1.0)
    // the zero-margin tie doc lands in band 0 and is the one wrong call
    // (tie broken to "de", actual "en"), so full-coverage selective
    // accuracy is 2/3 while the confident slice is perfect
    assert(out.contains(0L) && out(0L).getAs[Long]("n_correct") == 0L)
    assert(full.getAs[Double]("selective_acc") == 0.6667)
    val top = out(out.keys.max)
    assert(out.keys.max > 0L)
    assert(top.getAs[Double]("selective_acc") == 1.0)
    // selective accuracy is the cumulative ratio at every band: spot the
    // monotone bookkeeping cum_correct/cum_docs == selective_acc
    out.values.foreach { r =>
      val exp = math.floor(r.getAs[Long]("cum_docs").toDouble *
        r.getAs[Double]("selective_acc") * 10000 + 0.5)
      assert(math.abs(exp / 10000.0 / r.getAs[Long]("cum_docs") -
        r.getAs[Double]("selective_acc")) < 1e-3)
    }
  }

  test("nb confusion aggregates the per-doc predictions") {
    val train = Seq(
      (0L, "the cat", "en"), (2L, "the dog", "en"),
      (4L, "der hund", "de"), (6L, "der katze", "de"))
      .toDF("doc_id", "text", "lang")
    val score = Seq(
      (1L, "the cat the dog", "en"), (3L, "der hund", "de"),
      (5L, "der katze der hund", "en"))
      .toDF("doc_id", "text", "lang")
    val out = TextAnalysis.nbConfusion(train, score)
      .collect()
      .map(r => (r.getAs[String]("actual"), r.getAs[String]("pred")) ->
        (r.getAs[Long]("n"), r.getAs[Long]("n_correct"))).toMap
    assert(out(("en", "en")) == ((1L, 1L)))   // doc 1
    assert(out(("de", "de")) == ((1L, 1L)))   // doc 3
    assert(out(("en", "de")) == ((1L, 0L)))   // doc 5: German words, en label
    assert(out.size == 3)
  }

  test("kneser-ney: closed-form probabilities on a hand-checkable corpus") {
    // train bigrams: "a b" ×2, "a c" ×1 → c(a·)=3, N1+(a,·)=2,
    // N1+(·,b)=N1+(·,c)=1, N1+(··)=2
    val train = Seq((0L, "a b"), (2L, "a b"), (4L, "a c")).toDF("doc_id", "text")
    val score = Seq(
      (1L, "a b"),   // discounted hit: (2-.75)/3 + .75·(2/3)·(1/2) = 2/3
      (3L, "a z"),   // seen ctx, z never a continuation: floors at unseenP
      (5L, "z b"),   // unseen ctx: continuation alone = 1/2
      (7L, "q"))     // no bigrams at all
      .toDF("doc_id", "text")
    val out = TextAnalysis.kneserNeyLm(train, score)
      .collect().map(r => r.getAs[Long]("doc_id") -> r).toMap
    def q4(p: Double): Double = math.floor(-math.log(p) * 10000 + 0.5) / 10000.0
    assert(out(1L).getAs[Long]("n_hit") == 1L)
    assert(math.abs(out(1L).getAs[Double]("avg_nll") - q4(2.0 / 3.0)) < 1e-9)
    assert(out(3L).getAs[Long]("n_cont_backoff") == 1L)
    assert(out(3L).getAs[Double]("avg_nll") == 9.2103) // -ln(1e-4)
    assert(out(5L).getAs[Long]("n_ctx_unseen") == 1L)
    assert(math.abs(out(5L).getAs[Double]("avg_nll") - q4(0.5)) < 1e-9)
    assert(out(7L).getAs[Long]("n_bigrams") == 0L)
    assert(out(7L).isNullAt(out(7L).fieldIndex("avg_nll")))
    // the KN mass identity: for a seen context, Σ_w P(w|ctx) over the
    // whole vocabulary is 1 — check over the closed vocab {b, c}
    val pb = (2.0 - 0.75) / 3.0 + 0.75 * (2.0 / 3.0) * (1.0 / 2.0)
    val pc = (1.0 - 0.75) / 3.0 + 0.75 * (2.0 / 3.0) * (1.0 / 2.0)
    assert(math.abs(pb + pc - 1.0) < 1e-12)
  }

  test("kneser-ney trigram: closed-form arms and the interpolated mass identity") {
    // train trigrams: "a b c" ×2, "a b d" ×1 → c(ab·)=3, N1+(ab,·)=2;
    // trigram types through b: N1+(·bc)=N1+(·bd)=1, N1+(·b·)=2, N1+(b,·)=2;
    // bigram types: {ab, bc, bd} → N1+(··)=3, N1+(·b)=N1+(·c)=N1+(·d)=1
    val train = Seq((0L, "a b c"), (2L, "a b c"), (4L, "a b d"))
      .toDF("doc_id", "text")
    val p1 = (w: String) => if (Set("b", "c", "d")(w)) 1.0 / 3.0 else 0.0
    def p2(w: String): Double = {
      val m23 = if (w == "c" || w == "d") 1.0 else 0.0
      math.max(m23 - 0.75, 0.0) / 2.0 + 0.75 * 2.0 / 2.0 * p1(w)
    }
    def p3(w: String): Double = {
      val n3 = w match { case "c" => 2.0; case "d" => 1.0; case _ => 0.0 }
      math.max(n3 - 0.75, 0.0) / 3.0 + 0.75 * 2.0 / 3.0 * p2(w)
    }
    // the interpolated-KN mass identity, all three orders chained: for the
    // seen context (a,b), Σ_w P3(w|ab) over the closed vocab is exactly 1
    assert(math.abs(p3("b") + p3("c") + p3("d") - 1.0) < 1e-12)
    val score = Seq(
      (1L, "a b c"),   // trigram hit (lvl 3)
      (3L, "a b z"),   // ctx seen, z never a continuation → unseenP floor
      (5L, "z b c"),   // ctx unseen, middle seen → bigram-continuation arm
      (7L, "z z c"),   // both unseen → unigram continuation = 1/3
      (9L, "q r"))     // too short for a trigram
      .toDF("doc_id", "text")
    val out = TextAnalysis.kneserNey3Lm(train, score)
      .collect().map(r => r.getAs[Long]("doc_id") -> r).toMap
    def q4(p: Double): Double = math.floor(-math.log(p) * 10000 + 0.5) / 10000.0
    assert(out(1L).getAs[Long]("n_hit") == 1L)
    assert(math.abs(out(1L).getAs[Double]("avg_nll") - q4(p3("c"))) < 1e-9)
    assert(out(3L).getAs[Long]("n_disc_backoff") == 1L)
    assert(out(3L).getAs[Double]("avg_nll") == 9.2103) // -ln(1e-4)
    assert(out(5L).getAs[Long]("n_bigram_backoff") == 1L)
    assert(math.abs(out(5L).getAs[Double]("avg_nll") - q4(p2("c"))) < 1e-9)
    assert(out(7L).getAs[Long]("n_ctx_unseen") == 1L)
    assert(math.abs(out(7L).getAs[Double]("avg_nll") - q4(1.0 / 3.0)) < 1e-9)
    assert(out(9L).getAs[Long]("n_trigrams") == 0L)
    assert(out(9L).isNullAt(out(9L).fieldIndex("avg_nll")))
    // the same identity driven THROUGH the operator: one one-trigram doc
    // per vocab word, probabilities recovered from the 4dp NLLs
    val mass = Seq((1L, "a b b"), (3L, "a b c"), (5L, "a b d"))
      .toDF("doc_id", "text")
    val probs = TextAnalysis.kneserNey3Lm(train, mass)
      .collect().map(r => math.exp(-r.getAs[Double]("avg_nll"))).sum
    assert(math.abs(probs - 1.0) < 1e-3)
  }

  test("novelty: planted overlap fractions, short docs unscored") {
    import graft.operators.Decontamination
    val ref = Seq((0L, "a b c d e f")).toDF("doc_id", "text")
    val score = Seq(
      (1L, "a b c d e f"),        // 4 trigrams, all in ref → novel 0
      (3L, "a b c x y z"),        // 4 trigrams, only "a b c" in ref → 0.75
      (5L, "p q r s"),            // 2 trigrams, none in ref → 1.0
      (7L, "xy"))                 // too short for a trigram → unscored
      .toDF("doc_id", "text")
    val out = Decontamination.noveltyScore(score, ref, n = 3)
      .collect().map(r => r.getAs[Long]("doc_id") -> r).toMap
    assert(out(1L).getAs[Double]("novel_frac") == 0.0)
    assert(out(1L).getAs[Long]("n_grams") == 4L)
    assert(out(3L).getAs[Double]("novel_frac") == 0.75)
    assert(out(5L).getAs[Double]("novel_frac") == 1.0)
    assert(out(7L).getAs[Long]("n_grams") == 0L)
    assert(out(7L).isNullAt(out(7L).fieldIndex("novel_frac")))
    // the bloom prescreen is BIT-EXACT (no false negatives on "novel";
    // positives re-checked exactly) — same rows, all four arms included
    // (the all-novel doc 5 exercises the no-row-in-seen coalesce path)
    val exact = Decontamination.noveltyScore(score, ref, n = 3)
      .orderBy("doc_id").collect().map(_.toSeq)
    val bloom = Decontamination.noveltyScoreBloom(score, ref, n = 3)
      .orderBy("doc_id").collect().map(_.toSeq)
    assert(exact.toSeq == bloom.toSeq)
  }

  test("ccnet buckets: terciles split scored docs, short docs unscored") {
    // train makes "a b" cheap and everything else expensive; three score
    // docs with strictly ordered avg_nll land in head/middle/tail
    val train = Seq((0L, "a b"), (2L, "a b"), (4L, "a c")).toDF("doc_id", "text")
    val score = Seq(
      (1L, "a b a b"),   // mostly the cheap bigram
      (3L, "a c a b"),   // mixed
      (5L, "z z z z"),   // all unseen context
      (7L, "q"))         // no bigrams
      .toDF("doc_id", "text")
    val out = TextAnalysis.ccnetBuckets(train, score)
      .collect().map(r => r.getAs[Long]("doc_id") -> r.getAs[String]("bucket")).toMap
    assert(out(1L) == "head")
    assert(out(3L) == "middle")
    assert(out(5L) == "tail")
    assert(out(7L) == "unscored")
  }

  test("kneser-ney separates promiscuous continuations from frequent ones") {
    // "b" follows TWO distinct contexts (a, c); "d" follows only one (e)
    // but with a HIGHER raw count — pcont ranks b above d, raw counts
    // would rank d above b. Score both in an unseen context.
    val train = Seq((0L, "a b"), (2L, "c b"), (4L, "e d"), (6L, "e d"))
      .toDF("doc_id", "text")
    val score = Seq((1L, "z b"), (3L, "z d")).toDF("doc_id", "text")
    val out = TextAnalysis.kneserNeyLm(train, score)
      .collect().map(r => r.getAs[Long]("doc_id") -> r).toMap
    assert(out(1L).getAs[Double]("avg_nll") < out(3L).getAs[Double]("avg_nll"))
  }
}
