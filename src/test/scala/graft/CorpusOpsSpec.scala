package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{Chunking, CorpusStats, Decontamination, Dedup, Sampling, TextAnalysis}

/** Invariants for the corpus-curation operators (sampling / chunking /
  * vocab / TF-IDF) that the oracle gate can't express: statistical rate
  * bounds, coverage, and cross-run determinism. */
class CorpusOpsSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def docs(n: Int) =
    (0 until n).map(i => (i.toLong, s"w${i % 7} w${i % 5} w${i % 3} common"))
      .toDF("doc_id", "text")

  test("hash sampling is deterministic, disjoint across salts, near the rate") {
    val ids = spark.range(20000).select(col("id").as("doc_id"))
    val once = Sampling.sample(ids, col("doc_id"), "a:", 0.25).collect().map(_.getLong(0)).toSet
    val again = Sampling.sample(ids, col("doc_id"), "a:", 0.25).collect().map(_.getLong(0)).toSet
    assert(once == again)                       // reproducible
    val rate = once.size / 20000.0
    assert(rate > 0.23 && rate < 0.27)          // uniform near 25%
    val other = Sampling.sample(ids, col("doc_id"), "b:", 0.25).collect().map(_.getLong(0)).toSet
    val overlap = once.intersect(other).size / once.size.toDouble
    assert(overlap > 0.15 && overlap < 0.35)    // independent salts ⇒ ~rate²/rate
    // nested rates: a 10% sample is a subset of the 25% sample (same salt)
    val small = Sampling.sample(ids, col("doc_id"), "a:", 0.10).collect().map(_.getLong(0)).toSet
    assert(small.subsetOf(once))
    // boundary rates: 1.0 keeps everything, 0.0 nothing (the 65536-bucket
    // threshold is not expressible as a 4-char hex compare — regression)
    assert(Sampling.sample(ids, col("doc_id"), "a:", 1.0).count() == 20000L)
    assert(Sampling.sample(ids, col("doc_id"), "a:", 0.0).count() == 0L)
    val strat = ids.withColumn("lang", when(col("doc_id") % 2 === 0, "en").otherwise("de"))
    val keptAll = strat.filter(Sampling.stratifiedBy(col("doc_id"), col("lang"), "a:",
      Map("de" -> 1.0), 0.25))
    assert(keptAll.filter(col("lang") === "de").count() == 10000L)
  }

  test("chunking covers every token exactly; overlap = size - stride") {
    val d = Seq((1L, (1 to 95).map(i => s"t$i").mkString(" "))).toDF("doc_id", "text")
    val ch = Chunking.chunk(d, chunkSize = 40, stride = 30)
      .orderBy("chunk_id").collect()
    assert(ch.map(_.getAs[Long]("chunk_id")).toSeq == Seq(0L, 1L, 2L, 3L))
    assert(ch.map(_.getAs[Long]("start_token")).toSeq == Seq(1L, 31L, 61L, 91L))
    assert(ch.map(_.getAs[Long]("n_chunk_tokens")).toSeq == Seq(40L, 40L, 35L, 5L))
    // last token index covered = start + n - 1 = 95 for every tail
    assert(ch.map(r => r.getAs[Long]("start_token") + r.getAs[Long]("n_chunk_tokens") - 1)
      .max == 95L)
  }

  test("passage dedup keeps exactly one canonical occurrence per distinct chunk") {
    val d = Seq((1L, "a b c d"), (2L, "a b c d"), (3L, "x y z w"))
      .toDF("doc_id", "text")
    val out = Chunking.passageDedup(Chunking.chunk(d, 4, 4)).collect()
    assert(out.length == 3)
    val dups = out.filter(_.getAs[Boolean]("is_duplicate"))
    assert(dups.map(_.getAs[Long]("doc_id")).toSeq == Seq(2L))
    assert(dups.head.getAs[Long]("canonical_doc_id") == 1L)
  }

  test("keep-best dedup keeps the highest-quality doc per cluster, not min id") {
    val base = (1 to 40).map(i => s"tok$i").mkString(" ")
    val longer = base + " " + (41 to 48).map(i => s"tok$i").mkString(" ")
    val d = Seq(
      (1L, base),                       // near-dup of 3, lower quality (shorter)
      (2L, ("zz " * 30).trim),          // singleton filler, not in any cluster
      (3L, longer)                      // near-dup of 1, higher quality
    ).toDF("doc_id", "text")
    val out = Dedup.dedupCorpusKeepBest(d, 0.7).collect()
    // only clustered docs appear; doc 2 is a singleton
    assert(out.map(_.getAs[Long]("doc_id")).sorted.toSeq == Seq(1L, 3L))
    val byId = out.map(r => r.getAs[Long]("doc_id") -> r.getAs[Boolean]("keep")).toMap
    assert(byId(3L) && !byId(1L))       // min-id would have kept 1; quality keeps 3
    assert(out.map(_.getAs[Long]("cluster_id")).distinct.length == 1)
  }

  test("leakage-safe split keeps every near-dup cluster in one split") {
    import graft.operators.Sampling
    // 30 near-dup pairs (ids 2k/2k+1 share a distinct 40-token text, the
    // second member with a short suffix) + 5 singletons
    val rows = (0 until 30).flatMap { k =>
      val base = (1 to 40).map(i => s"p${k}w$i").mkString(" ")
      Seq((2L * k, base), (2L * k + 1, base + s" extra$k"))
    } ++ (100 until 105).map(i => (i.toLong, (1 to 20).map(j => s"s${i}w$j").mkString(" ")))
    val d = rows.toDF("doc_id", "text")
    val cuts = Seq("train" -> 0.5, "val" -> 0.25, "test" -> 0.25)
    val out = Dedup.leakageSafeSplit(d, 0.7, "sp1:", cuts).collect()
      .map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[Long]("cluster_id"), r.getAs[String]("split"))).toMap
    assert(out.size == 65)
    // every pair: same cluster, same split
    (0 until 30).foreach { k =>
      assert(out(2L * k) == out(2L * k + 1), s"pair $k split apart")
    }
    // the property is non-vacuous: a per-doc split DOES separate some pair
    val perDoc = d.select(col("doc_id"),
      Sampling.splitBy(col("doc_id"), "sp1:", cuts).as("split")).collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[String]("split")).toMap
    assert((0 until 30).exists(k => perDoc(2L * k) != perDoc(2L * k + 1)))
    // singletons: cluster = own id, split = per-doc split
    (100L until 105L).foreach { i =>
      assert(out(i) == ((i, perDoc(i))))
    }
  }

  test("dedup-weighted sampling discounts keep probability by cluster size") {
    // 50 near-dup quadruplets (ids 4k..4k+3) + 200 singletons
    val rows = (0 until 50).flatMap { k =>
      val base = (1 to 40).map(i => s"c${k}w$i").mkString(" ")
      (0 until 4).map(v => (4L * k + v, base + s" v$v"))
    } ++ (1000 until 1200).map(i => (i.toLong, (1 to 20).map(j => s"u${i}t$j").mkString(" ")))
    val d = rows.toDF("doc_id", "text")
    val out = Dedup.dedupWeightedSample(d, 0.7, "dw1:", 0.5).collect()
    val keptIds = out.map(_.getAs[Long]("doc_id")).toSet
    // deterministic across runs
    val again = Dedup.dedupWeightedSample(d, 0.7, "dw1:", 0.5).collect()
      .map(_.getAs[Long]("doc_id")).toSet
    assert(keptIds == again)
    // quadruplet members carry cluster_size 4 and keep at rate/4 = 0.125;
    // singletons carry size 1 and keep at the raw rate 0.5
    val quadKept = out.filter(_.getAs[Long]("doc_id") < 1000)
    assert(quadKept.forall(_.getAs[Long]("cluster_size") == 4L))
    assert(quadKept.length > 7 && quadKept.length < 46,
      s"${quadKept.length} of 200 quad docs kept, expected ~25")
    val singleKept = out.filter(_.getAs[Long]("doc_id") >= 1000)
    assert(singleKept.forall(_.getAs[Long]("cluster_size") == 1L))
    assert(singleKept.length > 70 && singleKept.length < 130,
      s"${singleKept.length} of 200 singletons kept, expected ~100")
    // the threshold is the exact integer-math contract, not just a rate
    import graft.operators.Sampling
    val buckets = d.select(col("doc_id"),
      Sampling.hashBucket(col("doc_id"), "dw1:").as("b")).collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[Long]("b")).toMap
    assert(keptIds.forall(id =>
      buckets(id) < (if (id < 1000) 8192 else 32768)))
    assert(rows.map(_._1).filterNot(keptIds).forall(id =>
      buckets(id) >= (if (id < 1000) 8192 else 32768)))
  }

  test("pmi matches the hand formula; minCount prunes") {
    // corpus: "a b a b" ⇒ bigrams {a b:2, b a:1}, unigrams {a:2, b:2}
    val d1 = Seq((1L, "a b a b")).toDF("doc_id", "text")
    val out1 = TextAnalysis.pmiCollocations(d1, minCount = 1).collect()
      .map(r => r.getAs[String]("bigram") -> r.getAs[Double]("pmi")).toMap
    val want = math.floor(math.log((2.0 / 3) / ((2.0 / 4) * (2.0 / 4))) * 10000 + 0.5) / 10000
    assert(out1("a b") == want)
    // deterministic collocation: t0 is ALWAYS followed by u0 but only
    // occupies 1/4 of positions ⇒ pmi = ln((25/99)/(0.25·0.25)) ≈ 1.40,
    // well above the mixed cross-pair bigrams like "u0 t1"
    val txt = (0 until 50).map(i => s"t${i % 2} u${i % 2}").mkString(" ")
    val d2 = Seq((1L, txt)).toDF("doc_id", "text")
    val out2 = TextAnalysis.pmiCollocations(d2, minCount = 5).collect()
    val m2 = out2.map(r => r.getAs[String]("bigram") -> r.getAs[Double]("pmi")).toMap
    assert(!m2.contains("t0 u1")) // never co-occurs
    val wantColl =
      math.floor(math.log((25.0 / 99) / ((25.0 / 100) * (25.0 / 100))) * 10000 + 0.5) / 10000
    assert(m2("t0 u0") == wantColl)
    // minCount prunes: nothing below the threshold survives
    assert(out2.forall(_.getAs[Long]("n_ab") >= 5L))
  }

  test("dupSourceMatrix attributes near-dup pairs to unordered source pairs") {
    val base = (1 to 40).map(i => s"m$i").mkString(" ")
    val other = (1 to 40).map(i => s"n$i").mkString(" ")
    val d = Seq(
      (1L, base, "crawlA"), (2L, base + " x", "crawlB"),   // cross-source pair
      (3L, other, "crawlA"), (4L, other + " y", "crawlA"), // within-source pair
      (5L, (1 to 30).map(i => s"z$i").mkString(" "), "crawlC") // singleton
    ).toDF("doc_id", "text", "source")
    val out = Dedup.dupSourceMatrix(d, 0.7).collect()
      .map(r => (r.getAs[String]("source_x"), r.getAs[String]("source_y")) ->
        (r.getAs[Long]("n_pairs"), r.getAs[Double]("avg_jaccard"))).toMap
    assert(out.keySet == Set(("crawlA", "crawlB"), ("crawlA", "crawlA")))
    assert(out(("crawlA", "crawlB"))._1 == 1L)
    assert(out(("crawlA", "crawlA"))._1 == 1L)
    assert(out.values.forall(_._2 >= 0.7))
  }

  test("vocab ranks by frequency with token tiebreak; df <= freq") {
    val rows = TextAnalysis.vocab(docs(100), 10).orderBy("rk").collect()
    assert(rows.head.getAs[String]("token") == "common")
    assert(rows.head.getAs[Long]("freq") == 100L)
    val freqs = rows.map(_.getAs[Long]("freq")).toSeq
    assert(freqs == freqs.sortBy(-_))
    rows.foreach(r => assert(r.getAs[Long]("df") <= r.getAs[Long]("freq")))
  }

  test("tfidf gives ubiquitous tokens zero weight") {
    val rows = TextAnalysis.tfidfTop(docs(100), 3).collect()
    // 'common' appears in every doc: ln(N/df) = ln(1) = 0 ⇒ never a top term
    // unless everything ties at 0 — our docs always have a rarer token
    rows.filter(_.getAs[Int]("rk") == 1)
      .foreach(r => assert(r.getAs[String]("token") != "common"))
  }

  test("bigram LM: conditional probabilities per prefix sum to 1 before pruning") {
    val d = Seq((1L, "a b a b a c"), (2L, "a b a c a b")).toDF("doc_id", "text")
    // bigrams: a b ×4, b a ×3, a c ×2, c a ×1 → prefix a: 6, b: 3, c: 1
    val out = TextAnalysis.bigramLm(d, minCount = 1L).collect()
      .map(r => r.getAs[String]("bigram") -> r).toMap
    assert(out("a b").getAs[Long]("n") == 4L)
    assert(out("a b").getAs[Long]("n_prefix") == 6L)
    assert(out("a b").getAs[Double]("cond_p") == 0.6667)
    assert(out("a c").getAs[Double]("cond_p") == 0.3333)
    assert(out("c a").getAs[Double]("cond_p") == 1.0)
    // pruning keeps the denominator: with minCount=2, "c a" drops but
    // "a c" still divides by the full prefix-6
    val pruned = TextAnalysis.bigramLm(d, minCount = 2L).collect()
      .map(r => r.getAs[String]("bigram")).toSet
    assert(pruned == Set("a b", "b a", "a c"))
  }

  test("quality deciles: monotone in score, all ten buckets populated, no global sort") {
    val d = (0 until 200).map(i =>
      (i.toLong, (0 to i % 40).map(k => s"w${(i * 7 + k) % (5 + i % 37)}").mkString(" ")))
      .toDF("doc_id", "text")
    val out = CorpusStats.qualityDeciles(d)
    val rows = out.collect()
    val byScore = rows.sortBy(_.getAs[Double]("quality_score"))
    // deciles never decrease as score increases
    assert(byScore.map(_.getAs[Int]("decile")).sliding(2).forall(p => p(0) <= p(1)))
    assert(rows.map(_.getAs[Int]("decile")).distinct.length >= 8)
    // scale shape: the plan must not contain a global (single-partition) sort
    val plan = out.queryExecution.executedPlan.toString
    assert(!plan.contains("Sort "), s"unexpected sort in plan")
  }

  test("decontamination flags exactly the docs sharing eval n-grams") {
    val d = Seq(
      (0L, "the quick brown fox jumps over the lazy dog today"), // eval
      (1L, "the quick brown fox jumps over a sleeping cat now"), // shares two 5-grams
      (2L, "completely different words with no overlap at all here"),
      (3L, "another clean document about spark catalyst optimizer internals")
    ).toDF("doc_id", "text")
    val out = Decontamination.screen(d, col("doc_id") === 0, n = 5, minHits = 1)
      .orderBy("doc_id").collect()
    assert(out.map(_.getAs[Long]("doc_id")).toSeq == Seq(1L, 2L, 3L))
    val flags = out.map(r => r.getAs[Long]("doc_id") -> r.getAs[Boolean]("contaminated")).toMap
    assert(flags(1L))      // "the quick brown fox jumps" + "quick brown fox jumps over"
    assert(!flags(2L) && !flags(3L))
    val hit = out.find(_.getAs[Long]("doc_id") == 1L).get
    assert(hit.getAs[Long]("n_eval_hits") == 2L)
  }

  test("repetition metrics: degenerate loop text fails, diverse text passes") {
    val d = Seq(
      (1L, "buy now buy now buy now buy now buy now buy now"),
      // long enough that 1/n_bigrams sits under the 10% top-bigram default
      (2L, (1 to 24).map(i => s"unique$i").mkString(" "))
    ).toDF("doc_id", "text")
    val out = TextAnalysis.repetition(d).collect()
      .map(r => r.getAs[Long]("doc_id") -> r).toMap
    assert(!out(1L).getAs[Boolean]("keep"))
    assert(out(1L).getAs[Double]("top_bigram_frac") > 0.4) // "buy now" dominates
    assert(out(2L).getAs[Boolean]("keep"))
    assert(out(2L).getAs[Double]("token_dup_frac") == 0.0)
    assert(out(2L).getAs[Double]("dup_bigram_frac") == 0.0)
  }

  test("source mix weights are normalized and temperature-flattened") {
    val d = (0 until 90).map(i => (i.toLong, "a b c",
      if (i < 81) "en" else "de", if (i < 81) "web" else "books", 5L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val out = CorpusStats.sourceMix(d, alpha = 0.5).collect()
    assert(out.length == 2)
    val w = out.map(r => r.getAs[String]("source") -> r.getAs[Double]("mix_weight")).toMap
    assert(math.abs(w("web") + w("books") - 1.0) < 1e-3)
    // α=0.5 flattens: 81:9 docs → 9:3 weight ratio, not 9:1
    assert(math.abs(w("web") / w("books") - 3.0) < 0.01)
  }

  test("decontam n-sweep: planted span flags at n <= span, clean above; " +
      "flag counts non-increasing in n") {
    // train doc 1 shares EXACTLY a 5-token run with the eval doc; train
    // doc 3 is clean at every n
    val evalD = Seq((10L, "s1 s2 s3 s4 s5 e6 e7 e8 e9 e10"))
      .toDF("doc_id", "text")
    val trainD = Seq(
      (1L, "t1 t2 s1 s2 s3 s4 s5 t8 t9 t10"),
      (3L, "u1 u2 u3 u4 u5 u6 u7 u8 u9 u10"))
      .toDF("doc_id", "text")
    val out = graft.operators.Decontamination
      .screenNSweep(trainD, evalD, ns = Seq(3, 4, 5, 6, 7), minHits = 1)
      .collect().map(r => r.getAs[Int]("n") -> r).toMap
    // the 5-token shared span carries 3-, 4-, and 5-grams but no 6-gram
    for (n <- Seq(3, 4, 5)) {
      assert(out(n).getAs[Long]("n_contaminated") == 1L, s"n=$n")
      assert(out(n).getAs[Double]("contaminated_rate") == 0.5)
    }
    for (n <- Seq(6, 7))
      assert(out(n).getAs[Long]("n_contaminated") == 0L, s"n=$n")
    // hits shrink with n inside the span: 3 trigrams, 2 four-grams, 1 five-gram
    assert(Seq(3, 4, 5).map(out(_).getAs[Long]("total_hits")) == Seq(3L, 2L, 1L))
    // every n scores both train docs
    assert(out.values.forall(_.getAs[Long]("n_docs_scored") == 2L))
  }

  test("mix plan: water-filling laws — caps exact, budget honored, excess redistributed") {
    // three strata: a dominant one and two small ones that α=0.5 upsamples
    // past the 2-epoch cap, forcing redistribution back to the big stratum
    val d = ((0 until 900).map(i => (i.toLong, "w " * 9 + "w", "en", "web")) ++
      (900 until 910).map(i => (i.toLong, "w " * 9 + "w", "de", "books")) ++
      (910 until 920).map(i => (i.toLong, "w " * 9 + "w", "fr", "news")))
      .map { case (id, t, l, s) => (id, t.trim, l, s, t.length.toLong) }
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val out = CorpusStats.mixPlan(d, alpha = 0.5, maxEpochs = 2,
      budgetPct = 150).collect()
    assert(out.length == 3)
    val bySrc = out.map(r => r.getAs[String]("source") -> r).toMap
    val budget = 9200L * 150 / 100
    // capped strata sit EXACTLY at maxEpochs × their tokens
    for (s <- Seq("books", "news")) {
      assert(bySrc(s).getAs[Boolean]("capped"))
      assert(bySrc(s).getAs[Long]("quota_tokens") == 2 * 100L)
      assert(bySrc(s).getAs[Double]("epochs") == 2.0)
    }
    // the uncapped stratum absorbs the redistributed excess: its quota
    // is the whole remaining budget modulo integral-division slack
    assert(!bySrc("web").getAs[Boolean]("capped"))
    val total = out.map(_.getAs[Long]("quota_tokens")).sum
    assert(total <= budget)
    assert(budget - total < out.length) // slack < one unit per stratum
    // no stratum exceeds its epoch cap
    assert(out.forall(_.getAs[Double]("epochs") <= 2.0))
    // without the cap, naive α-weights would SHORT the big stratum: its
    // water-filled quota must exceed its naive (uncapped) share
    val naive = {
      val w = out.map(r => math.pow(r.getAs[Long]("n_tokens").toDouble / 9000, 0.5))
      (budget * (w.max / w.sum)).toLong
    }
    assert(bySrc("web").getAs[Long]("quota_tokens") > naive)
  }

  test("rules ablation: unique kills separate load-bearing from redundant rules") {
    val stopful = "the cat sat on a mat and the dog is here with all of them now then"
    val d = Seq(
      (1L, stopful),                                 // clean
      (2L, "the of and"),                            // fails ONLY n_words
      (3L, stopful + " supercalifragilistic"),       // fails ONLY max_word_len
      // fails BOTH n_words and stopwords -> unique for NEITHER
      (4L, "just plain")
    ).toDF("doc_id", "text")
    val out = TextAnalysis.rulesAblation(d, minWords = 10, maxWords = 100,
        minMeanLen = 2.0, maxMeanLen = 12.0, maxWordLen = 15,
        minStopDistinct = 2, maxShortFrac = 0.5)
      .collect().map(r => r.getAs[String]("rule") -> r).toMap
    assert(out.size == 5)
    assert(out("n_words").getAs[Long]("n_fail") == 2L)        // docs 2, 4
    assert(out("n_words").getAs[Long]("n_unique_fail") == 1L) // doc 2 only
    assert(out("max_word_len").getAs[Long]("n_fail") == 1L)
    assert(out("max_word_len").getAs[Long]("n_unique_fail") == 1L)
    assert(out("stopwords").getAs[Long]("n_fail") == 1L)      // doc 4
    assert(out("stopwords").getAs[Long]("n_unique_fail") == 0L) // shared with n_words
    assert(out("mean_word_len").getAs[Long]("n_fail") == 0L)
    assert(out("n_words").getAs[Double]("fail_rate") == 0.5)
    assert(out("n_words").getAs[Double]("unique_rate") == 0.25)
  }

  test("quality rules: each rule fails on its own pathology, clean doc passes") {
    val stopful = "the cat sat on a mat and the dog is here with all of them now then"
    val d = Seq(
      (1L, stopful),                                        // clean: all rules pass
      (2L, "the of and"),                                   // too few words
      (3L, ("the of a " * 20).trim + " supercalifragilistic"), // giant word
      (4L, ("nostopwords justplain more " * 5).trim),       // no stopwords
      (5L, "a a a a a the of in is on and to for with word word word word word")
    ).toDF("doc_id", "text")
    val out = TextAnalysis.qualityRules(d, minWords = 10, maxWords = 100,
        minMeanLen = 2.0, maxMeanLen = 12.0, maxWordLen = 15,
        minStopDistinct = 2, maxShortFrac = 0.3)
      .collect().map(r => r.getAs[Long]("doc_id") -> r).toMap
    assert(out(1L).getAs[Boolean]("keep"))
    assert(out(1L).isNullAt(out(1L).fieldIndex("fail_reason")))
    assert(out(2L).getAs[String]("fail_reason") == "n_words")
    assert(out(3L).getAs[String]("fail_reason") == "max_word_len")
    assert(out(4L).getAs[String]("fail_reason") == "stopwords")
    assert(out(5L).getAs[String]("fail_reason") == "short_words")
    // the gate is a pure scan: no shuffle in the plan
    val plan = TextAnalysis.qualityRules(d).queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"))
  }

  test("lm score: seen-bigram docs score below unseen-heavy docs; ppl = e^nll") {
    val corpus = (0 until 30).map(i => (i.toLong, "a b a b a b a b"))
      .toDF("doc_id", "text")
    val lm = TextAnalysis.bigramLm(corpus, minCount = 1L)
    val probe = Seq((100L, "a b a b a b"), (101L, "x y x y x y"), (102L, "solo"))
      .toDF("doc_id", "text")
    val out = TextAnalysis.lmScore(probe, lm)
      .collect().map(r => r.getAs[Long]("doc_id") -> r).toMap
    // "a b" and "b a" both in-LM with p≈.57/.43 ⇒ low nll; x/y all unseen
    assert(out(100L).getAs[Long]("n_unseen") == 0L)
    assert(out(101L).getAs[Long]("n_unseen") == 5L)
    assert(out(100L).getAs[Double]("avg_nll") < out(101L).getAs[Double]("avg_nll"))
    assert(out(101L).getAs[Double]("avg_nll") == 9.2103) // -ln(1e-4)
    // single-token doc: no bigrams, null score
    assert(out(102L).getAs[Long]("n_bigrams") == 0L)
    assert(out(102L).isNullAt(out(102L).fieldIndex("avg_nll")))
    // perplexity is the exponential of the (rounded) mean nll
    val r = out(100L)
    assert(math.abs(r.getAs[Double]("perplexity") -
      math.exp(r.getAs[Double]("avg_nll"))) < 0.001)
  }

  test("substring dup: shared spans counted per position, self-repeats excluded") {
    val shared = "alpha beta gamma delta epsilon"
    val d = Seq(
      (1L, shared + " one two three four five"),       // 5-grams 1..6; #1 shared
      (2L, "x y z " + shared),                          // 5-grams 1..4; #4 shared
      (3L, "p q r s t u v w"),                          // nothing shared
      (4L, "a b c d")                                   // too short: no 5-grams
    ).toDF("doc_id", "text")
    val out = Dedup.substringDup(d, n = 5).collect()
      .map(r => r.getAs[Long]("doc_id") -> r).toMap
    assert(out(1L).getAs[Long]("n_grams") == 6L)
    assert(out(1L).getAs[Long]("n_dup_grams") == 1L)    // only the shared span
    assert(out(2L).getAs[Long]("n_grams") == 4L)
    assert(out(2L).getAs[Long]("n_dup_grams") == 1L)
    assert(out(2L).getAs[Double]("dup_frac") == 0.25)
    assert(out(3L).getAs[Long]("n_dup_grams") == 0L)
    assert(out(4L).getAs[Long]("n_grams") == 0L && out(4L).getAs[Double]("dup_frac") == 0.0)
    // a doc repeating ITS OWN span is not cross-doc duplicated
    val self = Seq((1L, "m n o p q m n o p q"), (2L, "u v w x y z")).toDF("doc_id", "text")
    val so = Dedup.substringDup(self, n = 5).collect()
      .map(r => r.getAs[Long]("doc_id") -> r).toMap
    assert(so(1L).getAs[Long]("n_dup_grams") == 0L)
  }

  test("substring spans: maximal cross-doc runs, exact boundaries, gaps split") {
    // minLen 10 for hand-checkable geometry; semantics identical at 30/50
    val shared = "ABCDEFGHIJKLMNOP" // 16 chars, appears in docs 1 and 2
    val rep = "REPREPREPREP"        // 12 chars, twice in doc 3 ONLY
    val s1 = "0123456789XYZ"        // 13 chars, shared by docs 4 and 5
    val s2 = "QRSTUVWXYZ!"          // 11 chars, shared by docs 4 and 5
    val d = Seq(
      (1L, "xxx" + shared + "yyyyy"),         // span at 4, len 16
      (2L, "zzzzz" + shared),                 // span at 6, len 16
      (3L, "qq" + rep + "rr" + rep + "ss"),   // self-repeat: NOT cross-doc
      (4L, s1 + "aaaa" + s2),                 // two spans, gap must split
      (5L, "bb" + s1 + "cc" + s2 + "dd"),
      (6L, "short")                           // under minLen: no windows
    ).toDF("doc_id", "text")
    val out = Dedup.substringSpans(d, minLen = 10).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).sorted.toSeq
    assert(out == Seq(
      (1L, 4L, 16L), (2L, 6L, 16L),
      (4L, 1L, 13L), (4L, 18L, 11L),
      (5L, 3L, 13L), (5L, 18L, 11L)),
      s"got $out")
  }

  test("temperature resample flattens the mix and hits ~half the corpus") {
    // 800 docs in a dominant stratum, 100 in a rare one
    val d = ((0 until 800).map(i => (i.toLong, "text here", "en", "web", 9L)) ++
      (800 until 900).map(i => (i.toLong, "text here", "de", "books", 9L)))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val kept = CorpusStats.temperatureSample(d, alpha = 0.5, salt = "t:")
    val counts = kept.groupBy("source").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val total = counts.values.sum
    assert(total > 300 && total < 600, s"expected ~450 kept, got $total")
    // input ratio 8:1; α=0.5 weights √8:1 ≈ 2.83:1 — the kept corpus must
    // sit well below the input's dominance ratio
    val ratio = counts("web").toDouble / counts("books")
    assert(ratio < 5.0, s"mix not flattened: $ratio")
    assert(ratio > 1.5) // but web is still the larger stratum
    // deterministic: rerun keeps the same documents
    val a = kept.select("doc_id").collect().map(_.getLong(0)).toSet
    val b = CorpusStats.temperatureSample(d, 0.5, "t:")
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(a == b)
  }

  test("incremental dedup: corpus match beats batch match; kept otherwise") {
    val base = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    val d = Seq(
      (0L, base),                                   // corpus
      (2L, "unrelated corpus text about streaming watermarks and state stores"),
      (1L, base),                                   // batch: dup of corpus 0
      (3L, base + " lambda"),                       // batch: near-dup of 0 (and 1)
      (5L, "fresh batch document with entirely novel token content here")
    ).toDF("doc_id", "text")
    val out = Dedup.incremental(d, col("doc_id") % 2 === 1, tau = 0.7)
      .collect().map(r => r.getAs[Long]("doc_id") -> r).toMap
    assert(out.keySet == Set(1L, 3L, 5L))
    assert(out(1L).getAs[String]("status") == "dup_of_corpus")
    assert(out(1L).getAs[Long]("match_id") == 0L)
    assert(out(3L).getAs[String]("status") == "dup_of_corpus") // corpus wins over batch 1
    assert(out(3L).getAs[Long]("match_id") == 0L)
    assert(out(3L).getAs[Long]("n_batch_matches") >= 1L)       // also matched batch doc 1
    assert(out(5L).getAs[String]("status") == "kept")
    assert(out(5L).isNullAt(out(5L).fieldIndex("match_id")))
  }

  test("char entropy: uniform string = ln(k), single-char = 0, base64-ish > prose-ish") {
    val d = Seq(
      (0L, "abcd" * 25),                         // uniform over 4 chars → ln 4
      (1L, "a" * 80),                            // degenerate → 0
      (2L, "QmFzZTY0IGJsb2JzIGxvb2sgbGlrZSB0aGlzIDRUdjhnWHk5"), // base64-ish
      (3L, "the cat sat on the mat and the cat sat again")      // prose-ish
    ).toDF("doc_id", "text")
    val out = graft.operators.TextAnalysis.charEntropy(d)
      .collect().map(r => r.getLong(0) -> r).toMap
    assert(math.abs(out(0L).getDouble(3) - math.log(4.0)) < 1e-3)
    assert(out(0L).getLong(1) == 100 && out(0L).getLong(2) == 4)
    assert(out(1L).getDouble(3) == 0.0)
    assert(out(2L).getDouble(3) > out(3L).getDouble(3))
  }

  test("tfidf cosine pairs: identical docs score 1.0, disjoint docs absent, keyed join") {
    val d = Seq(
      (0L, "alpha beta gamma delta epsilon"),
      (1L, "alpha beta gamma delta epsilon"),            // exact dup of 0
      (2L, "alpha beta gamma delta zeta"),               // near-dup of 0/1
      (3L, "totally different words entirely here")      // disjoint
    ).toDF("doc_id", "text")
    // IDF down-weights the 4 shared common tokens, so the near-dup pair
    // scores low in this tiny corpus (≈0.25) — tau=0.1 keeps it visible
    val out = Dedup.tfidfCosinePairs(d, tau = 0.1)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    assert(math.abs(out((0L, 1L)) - 1.0) < 1e-9)         // identical ⇒ cosine 1
    assert(out.contains((0L, 2L)) && out((0L, 2L)) < 1.0)
    assert(out((0L, 2L)) == out((1L, 2L)))               // symmetric by content
    assert(!out.keys.exists { case (a, b) => a == 3L || b == 3L })
    // no doc×doc cartesian; a BroadcastNestedLoop assertion would be
    // vacuous here — the one BNLJ (the one-row corpus-total broadcast,
    // same benign shape PlanAuditSpec allowlists) executes inside the
    // eager localCheckpoint, so the visible plan never contains it either
    // way. The pair join itself is the token equi-join.
    val plan = Dedup.tfidfCosinePairs(d, 0.1).queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct"))
  }

  test("stupid backoff: each arm fires and matches the hand formula") {
    // train "a b c a b c": trigram counts {"a b c":2, "b c a":1, "c a b":1}
    // (singletons pruned at minCount=2), bigrams {"a b":2,"b c":2,"c a":1},
    // unigrams a/b/c = 2 each, N = 6
    val train = Seq((0L, "a b c a b c")).toDF("doc_id", "text")
    val score = Seq((1L, "a b c"), (3L, "x b c"), (5L, "x y a"),
      (7L, "b c x"), (9L, "c a b")).toDF("doc_id", "text")
    val got = TextAnalysis.backoffLm(train, score, 2L, 0.4, 0.0001)
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5)),
          if (r.isNullAt(6)) Double.NaN else r.getDouble(6))).toMap
    // trigram hit: p = c3/c(ctx) = 2/2 = 1 -> nll 0
    assert(got(1L) == (((1L, 1L, 0L, 0L, 0L), 0.0)))
    // trigram unseen, bigram "b c" arm: p = 0.4 * 2/2; -ln(0.4) ~ 0.9163
    assert(got(3L) == (((1L, 0L, 1L, 0L, 0L), 0.9163)))
    // only unigram "a" seen -> unigram arm
    assert(got(5L)._1 == ((1L, 0L, 0L, 1L, 0L)) && got(5L)._2 > 2.0)
    // nothing seen -> alpha^2 * unseenP floor
    assert(got(7L)._1 == ((1L, 0L, 0L, 0L, 1L)))
    // trigram "c a b" SEEN once but pruned by minCount=2 -> bigram arm
    // via "a b" (the prune-falls-through-to-backoff contract)
    assert(got(9L) == (((1L, 0L, 1L, 0L, 0L), 0.9163)))
  }

  test("stupid backoff degrades to the unseen floor on an empty training corpus") {
    val train = Seq.empty[(Long, String)].toDF("doc_id", "text")
    val score = Seq((1L, "a b c")).toDF("doc_id", "text")
    val r = TextAnalysis.backoffLm(train, score, 2L, 0.4, 0.0001).collect().head
    // 1 trigram, all arms unseen — scored at alpha^2 * unseenP, no throw
    assert(r.getLong(1) == 1L && r.getLong(5) == 1L)
    assert(r.getDouble(6) > 0)
  }

  test("DSIR weights: target-vocabulary docs score positive, off-target negative") {
    // target (en) and off-target (de) halves use DISJOINT vocabularies, so
    // every en-vocab gram bucket is denser under p_target than p_raw
    // (positive per-gram contribution) and every de-vocab bucket exists
    // ONLY in p_raw (negative). Weight signs follow per doc.
    val docs = Seq(
      (1L, "alpha beta gamma alpha", "en"),
      (2L, "beta gamma alpha beta", "en"),
      (3L, "gamma alpha beta gamma", "en"),
      (4L, "zeta eta theta zeta", "de"),
      (5L, "eta theta zeta eta", "de"),
      (6L, "theta zeta eta theta", "de")).toDF("doc_id", "text", "lang")
    val out = TextAnalysis.dsirWeights(docs, col("lang") === "en")
      .collect().map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[Long]("n_grams"), r.getAs[Long]("logw_q"),
          r.getAs[Boolean]("selected"))).toMap
    // 4 tokens + 3 bigrams per doc
    out.values.foreach { case (n, _, _) => assert(n == 7L) }
    Seq(1L, 2L, 3L).foreach { id =>
      assert(out(id)._2 > 0 && out(id)._3, s"doc $id: ${out(id)}")
    }
    Seq(4L, 5L, 6L).foreach { id =>
      assert(out(id)._2 < 0 && !out(id)._3, s"doc $id: ${out(id)}")
    }
    // determinism across runs
    val again = TextAnalysis.dsirWeights(docs, col("lang") === "en")
      .collect().map(r => (r.getLong(0), r.getLong(2))).sortBy(_._1).toSeq
    assert(again == out.toSeq.map { case (k, v) => (k, v._2) }.sortBy(_._1))
  }

  test("DSIR resample: jittered weighted top-n, exact key, partition-invariant") {
    val docs = Seq(
      (1L, "alpha beta gamma alpha", "en"),
      (2L, "beta gamma alpha beta", "en"),
      (3L, "gamma alpha beta gamma", "en"),
      (4L, "zeta eta theta zeta", "de"),
      (5L, "eta theta zeta eta", "de"),
      (6L, "theta zeta eta theta", "de")).toDF("doc_id", "text", "lang")
    val n = 3
    val out = TextAnalysis.dsirResample(docs, col("lang") === "en", n)
      .collect().map(r => (r.getAs[Long]("doc_id"), r.getAs[Long]("logw_q"),
        r.getAs[Long]("key_q")))
    assert(out.length == n && out.map(_._1).distinct.length == n)
    // key_q recomputes exactly from the published construction:
    // logw_q - floor(ln((md5-bucket + 0.5)/65536) * 1e4 + 0.5)
    out.foreach { case (id, lw, key) =>
      val hex = java.security.MessageDigest.getInstance("MD5")
        .digest(s"dsir:$id".getBytes("UTF-8"))
        .map("%02x".format(_)).mkString.substring(0, 4)
      val u = (java.lang.Long.parseLong(hex, 16) + 0.5) / 65536.0
      val lnuQ = math.floor(math.log(u) * 10000.0 + 0.5).toLong
      assert(key == lw - lnuQ, s"doc $id: key $key != $lw - $lnuQ")
    }
    // the winners beat every non-selected doc's key (true top-n, not a
    // per-partition artifact): recompute all six keys and compare
    val all = TextAnalysis.dsirResample(docs, col("lang") === "en", 6)
      .collect().map(r => (r.getAs[Long]("key_q"), r.getAs[Long]("doc_id")))
      .sortBy { case (k, id) => (-k, id) }
    assert(out.map(_._1).toSeq == all.take(n).map(_._2).toSeq)
    // partition-layout invariance: the hash jitter has no RNG/row-order
    // dependence, so a repartitioned input selects the identical set
    val rep = TextAnalysis.dsirResample(docs.repartition(7), col("lang") === "en", n)
      .collect().map(r => (r.getAs[Long]("doc_id"), r.getAs[Long]("key_q")))
    assert(rep.sortBy(_._1).toSeq ==
      out.map(t => (t._1, t._3)).sortBy(_._1).toSeq)
  }

  test("gopher n-gram repetition: planted top-gram and dup-span coverage") {
    val s = spark
    import s.implicits._
    // A: "a b" x3 loop — top-2-gram coverage 3·2/6 = 1.0, overlapping
    //    4-grams push count×len coverage PAST 1 (Gopher's rule by design:
    //    "a b a b" twice = 2·4/6), but no 5-gram repeats
    // B: 40 distinct tokens — every top count is 1, all dup spans empty
    // C: 30 distinct tokens + "p q r s t" twice adjacent — the planted
    //    duplicated 5-gram covers exactly its 10 positions (union, not
    //    count×len: the two occurrences don't overlap)
    val docs = Seq(
      (1L, "a b a b a b"),
      (2L, (1 to 40).map(i => s"w$i").mkString(" ")),
      (3L, (1 to 30).map(i => s"w$i").mkString(" ") + " p q r s t p q r s t"))
      .toDF("doc_id", "text")
    val out = TextAnalysis.repetitionNgrams(docs)
      .collect().map(r => r.getAs[Long]("doc_id") -> r).toMap
    assert(out(1L).getAs[Double]("top_2gram_frac") == 1.0)
    assert(out(1L).getAs[Double]("top_4gram_frac") > 1.0) // overlap by design
    assert(out(1L).getAs[Double]("dup_5gram_frac") == 0.0)
    assert(!out(1L).getAs[Boolean]("keep"))
    assert(out(2L).getAs[Boolean]("keep"))
    assert(out(2L).getAs[Double]("dup_10gram_frac") == 0.0)
    assert(out(3L).getAs[Double]("dup_5gram_frac") == 0.25) // 10 of 40
    assert(out(3L).getAs[Double]("dup_6gram_frac") == 0.0)  // seam 6-grams unique
    assert(!out(3L).getAs[Boolean]("keep"))
  }
}
