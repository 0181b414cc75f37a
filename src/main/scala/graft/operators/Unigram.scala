package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.operators.Materialize.MatOps

/** Unigram-LM tokenizer training (the SentencePiece family: Kudo 2018,
  * "Subword Regularization") — the second trainable tokenizer next to
  * [[Bpe]], here in its deterministic hard-EM form: seed a substring
  * vocabulary from the corpus, then alternate Viterbi segmentation
  * (E-step over the BEST segmentation only) with count re-estimation and
  * size-targeted pruning (M-step). Hard EM makes every step an exact
  * integer/4dp-quantized computation both engines reproduce bit-for-bit,
  * which is what lets the DuckDB oracle mirror the whole loop as
  * materialized CTE layers (the BPE precedent).
  *
  * Scale shape (the same one [[Bpe]] proved out): the ONLY corpus-sized
  * pass is the distributed word count; seeding is one aggregate over the
  * word dictionary; each EM iteration is one dictionary-sized distributed
  * Viterbi pass (vocabulary broadcast in the task closure — a tokenizer
  * vocabulary is driver-sized by definition, 32k pieces at deployment)
  * followed by a vocabulary-sized aggregate collect — the bounded-driver-
  * probe pattern, never a data-sized collect.
  *
  * Determinism contract (mirrored in the oracle):
  *  - words: whitespace tokens, 0 < length ≤ [[MaxWordLen]], bracket
  *    control chars excluded (as [[Bpe]]);
  *  - seed: all substrings of length 1..[[MaxPiece]] weighted by word
  *    count × multiplicity; vocab = ALL single chars + top `seedMulti`
  *    multi-char pieces by (weight DESC, piece ASC);
  *  - scores: lq(piece) = floor(ln(c/Σc) · 10⁴ + 0.5) as int64 — the
  *    repo's ln-at-4dp idiom (q_lm_score precedent), so Viterbi sums are
  *    exact integer arithmetic;
  *  - Viterbi: dp[j] = best over i ∈ [j−MaxPiece, j) with word[i,j) in
  *    vocab of dp[i] + lq; ties broken by SMALLEST i (longest final
  *    piece). Single-char coverage guarantees reachability;
  *  - M-step t: usage u = Σ word-count × piece uses; next vocab = all
  *    chars + top keep(t) multi-char pieces by (u DESC, piece ASC);
  *    next counts c = u + 1 (Laplace, so an unused char keeps a finite
  *    score).
  */
object Unigram {

  /** Longest seed piece (chars). */
  val MaxPiece = 4

  /** Words longer than this are excluded from training and encoding on
    * BOTH engines (bounds every Viterbi unroll, incl. the oracle's). */
  val MaxWordLen = 20

  // symbol brackets for the segmentation strings (as Bpe)
  private val L = "\u0001"
  private val R = "\u0002"

  /** The learned artifact: piece, its final-E-step usage, and its
    * quantized log-probability. */
  final case class Piece(piece: String, n_uses: Long, logp_q: Long)

  /** (word, cnt) dictionary — the only corpus-sized pass. */
  private def wordDict(docs: DataFrame): DataFrame =
    docs.select(explode(TextAnalysis.tokens(col("text"))).as("word"))
      .filter(length(col("word")) > 0 && length(col("word")) <= MaxWordLen &&
        !col("word").contains(L) && !col("word").contains(R))
      .groupBy("word").agg(count(lit(1)).as("cnt"))

  /** Seed piece weights: one distributed aggregate over the dictionary —
    * every substring of length 1..MaxPiece, weight = Σ cnt × multiplicity. */
  private def seedWeights(wd: DataFrame): DataFrame =
    wd.select(col("word"), col("cnt"),
        explode(sequence(lit(1), length(col("word")))).as("i"))
      .select(col("word"), col("cnt"),
        col("word").substr(col("i"),
          least(lit(MaxPiece), length(col("word")) - col("i") + lit(1)))
          .as("win"), col("i"))
      .select(explode(sequence(lit(1), length(col("win")))).as("l"),
        col("win"), col("cnt"))
      .select(col("win").substr(lit(1), col("l")).as("piece"), col("cnt"))
      .groupBy("piece").agg(sum(col("cnt")).as("u"))

  /** floor(ln(c / Σc) · 10⁴ + 0.5) per piece — exact int64 scores. */
  private def logq(vocab: Seq[(String, Long)]): Map[String, Long] = {
    val total = vocab.map(_._2).sum.toDouble
    vocab.map { case (p, c) =>
      p -> math.floor(math.log(c.toDouble / total) * 10000.0 + 0.5).toLong
    }.toMap
  }

  /** Exact Viterbi over one word: max Σ lq, ties → smallest split i
    * (iterating i ascending with a strict `>` keeps the first winner).
    * Reachability is guaranteed by single-char coverage; a char outside
    * the vocabulary (impossible in train/encode over the same corpus)
    * fails loudly rather than silently skipping the word. */
  private[graft] def viterbiPieces(word: String,
      lq: collection.Map[String, Long]): Seq[String] = {
    val n = word.length
    val sc = Array.fill(n + 1)(Long.MinValue)
    val back = Array.fill(n + 1)(-1)
    sc(0) = 0L
    var j = 1
    while (j <= n) {
      var i = math.max(0, j - MaxPiece)
      while (i < j) {
        if (sc(i) != Long.MinValue) {
          lq.get(word.substring(i, j)) match {
            case Some(s) =>
              val cand = sc(i) + s
              if (cand > sc(j)) { sc(j) = cand; back(j) = i }
            case None =>
          }
        }
        i += 1
      }
      j += 1
    }
    require(sc(n) != Long.MinValue,
      s"Unigram.viterbi: word '$word' not coverable — a character is " +
        "missing from the vocabulary (single-char pieces are never pruned, " +
        "so this means encode ran against a foreign corpus)")
    val out = List.newBuilder[String]
    val rev = collection.mutable.ArrayBuffer.empty[String]
    var p = n
    while (p > 0) { rev += word.substring(back(p), p); p = back(p) }
    out ++= rev.reverse
    out.result()
  }

  /** One distributed E-step: Viterbi usage counts over the dictionary.
    * The vocabulary ships as an explicit broadcast (not a task-closure
    * capture): at the deployment-scale 32k-piece vocabulary a closure
    * copy would re-serialize per task, a broadcast once per executor. */
  private def viterbiUsage(wd: DataFrame,
      lq: Map[String, Long]): Array[(String, Long)] = {
    val spark = wd.sparkSession
    import spark.implicits._
    val bc = spark.sparkContext.broadcast(lq)
    try {
      wd.select(col("word"), col("cnt")).as[(String, Long)]
        .mapPartitions { it =>
          it.flatMap { case (w, c) => viterbiPieces(w, bc.value).map(p => (p, c)) }
        }
        .toDF("piece", "cnt")
        .groupBy("piece").agg(sum(col("cnt")).as("u"))
        .collect()
        .map(r => (r.getString(0), r.getLong(1)))
    } finally bc.destroy()
  }

  /** Train: seed → `keep.size` hard-EM iterations, pruning the multi-char
    * vocabulary to keep(t) pieces each round. Returns one row per final
    * piece: (piece, n_uses, logp_q). Work shape: 1 corpus pass + 1
    * dictionary aggregate + keep.size dictionary Viterbi passes. */
  def train(docs: DataFrame, seedMulti: Int, keep: Seq[Int]): DataFrame = {
    // zero EM rounds would leave lastUsage empty and die at lastUsage(p)
    // with an opaque NoSuchElementException — fail like the other
    // misconfigurations do (empty corpus, uncoverable word): loudly
    require(keep.nonEmpty,
      "Unigram.train: keep must name at least one EM round " +
        "(each entry is that round's multi-char vocabulary size)")
    val spark = docs.sparkSession
    import spark.implicits._
    val wd = wordDict(docs).materialize
    val seed = seedWeights(wd).materialize
    val chars: Array[String] = seed.filter(length(col("piece")) === 1)
      .select("piece").collect().map(_.getString(0)).sorted
    // an empty char set means NO word survived the wordDict filters — a
    // tokenizer trained on nothing is always a configuration error
    // (wrong column, over-aggressive MaxWordLen); fail loudly rather
    // than shipping an empty vocabulary that encode would then apply
    require(chars.nonEmpty,
      "Unigram.train: no words survive the dictionary filters " +
        s"(0 < length <= $MaxWordLen, no bracket control chars) — " +
        "empty corpus or misconfigured input column")
    val seedMultiTop: Array[(String, Long)] = seed
      .filter(length(col("piece")) > 1)
      .orderBy(col("u").desc, col("piece"))
      .limit(seedMulti)
      .collect().map(r => (r.getString(0), r.getLong(1)))
    val charWeights = seed.filter(length(col("piece")) === 1)
      .collect().map(r => (r.getString(0), r.getLong(1))).toMap

    var vocab: Seq[(String, Long)] =
      chars.map(c => (c, charWeights(c))).toSeq ++ seedMultiTop
    var lastUsage: Map[String, Long] = Map.empty
    keep.foreach { k =>
      val usage = viterbiUsage(wd, logq(vocab)).toMap
      val multiKept = usage.toSeq.filter(_._1.length > 1)
        .sortBy { case (p, u) => (-u, p) }.take(k)
      lastUsage = chars.map(c => c -> usage.getOrElse(c, 0L)).toMap ++ multiKept
      vocab = chars.map(c => (c, usage.getOrElse(c, 0L) + 1L)).toSeq ++
        multiKept.map { case (p, u) => (p, u + 1L) }
    }
    val lqF = logq(vocab)
    vocab.map { case (p, _) => Piece(p, lastUsage(p), lqF(p)) }
      .toDF("piece", "n_uses", "logp_q")
  }

  /** Encode the corpus with a trained table: Viterbi-segment every
    * DISTINCT word (dictionary-sized, like [[Bpe.encode]]) and report
    * exact per-piece corpus counts — the subword-vocabulary view. */
  def encode(docs: DataFrame, trained: DataFrame): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    // explicit broadcast, not a task-closure copy: a closure re-serializes
    // the piece table per task at the deployment-scale 32k-piece vocabulary
    val bc = spark.sparkContext.broadcast(
      trained.select("piece", "logp_q").collect()
        .map(r => r.getString(0) -> r.getLong(1)).toMap)
    wordDict(docs).select(col("word"), col("cnt")).as[(String, Long)]
      .mapPartitions { it =>
        it.flatMap { case (w, c) => viterbiPieces(w, bc.value).map(p => (p, c)) }
      }
      .toDF("token", "cnt")
      .groupBy("token").agg(sum(col("cnt")).as("n"))
  }

  /** Per-word Viterbi piece counts under a trained table:
    * (word, n_pieces). Dictionary-sized output — the Unigram analogue of
    * [[Bpe.wordPieces]]. Words over [[MaxWordLen]] are excluded by the
    * dictionary contract (they are excluded from training too, so the
    * tokenizer has no defined segmentation for them). */
  def wordPieces(docs: DataFrame, trained: DataFrame): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    // broadcast for the same reason as viterbiUsage/encode: one copy per
    // executor instead of one serialized piece table per task
    val bc = spark.sparkContext.broadcast(
      trained.select("piece", "logp_q").collect()
        .map(r => r.getString(0) -> r.getLong(1)).toMap)
    wordDict(docs).select(col("word"), col("cnt")).as[(String, Long)]
      .mapPartitions { it =>
        it.map { case (w, _) => (w, viterbiPieces(w, bc.value).length.toLong) }
      }
      .toDF("word", "n_pieces")
  }

  /** Tokenizer fertility report per (source, lang) stratum for the
    * Unigram tokenizer — the same disparity signal as [[Bpe.fertility]]
    * (how many pieces a word costs, how many characters a piece buys,
    * per language/domain) computed from the Viterbi segmentation, so the
    * two trainable tokenizers can be compared on equal footing before
    * one ships. Same scale shape: dictionary-sized piece table,
    * word-keyed equi-join against one corpus explode. */
  def fertility(docs: DataFrame, trained: DataFrame): DataFrame =
    Bpe.fertilityReport(docs, wordPieces(docs, trained))
}
