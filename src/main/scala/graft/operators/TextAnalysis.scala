package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Text-analysis operators for the large-scale training-data pipeline:
  * language ID, quality scoring, token counting, fingerprinting.
  *
  * Everything is pure Column expressions (whole-stage codegen; no UDFs):
  * at 100 TB these are embarrassingly parallel scans whose cost is the
  * parquet read, so the only design rule that matters is "stay in codegen
  * and never shuffle", which all of these satisfy.
  *
  * Determinism note: all hashes derive from md5 (stable across engines);
  * the 60-bit variant keeps integer arithmetic inside int64 for oracle
  * parity (DuckDB errors on int64 overflow; Spark wraps silently).
  */
object TextAnalysis {

  /** Deterministic language-marker stopwords per language — the n-gram/
    * stopword heuristic table for langId. Tiny fixed tables like this are
    * broadcast-free literals in the plan. */
  val Stopwords: Seq[String] =
    Seq("the", "a", "of", "to", "in", "and", "is", "on", "for", "with")

  /** Whitespace tokens (documents are single-space separated). */
  def tokens(text: Column): Column = split(text, " ")

  /** Stable 60-bit non-negative hash: first 15 hex digits of md5.
    * Mirrors DuckDB `CAST('0x' || substr(md5(x),1,15) AS BIGINT)`. */
  def hash60(c: Column): Column = conv(substring(md5(c), 1, 15), 16, 10).cast("long")

  /** Word n-gram shingles (default 3) as space-joined strings; empty array
    * when the document has fewer than n tokens. */
  def shingles(text: Column, n: Int = 3): Column = shinglesFromTokens(tokens(text), n)

  /** Shingles over a pre-materialized token-array COLUMN. Callers on a hot
    * path must pass a real column (`.select(tokens(text).as("toks"))`
    * first): if `toks` is an inline `split(...)` expression, Catalyst
    * re-evaluates the split inside every lambda element access —
    * O(doc_len) per shingle instead of per document. */
  def shinglesFromTokens(toks: Column, n: Int = 3): Column = {
    // Spark's sequence(0, -1) yields a DESCENDING sequence, not empty —
    // guard short documents explicitly.
    when(size(toks) < n, array().cast("array<string>"))
      .otherwise(transform(sequence(lit(0), size(toks) - n),
        i => concat_ws(" ", (0 until n).map(k => element_at(toks, i + k + 1)): _*)))
  }

  /** Per-document stats: token counts, distinct ratio, mean token length,
    * stopword ratio, and a composite quality score in [0,1]. */
  def stats(docs: DataFrame): DataFrame = {
    val toks = tokens(col("text"))
    val nTok = size(toks)
    val nDistinct = size(array_distinct(toks))
    val meanLen = (length(col("text")) - (nTok - 1)).cast("double") / nTok
    val stopArr = array(Stopwords.map(lit): _*)
    val nStop = size(filter(toks, t => array_contains(stopArr, t)))
    val stopRatio = nStop.cast("double") / nTok
    val distinctRatio = nDistinct.cast("double") / nTok
    // quality: long enough, lexically diverse, some-but-not-all stopwords
    val lenScore = least(nTok.cast("double") / lit(50.0), lit(1.0))
    val score = lit(0.4) * lenScore + lit(0.4) * distinctRatio +
      lit(0.2) * (lit(1.0) - abs(stopRatio - lit(0.1)))
    docs.select(
      col("doc_id"), nTok.as("n_tokens"), nDistinct.as("n_distinct"),
      meanLen.as("mean_token_len"), stopRatio.as("stopword_ratio"),
      distinctRatio.as("distinct_ratio"), score.as("quality_score"))
  }

  /** Token counting three ways: whitespace, alphabetic-regex, and a
    * BPE-style estimate (Σ ceil(len/4) — ~4 chars per subword token). */
  def tokenCounts(docs: DataFrame): DataFrame = {
    val toks = tokens(col("text"))
    val nWs = size(toks)
    val nAlpha = size(expr("filter(split(text, ' '), t -> t rlike '^[a-z]+$')"))
    // `/` is double division in Spark SQL — use DIV for the integer estimate
    val bpe = expr(
      "aggregate(split(text, ' '), CAST(0 AS BIGINT), (acc, t) -> acc + (length(t) + 3) DIV 4)")
    docs.select(col("doc_id"), nWs.as("n_ws_tokens"), nAlpha.as("n_alpha_tokens"),
      bpe.as("n_bpe_est"))
  }

  /** Stopword-profile language ID: English-stopword hit ratio with a
    * deterministic threshold ladder. (On synthetic data this is a plumbing
    * check; the operator shape — fixed marker table, ratio, CASE ladder —
    * is the real-world one.) */
  def langId(docs: DataFrame): DataFrame = {
    val toks = tokens(col("text"))
    val stopArr = array(Stopwords.map(lit): _*)
    val ratio = size(filter(toks, t => array_contains(stopArr, t))).cast("double") / size(toks)
    val pred = when(ratio >= 0.10, lit("en"))
      .when(ratio >= 0.05, lit("mixed"))
      .otherwise(lit("other"))
    docs.select(col("doc_id"), col("lang").as("lang_label"),
      ratio.as("en_stopword_ratio"), pred.as("lang_pred"))
  }

  /** Order-sensitive rolling document fingerprint: position-weighted sum of
    * token hashes mod 1e9+7 (plus the unordered xor-style component).
    * Pure int64 arithmetic ⇒ bit-exact across engines. */
  def fingerprint(docs: DataFrame): DataFrame = {
    val P = 1000000007L
    val toks = tokens(col("text"))
    val fp = expr(
      s"""aggregate(
         |  zip_with(split(text, ' '), sequence(1, size(split(text, ' '))),
         |           (t, i) -> (CAST(conv(substring(md5(t), 1, 15), 16, 10) AS BIGINT) % $P)
         |                     * ((i % 97) + 1)),
         |  CAST(0 AS BIGINT), (acc, x) -> (acc + x) % $P)""".stripMargin)
    docs.select(col("doc_id"), size(toks).as("n_tokens"), fp.as("fingerprint"))
  }
}
