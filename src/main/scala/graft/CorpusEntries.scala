package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.operators.{Chunking, Sampling, TextAnalysis}
import graft.sources.Tables

/** Corpus-curation operators (sampling / vocabulary / TF-IDF / PII /
  * chunking / passage dedup), each with its DuckDB oracle — the
  * document→training-example half of an LLM data pipeline, alongside the
  * dedup/similarity family in [[ExtendedEntries]]. */
object CorpusEntries {

  private def r4(e: String): String = s"floor(($e) * 10000 + 0.5) / 10000"

  /** Shared sampling parameters (query and oracle read the same values). */
  private val SampleSalt = "s1:"
  private val UniformRate = 0.125
  private val StratRates = Map("en" -> 0.25, "de" -> 0.5)
  private val StratDefault = 0.0625

  private def hex4(rate: Double): String =
    f"${math.round(rate * 65536).toInt}%04x"

  // --------------------------------------------------------------- queries

  /** Deterministic uniform + stratified-by-lang sampling flags; rows kept
    * by either sample survive. */
  private def qSampleHash(s: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(s, dir)
    val key = col("doc_id")
    val uni = Sampling.sampledBy(key, SampleSalt, UniformRate)
    val strat = Sampling.stratifiedBy(key, col("lang"), SampleSalt,
      StratRates, StratDefault)
    docs.select(col("doc_id"), col("lang"),
        Sampling.hashBucket(key, SampleSalt).as("bucket"),
        uni.as("in_uniform"), strat.as("in_stratified"))
      .filter(col("in_uniform") || col("in_stratified"))
  }

  private def qVocab(s: SparkSession, dir: String): DataFrame =
    TextAnalysis.vocab(Tables.documents(s, dir), 50)

  private def qTfidf(s: SparkSession, dir: String): DataFrame =
    TextAnalysis.tfidfTop(Tables.documents(s, dir), 3)

  /** PII scrub over text augmented with deterministic synthetic PII (the
    * synthetic corpus has no organic emails/phones; both engines build the
    * same augmented column, so the regex machinery is what's tested). */
  private def qPiiRedact(s: SparkSession, dir: String): DataFrame = {
    val aug = concat(col("text"),
      lit(" contact "), col("source"), lit("@example.com or call 555-"),
      lpad(pmod(col("doc_id"), lit(10000)).cast("string"), 4, "0"))
    TextAnalysis.piiRedact(
      Tables.documents(s, dir).withColumn("aug", aug), "aug")
  }

  private def qChunks(s: SparkSession, dir: String): DataFrame =
    Chunking.chunk(Tables.documents(s, dir), chunkSize = 40, stride = 30)

  private def qPassageDedup(s: SparkSession, dir: String): DataFrame =
    Chunking.passageDedup(
      Chunking.chunk(Tables.documents(s, dir), chunkSize = 40, stride = 30))

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_sample_hash" -> qSampleHash,
    "q_vocab" -> qVocab,
    "q_tfidf" -> qTfidf,
    "q_pii_redact" -> qPiiRedact,
    "q_chunks" -> qChunks,
    "q_passage_dedup" -> qPassageDedup)

  // ---------------------------------------------------------------- oracle

  /** Chunk CTE shared by q_chunks and q_passage_dedup (mirrors
    * Chunking.chunk at size 40 / stride 30). */
  private val oChunks: String =
    """tk AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
      |st AS (
      |  SELECT doc_id, toks, unnest(range(1, len(toks) + 1, 30)) AS start
      |  FROM tk
      |),
      |ch AS (
      |  SELECT doc_id,
      |    CAST((start - 1) // 30 AS BIGINT) AS chunk_id,
      |    CAST(start AS BIGINT) AS start_token,
      |    toks[start:least(start + 39, len(toks))] AS ctoks
      |  FROM st
      |),
      |chunks AS (
      |  SELECT doc_id, chunk_id, start_token,
      |    CAST(len(ctoks) AS BIGINT) AS n_chunk_tokens,
      |    md5(array_to_string(ctoks, ' ')) AS chunk_md5
      |  FROM ch
      |)""".stripMargin

  def oracleSql: Map[String, String] = Map(
    "q_sample_hash" ->
      s"""WITH b AS (
         |  SELECT doc_id, lang,
         |    substr(md5(concat('$SampleSalt', CAST(doc_id AS VARCHAR))), 1, 4)
         |      AS bh
         |  FROM documents
         |)
         |SELECT doc_id, lang,
         |  CAST(concat('0x', bh) AS BIGINT) AS bucket,
         |  bh < '${hex4(UniformRate)}' AS in_uniform,
         |  bh < (CASE lang WHEN 'en' THEN '${hex4(StratRates("en"))}'
         |                  WHEN 'de' THEN '${hex4(StratRates("de"))}'
         |                  ELSE '${hex4(StratDefault)}' END) AS in_stratified
         |FROM b
         |WHERE bh < '${hex4(UniformRate)}'
         |   OR bh < (CASE lang WHEN 'en' THEN '${hex4(StratRates("en"))}'
         |                      WHEN 'de' THEN '${hex4(StratRates("de"))}'
         |                      ELSE '${hex4(StratDefault)}' END)""".stripMargin,

    "q_vocab" ->
      """WITH tok AS (
        |  SELECT doc_id, unnest(string_split(text, ' ')) AS token FROM documents
        |), g AS (
        |  SELECT token, count(*) AS freq, count(DISTINCT doc_id) AS df
        |  FROM tok GROUP BY token
        |), rk AS (
        |  SELECT token, freq, df,
        |    CAST(row_number() OVER (ORDER BY freq DESC, token) AS INTEGER) AS rk
        |  FROM g
        |)
        |SELECT token, freq, df, rk FROM rk WHERE rk <= 50""".stripMargin,

    "q_tfidf" ->
      s"""WITH tok AS (
         |  SELECT doc_id, unnest(string_split(text, ' ')) AS token FROM documents
         |), tf AS (
         |  SELECT doc_id, token, count(*) AS tf FROM tok GROUP BY 1, 2
         |), dfreq AS (
         |  SELECT token, count(*) AS df FROM tf GROUP BY token
         |), n AS (SELECT count(*) AS n_docs FROM documents),
         |s AS (
         |  SELECT tf.doc_id, tf.token, tf.tf, dfreq.df,
         |    ${r4("tf.tf * ln(CAST(n.n_docs AS DOUBLE) / dfreq.df)")} AS tfidf
         |  FROM tf JOIN dfreq ON tf.token = dfreq.token, n
         |), rk AS (
         |  SELECT doc_id, token, tf, df, tfidf,
         |    CAST(row_number() OVER (PARTITION BY doc_id
         |      ORDER BY tfidf DESC, token) AS INTEGER) AS rk
         |  FROM s
         |)
         |SELECT doc_id, rk, token, tf, df, tfidf FROM rk WHERE rk <= 3""".stripMargin,

    "q_pii_redact" ->
      s"""WITH a AS (
         |  SELECT doc_id,
         |    concat(text, ' contact ', source, '@example.com or call 555-',
         |      lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0')) AS aug
         |  FROM documents
         |)
         |SELECT doc_id,
         |  CAST(len(regexp_extract_all(aug, '${TextAnalysis.EmailRe}')) AS BIGINT)
         |    AS n_emails,
         |  CAST(len(regexp_extract_all(aug, '${TextAnalysis.PhoneRe}')) AS BIGINT)
         |    AS n_phones,
         |  regexp_replace(regexp_replace(aug, '${TextAnalysis.EmailRe}',
         |    '[EMAIL]', 'g'), '${TextAnalysis.PhoneRe}', '[PHONE]', 'g') AS redacted
         |FROM a""".stripMargin,

    "q_chunks" ->
      s"""WITH $oChunks
         |SELECT doc_id, chunk_id, start_token, n_chunk_tokens, chunk_md5
         |FROM chunks""".stripMargin,

    "q_passage_dedup" ->
      s"""WITH $oChunks
         |SELECT doc_id, chunk_id, chunk_md5,
         |  first_value(doc_id) OVER w AS canonical_doc_id,
         |  first_value(chunk_id) OVER w AS canonical_chunk_id,
         |  (doc_id != first_value(doc_id) OVER w
         |   OR chunk_id != first_value(chunk_id) OVER w) AS is_duplicate
         |FROM chunks
         |WINDOW w AS (PARTITION BY chunk_md5 ORDER BY doc_id, chunk_id
         |             ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)""".stripMargin)
}
