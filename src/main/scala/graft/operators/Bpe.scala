package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.operators.Materialize.MatOps

/** Byte-pair-encoding merge training — tokenizer learning, the one
  * training-data-pipeline stage between curation and packing: learn the
  * `iters` highest-count symbol merges from the corpus (Sennrich et al.
  * 2016, "Neural Machine Translation of Rare Words with Subword Units").
  *
  * Scale shape (what makes this a Spark job at 100 TB): BPE trains on
  * the WORD-FREQUENCY DICTIONARY, not the raw corpus — the only
  * corpus-sized pass is one distributed word count; every merge
  * iteration then runs on the vocabulary-sized dict. The per-iteration
  * best-pair fetch is a one-row driver read of an aggregate over that
  * tiny dict — the same bounded-scalar pattern as the PageRank/CC
  * convergence probes, not a data collect.
  *
  * Determinism contract (mirrored in the DuckDB oracle):
  *  - symbol sequences are encoded as \u0001 sym \u0002 bracketed strings,
  *    so the greedy leftmost-non-overlapping merge is a plain string
  *    `replace` with IDENTICAL semantics in both engines: brackets make
  *    "a b a b" merge to "[ab][ab]" (consecutive pairs both merge) and
  *    "a a a" to "[aa][a]" (overlap resolved leftmost), exactly like
  *    the reference token-list fold;
  *  - best pair per iteration by (count DESC, left ASC, right ASC);
  *  - counts are exact integer sums of word frequencies.
  */
object Bpe {

  // symbol brackets: control chars that cannot occur in corpus text
  // (written as escapes so the source stays clean text for git/grep)
  private val L = "\u0001"
  private val R = "\u0002"

  private def bracketed(word: Column): Column =
    concat_ws("", transform(
      sequence(lit(1), length(word)),
      i => concat(lit(L), word.substr(i, lit(1)), lit(R))))

  private def symbols(seq: Column): Column =
    regexp_extract_all(seq, lit(s"$L([^$R]+)$R"), lit(1))

  private def wordDict(docs: DataFrame): DataFrame =
    docs.select(explode(TextAnalysis.tokens(col("text"))).as("word"))
      .filter(length(col("word")) > 0)
      .groupBy("word").agg(count(lit(1)).as("cnt"))
      .withColumn("seq", bracketed(col("word")))

  private def mergeSeq(seq: Column, a: String, b: String): Column =
    call_function("replace", seq, lit(L + a + R + L + b + R), lit(L + a + b + R))

  /** Learned merge table: (iter 1.., left_sym, right_sym, merged,
    * pair_count) — up to `iters` rows, the artifact a tokenizer ships.
    * Stops early (returning the merges learned so far) if the dictionary
    * runs out of mergeable pairs — a tiny corpus can reduce every word
    * to a single symbol before `iters` is reached. */
  def trainMerges(docs: DataFrame, iters: Int): DataFrame = {
    require(iters >= 1, "iters must be >= 1")
    val spark = docs.sparkSession
    import spark.implicits._
    var dict = wordDict(docs).select("cnt", "seq").materialize
    val rows = Seq.newBuilder[(Long, String, String, String, Long)]
    var it = 1
    var exhausted = false
    while (it <= iters && !exhausted) {
      val best = dict
        .withColumn("syms", symbols(col("seq")))
        .select(col("cnt"), explode(expr(
          // the size<2 guard matters: sequence(1, 0) is DESCENDING in
          // Spark, so a single-symbol word would index syms[2] (ANSI
          // error) instead of producing no pairs
          """CASE WHEN size(syms) < 2 THEN array()
            |ELSE transform(sequence(1, size(syms) - 1),
            |  i -> struct(element_at(syms, CAST(i AS INT)) AS l,
            |              element_at(syms, CAST(i + 1 AS INT)) AS r)) END""".stripMargin))
          .as("p"))
        .groupBy(col("p.l").as("left_sym"), col("p.r").as("right_sym"))
        .agg(sum(col("cnt")).as("pair_count"))
        .orderBy(col("pair_count").desc, col("left_sym"), col("right_sym"))
        .take(1).headOption
      best match {
        case None => exhausted = true // every word is one symbol
        case Some(row) =>
          val (a, b, pc) = (row.getString(0), row.getString(1), row.getLong(2))
          dict = dict.withColumn("seq", mergeSeq(col("seq"), a, b))
            .materialize // vocabulary-sized; truncates the iterative lineage
          rows += ((it.toLong, a, b, a + b, pc))
          it += 1
      }
    }
    rows.result().toDF("iter", "left_sym", "right_sym", "merged", "pair_count")
  }

  /** How many chained `replace` merges [[encode]] stacks into one plan
    * before forcing a materialization. Without the cadence, a real 32k-
    * merge vocabulary would nest 32k replace calls into ONE expression
    * tree and die in analysis/codegen long before any data moves; with
    * it, plan depth is bounded by the constant while the dictionary
    * (vocabulary-sized, not corpus-sized) is re-materialized every
    * `EncodeMaterializeEvery` merges — the same boundary trainMerges
    * already places every iteration. Pinned in BpeSpec. */
  val EncodeMaterializeEvery = 16

  /** Tokenize with a learned merge table: apply the merges in training
    * order to each DISTINCT word (dictionary-sized work, like training),
    * then report exact per-token corpus counts — the "how would the
    * corpus tokenize" view, and the subword-vocabulary artifact. */
  def encode(docs: DataFrame, merges: DataFrame): DataFrame = {
    val ms = merges.orderBy("iter").collect() // merge-table rows: tiny
    val applied = ms.zipWithIndex.foldLeft(wordDict(docs)) {
      case (d, (m, i)) =>
        val next = d.withColumn("seq",
          mergeSeq(col("seq"), m.getString(1), m.getString(2)))
        if ((i + 1) % EncodeMaterializeEvery == 0 && i + 1 < ms.length)
          next.materialize
        else next
    }
    applied
      .withColumn("token", explode(symbols(col("seq"))))
      .groupBy("token").agg(sum(col("cnt")).as("n"))
  }
}
