package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{CorpusStats, TextAnalysis}

/** Invariants for the blocklist gate and the data-card manifest that the
  * oracle gate can't express: planted-hit keep rules, the zero-hit
  * fast path, share normalization, and planted exact-duplicate counting. */
class BlocklistCardSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  test("blocklist: any hit drops at maxFrac=0, threshold mode keeps low-rate docs") {
    val d = Seq(
      (1L, "good text only here"),
      (2L, "one bad word here"),
      (3L, "bad bad bad"),
      (4L, "bad among twenty tolerable tokens one two three four five six"))
      .toDF("doc_id", "text")
    val strict = TextAnalysis.blocklist(d, Seq("bad"))
      .collect().map(r => r.getAs[Long]("doc_id") -> r).toMap
    assert(strict(1L).getAs[Boolean]("keep"))
    assert(!strict(2L).getAs[Boolean]("keep"))
    assert(strict(2L).getAs[Long]("n_blocked") == 1L)
    assert(strict(3L).getAs[Long]("n_blocked") == 3L)
    assert(strict(3L).getAs[Double]("blocked_frac") == 1.0)
    // threshold mode: doc 4 is 1/11 blocked = 0.0909 <= 0.1 → kept
    val loose = TextAnalysis.blocklist(d, Seq("bad"), maxFrac = 0.1)
      .collect().map(r => r.getAs[Long]("doc_id") -> r).toMap
    assert(loose(4L).getAs[Boolean]("keep"))
    assert(!loose(3L).getAs[Boolean]("keep"))
    // the gate is a pure scan: no shuffle in the plan
    val plan = TextAnalysis.blocklist(d, Seq("bad"))
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"))
  }

  test("blocklist: keep decided on exact counts, not the 4dp-rounded frac") {
    // 25,000 tokens with ONE hit: blocked_frac rounds to 0.0000 but the
    // any-hit contract at maxFrac=0 must still DROP the doc (ADVICE r16)
    val long = (Seq.fill(24999)("ok") :+ "bad").mkString(" ")
    val d = Seq((1L, long), (2L, Seq.fill(100)("ok").mkString(" ")))
      .toDF("doc_id", "text")
    val out = TextAnalysis.blocklist(d, Seq("bad"))
      .collect().map(r => r.getAs[Long]("doc_id") -> r).toMap
    assert(out(1L).getAs[Double]("blocked_frac") == 0.0) // report rounds away
    assert(!out(1L).getAs[Boolean]("keep"))              // gate does not
    assert(out(1L).getAs[Long]("n_blocked") == 1L)
    assert(out(2L).getAs[Boolean]("keep"))
    // threshold mode stays exact too: 1/25000 = 4e-5 <= 1e-4 → kept
    val loose = TextAnalysis.blocklist(d, Seq("bad"), maxFrac = 0.0001)
      .collect().map(r => r.getAs[Long]("doc_id") -> r).toMap
    assert(loose(1L).getAs[Boolean]("keep"))
  }

  test("data card: planted dups counted, shares sum to 1, quality mean bounded") {
    val d = Seq(
      (1L, "the fast data table scan", "en", "s1"),
      (2L, "the fast data table scan", "en", "s1"),   // exact dup of 1
      (3L, "a slow query plan here today", "en", "s1"),
      (4L, "der hund und der katze", "de", "s2"),
      (5L, "der hund und der katze heute", "de", "s2"))
      .toDF("doc_id", "text", "lang", "source")
      .withColumn("n_chars", length(col("text")))
    val out = CorpusStats.dataCard(d)
      .collect().map(r => (r.getAs[String]("source"), r.getAs[String]("lang")) -> r)
      .toMap
    val en = out(("s1", "en"))
    assert(en.getAs[Long]("n_docs") == 3L)
    assert(en.getAs[Long]("n_exact_dups") == 1L)
    assert(en.getAs[Double]("dup_frac") == 0.3333)
    val de = out(("s2", "de"))
    assert(de.getAs[Long]("n_exact_dups") == 0L)
    // shares normalize over the whole corpus
    val shares = out.values.map(_.getAs[Double]("share_pct")).sum
    assert(math.abs(shares - 1.0) < 0.001)
    // quality mean is a mean of per-doc scores in [0, 1]
    out.values.foreach { r =>
      val q = r.getAs[Double]("mean_quality")
      assert(q >= 0.0 && q <= 1.0)
    }
    // token accounting matches the raw corpus
    assert(out.values.map(_.getAs[Long]("n_tokens")).sum ==
      d.select(sum(size(split(col("text"), " ")))).head.getLong(0))
  }
}
