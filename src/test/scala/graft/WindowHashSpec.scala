package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.WindowHash
import graft.operators.TextAnalysis

/** The byte-slice window-hash expression is a PLAN-level change only: its
  * values must equal the composed `hash60(substr(text, p, minLen))` on
  * every input shape — ASCII, multi-byte UTF-8 (where byte offsets and
  * char offsets diverge), and the short-string edge cases. */
class WindowHashSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def composed(text: String, minLen: Int): Seq[Long] = {
    val df = Seq(text).toDF("text")
    df.select(explode(sequence(lit(1), length(col("text")) - lit(minLen - 1)))
        .as("p"), col("text"))
      .select(TextAnalysis.hash60(col("text").substr(col("p"), lit(minLen)))
        .as("h"))
      .collect().map(_.getLong(0)).toSeq
  }

  private def viaExpr(text: String, minLen: Int): Seq[Long] =
    Seq(text).toDF("text")
      .select(WindowHash.windowHashes(col("text"), minLen).as("hs"))
      .collect().head.getSeq[Long](0)

  test("equals the composed form on ASCII") {
    val t = "the quick brown fox jumps over the lazy dog 0123456789"
    for (n <- Seq(1, 5, 13)) {
      assert(viaExpr(t, n) == composed(t, n), s"minLen=$n diverged")
    }
  }

  test("equals the composed form on multi-byte UTF-8") {
    // 2- and 3-byte codepoints interleaved with ASCII: byte offsets and
    // char offsets diverge from position 1 on
    val t = "añB€cДd éfg€hиj kñ€"
    for (n <- Seq(1, 3, 7)) {
      assert(viaExpr(t, n) == composed(t, n), s"minLen=$n diverged")
    }
  }

  test("short-string edges: empty below minLen, singleton at minLen") {
    assert(viaExpr("abcd", 5).isEmpty)
    assert(viaExpr("abcde", 5).size == 1)
    assert(viaExpr("abcde", 5) == composed("abcde", 5))
  }

  test("codegen path produces the same array as eval") {
    // CODEGEN_ONLY would fail the whole stage if doGenCode were broken;
    // here it suffices that a wholestage-codegen'd projection matches the
    // driver-side eval over a frame large enough to actually codegen
    val df = spark.range(200)
      .select(concat(lit("row"), col("id").cast("string"),
        lit(" payload текст with ümlauts and € signs")).as("text"))
    val a = df.select(WindowHash.windowHashes(col("text"), 8).as("hs"))
      .collect().map(_.getSeq[Long](0))
    val b = df.collect().map(r =>
      WindowHash.hashes(
        org.apache.spark.unsafe.types.UTF8String.fromString(r.getString(0)), 8)
        .toSeq)
    assert(a.map(_.toSeq).toSeq == b.toSeq)
  }
}
