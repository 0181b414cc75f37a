package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Multimodal

/** Real-codec contract of [[Multimodal.decodeBmp]]: javax.imageio must
  * agree with the codegen header walk on valid payloads, and corrupt
  * payloads must FLAG (decoded_ok=false), never crash the scan — the
  * quarantine semantics every media query here relies on. */
class MediaDecodeSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def docs(n: Int) =
    (0 until n).map(i => (i.toLong, s"doc $i")).toDF("doc_id", "text")

  test("imageio decode agrees with the header walk on every valid BMP") {
    val media = Multimodal.synthBmp(docs(64))
    val joined = Multimodal.parseBmp(media)
      .select(col("doc_id"), col("width"), col("height"))
      .join(Multimodal.decodeBmp(media), Seq("doc_id"))
    assert(joined.count() == 64)
    val bad = joined.filter(!col("decoded_ok") ||
      col("dec_width") =!= col("width") ||
      col("dec_height") =!= col("height")).count()
    assert(bad == 0)
  }

  test("corrupt payloads flag, never throw") {
    val media = Multimodal.synthBmp(docs(6))
    val corrupt = media.withColumn("payload",
      when(col("doc_id") === 0, expr("substring(payload, 1, 20)")) // truncated
        .when(col("doc_id") === 1, lit(Array[Byte]()))             // empty
        .when(col("doc_id") === 2,
          expr("concat(X'FFFF', substring(payload, 3))"))          // bad magic
        .otherwise(col("payload")))
    val out = Multimodal.decodeBmp(corrupt).collect()
      .map(r => r.getLong(0) -> r.getBoolean(1)).toMap
    assert(!out(0L) && !out(1L) && !out(2L))
    assert(out(3L) && out(4L) && out(5L))
  }
}
