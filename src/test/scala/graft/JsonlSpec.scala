package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.sources.{Jsonl, TextIngest}

/** JSONL interchange: byte-exact round trip (including JSON-hostile text),
  * strict-mode failure on corruption, and the intake handoff — the same
  * corrupt shard that fails the strict re-import is quarantined line-wise
  * by TextIngest.readJsonl. */
class JsonlSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  // text rows chosen to stress JSON escaping: quotes, backslashes,
  // newlines, tabs, unicode (incl. astral plane), and empty string
  private val rows = Seq(
    (1L, """plain ascii words""", "en"),
    (2L, "he said \"quoted\" and used a back\\slash", "en"),
    (3L, "line one\nline two\ttabbed", "en"),
    (4L, "unicode: café 漢字 emoji 😀", "ja"),
    (5L, "", "und"))

  test("write → read round trip is lossless for every byte of text") {
    val df = rows.toDF("doc_id", "text", "lang")
    val dir = SessionScoped.scratchDir("graft_jsonl_spec") + "/t"
    Jsonl.write(df, dir)
    val back = Jsonl.read(spark, dir, df.schema)
    // names and types survive; nullability intentionally not compared (a
    // json read is always nullable — toDF's primitive cols are not)
    assert(back.dtypes.sameElements(df.dtypes))
    val got = back.collect().map(r => (r.getLong(0), r.getString(1), r.getString(2))).toSet
    assert(got == rows.toSet)
    // files are gzip shards (the interchange default)
    val fs = new org.apache.hadoop.fs.Path(dir)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val names = fs.listStatus(new org.apache.hadoop.fs.Path(dir))
      .map(_.getPath.getName).filter(_.startsWith("part-"))
    assert(names.nonEmpty && names.forall(_.endsWith(".json.gz")))
  }

  test("strict read fails loudly on a corrupt line; permissive quarantines it") {
    val dir = SessionScoped.scratchDir("graft_jsonl_spec") + "/c"
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(dir))
    java.nio.file.Files.write(java.nio.file.Paths.get(dir, "part-0.json"),
      ("""{"doc_id": 1, "text": "good line", "lang": "en"}""" + "\n" +
        """{"doc_id": 2, "text": "truncated""" + "\n" +
        """{"doc_id": 3, "text": "another good line", "lang": "en"}""" + "\n")
        .getBytes("UTF-8"))
    val schema = new org.apache.spark.sql.types.StructType()
      .add("doc_id", "long").add("text", "string").add("lang", "string")
    intercept[org.apache.spark.SparkException] {
      Jsonl.read(spark, dir, schema).collect()
    }
    // intake handoff: the untrusted-read path quarantines the same line
    val perm = TextIngest.readJsonl(spark, dir, schema)
      .select(col("doc_id"), col("_corrupt_record")).collect()
    val bad = perm.filter(_.getString(1) != null)
    assert(bad.length == 1 && perm.length == 3)
    // quarantined line is carried whole for triage
    assert(bad.head.getString(1).contains("truncated"))
  }
}
