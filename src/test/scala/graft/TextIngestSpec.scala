package graft

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

import graft.sources.TextIngest

/** Batch ingestion contract: per-line quarantine (the reference's
  * log-and-continue on malformed messages, consumer.py:184-186) and the
  * partition-pruning output layout. */
class TextIngestSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private val schema = StructType(Seq(
    StructField("doc_id", LongType),
    StructField("text", StringType),
    StructField("lang", StringType)))

  private def tmp(name: String): String = {
    val p = Paths.get("target", "tmp", "ingest", name)
    Files.createDirectories(p.getParent)
    p.toString
  }

  test("JSONL: malformed lines quarantine whole; clean rows parse typed") {
    val f = tmp("docs.jsonl")
    Files.write(Paths.get(f), java.util.Arrays.asList(
      """{"doc_id": 1, "text": "hello world", "lang": "en"}""",
      """{"doc_id": 2, "text": "guten tag", "lang": "de"}""",
      """{"doc_id": 3, "text": "broken""",               // truncated JSON
      """not json at all"""))
    val (clean, bad) = TextIngest.quarantine(
      TextIngest.readJsonl(spark, f, schema))
    val rows = clean.orderBy("doc_id").collect()
    assert(rows.map(_.getAs[Long]("doc_id")).toSeq == Seq(1L, 2L))
    assert(rows.head.getAs[String]("text") == "hello world")
    val raw = bad.select("raw").as[String].collect().toSet
    assert(raw == Set("""{"doc_id": 3, "text": "broken""", "not json at all"))
  }

  test("CSV: wrong-arity lines quarantine; header respected") {
    val f = tmp("docs.csv")
    Files.write(Paths.get(f), java.util.Arrays.asList(
      "doc_id,text,lang",
      "1,hello world,en",
      "2,too,many,columns,here",
      "3,guten tag,de"))
    val (clean, bad) = TextIngest.quarantine(
      TextIngest.readCsv(spark, f, schema))
    assert(clean.orderBy("doc_id").collect().map(_.getAs[Long]("doc_id")).toSeq
      == Seq(1L, 3L))
    assert(bad.select("raw").as[String].collect().toSeq
      == Seq("2,too,many,columns,here"))
  }

  test("partitioned writer: directory layout prunes partitions on read") {
    val docs = Seq(
      (1L, "a", "en"), (2L, "b", "en"), (3L, "c", "de"), (4L, "d", "fr"))
      .toDF("doc_id", "text", "lang")
    val out = tmp("curated")
    TextIngest.writePartitioned(docs, out, Seq("lang"), Seq("doc_id"))
    val back = spark.read.parquet(out).filter(col("lang") === "en")
    assert(back.count() == 2)
    // partition pruning: the scan carries the lang predicate as a partition filter
    val scan = back.queryExecution.executedPlan.collectLeaves().head.toString
    assert(scan.contains("PartitionFilters") && scan.contains("lang"))
    // bounded fan-out: a single-row partition value still writes one file
    // (salted repartition caps files per value at filesPerPartition)
    val deFiles = Files.list(Paths.get(out, "lang=de")).toArray
      .map(_.toString).filter(_.endsWith(".parquet"))
    assert(deFiles.length == 1)
  }

  test("ORC layout round-trips with the same partition pruning") {
    val docs = Seq((1L, "a", "en"), (2L, "b", "de")).toDF("doc_id", "text", "lang")
    val out = tmp("curated_orc")
    TextIngest.writePartitioned(docs, out, Seq("lang"), Seq("doc_id"),
      format = "orc")
    val back = spark.read.orc(out).filter(col("lang") === "de")
    assert(back.collect().map(_.getAs[Long]("doc_id")).toSeq == Seq(2L))
    val scan = back.queryExecution.executedPlan.collectLeaves().head.toString
    assert(scan.contains("PartitionFilters") && scan.contains("lang"))
  }
}
