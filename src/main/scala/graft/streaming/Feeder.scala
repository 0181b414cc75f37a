package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.sources.Tables

/** Test-side producer analog (SURVEY §3.1): the events table rendered as
  * Kafka-shaped (key, value) JSON tick messages — key = symbol, value =
  * `{symbol, price, timestamp, fetched_at}` (producer.py:81-89).
  *
  * Against a real broker the same frame writes with
  * `.write.format("kafka").option("kafka.acks", "1")` (producer.py:35);
  * here it feeds MemoryStream-based tests and file-source streams. */
object Feeder {

  def tickMessages(spark: SparkSession, sfDir: String): DataFrame =
    Tables.ticks(spark, sfDir).select(
      col("symbol").as("key"),
      to_json(struct(
        col("symbol"),
        col("price"),
        unix_millis(col("time")).as("timestamp"),
        unix_millis(current_timestamp()).as("fetched_at"))).as("value"))

  /** Write messages as JSON-lines text for file-based stream sources. */
  def main(args: Array[String]): Unit = {
    val Array(sfDir, outDir) = args
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    tickMessages(spark, sfDir).select(col("value")).write.mode("overwrite").text(outDir)
    spark.stop()
  }
}
