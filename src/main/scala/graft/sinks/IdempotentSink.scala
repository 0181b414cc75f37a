package graft.sinks

import org.apache.spark.sql.{AnalysisException, DataFrame, SaveMode}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** First-write-wins keyed parquet sink — the Spark shape of the reference's
  * `INSERT … ON CONFLICT (time, symbol) DO NOTHING`
  * (trading-etl-python/src/processing/consumer.py:197-205, setup.py:87).
  *
  * Two dedup layers, matching ST4:
  *  1. within the incoming batch: keep the FIRST row per key in `orderCol`
  *     order (the reference's insert order);
  *  2. against rows already written: left-anti join on the key.
  *
  * Used from streaming as `foreachBatch { (df, _) => append(df, …) }` —
  * with checkpointed offsets this is the standard exactly-once-to-storage
  * recipe: replayed batches rewrite the same keys and are dropped by
  * layer 2. At 100 TB the target would be partitioned by a time bucket so
  * the anti-join prunes to the touched partitions instead of scanning the
  * full sink.
  */
object IdempotentSink {

  def append(batch: DataFrame, path: String, keys: Seq[String], orderCol: String): Unit = {
    val spark = batch.sparkSession
    val w = Window.partitionBy(keys.map(col): _*).orderBy(col(orderCol))
    val inBatch = batch
      .withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1)
      .drop("__rn", orderCol)
    val existingKeys =
      try Some(spark.read.parquet(path).select(keys.map(col): _*).distinct())
      catch { case _: AnalysisException => None } // first write: no sink yet
    val fresh = existingKeys match {
      case Some(e) => inBatch.join(e, keys, "left_anti")
      case None => inBatch
    }
    fresh.write.mode(SaveMode.Append).parquet(path)
  }
}
