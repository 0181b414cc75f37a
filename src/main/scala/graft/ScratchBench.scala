package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.operators.{Dedup, TextAnalysis}
import graft.sources.Tables

/** Temporary profiling harness (not part of the driver contract). */
object ScratchBench {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val docs = Tables.documents(spark, sfDir)

    def time(name: String)(f: => DataFrame): Unit = {
      val ts = (1 to 2).map { _ =>
        val t0 = System.nanoTime()
        f.write.format("noop").mode("overwrite").save()
        (System.nanoTime() - t0) / 1e9
      }
      println(f"$name%-28s min=${ts.min}%.2fs runs=${ts.map(t => f"$t%.2f").mkString(",")}")
    }

    time("shingleIndex")(Dedup.shingleIndex(docs))
    time("idx_selfjoin_groupby") {
      val idx = Dedup.shingleIndex(docs)
      idx.as("a").join(idx.as("b"),
          col("a.h") === col("b.h") && col("a.doc_id") < col("b.doc_id"))
        .groupBy(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
        .agg(count(lit(1)).as("inter"))
    }
    time("jaccard_new")(Dedup.jaccardPairs(docs, 0.7))
    time("simhash_sigs")(Dedup.simhash(docs))
    time("simhash_pairs_new")(Dedup.simhashPairs(docs, 10))
    time("minhash_lsh")(Dedup.minhashLshPairs(docs, 0.7))
    spark.stop()
  }
}
