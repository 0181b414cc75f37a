package graft

import org.apache.spark.sql.SparkSession

import graft.plans.GraftExtensions
import graft.sources.Tables

/** SQL entry point: `graft.SqlShell <sfDir> <sql>` — runs one SQL statement
  * with the engine's custom functions registered and the testdata tables +
  * derived `ticks`/`bars` views in scope, printing the result as JSON
  * lines. The `spark.sql(...)` surface of the engine. */
object SqlShell {
  def main(args: Array[String]): Unit = {
    val Array(sfDir, sql) = args.take(2)
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")}]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      // plan strings of lineage-kept iterative loops are exponential to
      // DESCRIBE (generateTreeString expands a DAG as a tree) — cap so the
      // driver never OOMs stringifying a plan (r16 sweep, SCALE.md)
      .config("spark.sql.maxPlanStringLength", (1 << 20).toString)
      .config("spark.ui.enabled", "false")
      .withExtensions(new GraftExtensions)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    GraftExtensions.register(spark) // cover a pre-existing session too
    Seq("region", "nation", "customer", "supplier", "part", "orders",
      "lineitem", "documents", "embeddings").foreach { t =>
      try Tables.table(spark, sfDir, t).createOrReplaceTempView(t)
      catch { case _: Throwable => () }
    }
    Tables.events(spark, sfDir).createOrReplaceTempView("events")
    Tables.ticks(spark, sfDir).createOrReplaceTempView("ticks")
    Tables.bars(spark, sfDir).createOrReplaceTempView("bars")
    spark.sql(sql).toJSON.collect().foreach(println)
    spark.stop()
  }
}
