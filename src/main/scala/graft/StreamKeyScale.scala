package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.streaming.StreamIngest

/** Many-key state-scale measurement for the transformWithState indicator
  * path (dev tooling): the reference runs a HANDFUL of symbols; the ST1/
  * ST2 scale claim ("state O(keys), RocksDB-bounded") needs a measured
  * point, not prose. Drives [[StreamIngest.pipeline]] at `nSymbols`
  * synthetic symbols (default 100k) over `nBatches` file-fed micro-batches
  * and reports, per batch: duration, state rows, and state-store bytes
  * from the query's progress metrics.
  *
  * Feed shape: every symbol ticks once per minute; each micro-batch file
  * carries `ticksPerSymbol / nBatches` consecutive ticks for EVERY symbol,
  * so batch 1 creates all nSymbols state entries and later batches
  * exercise the read-modify-write path at full key width — the worst case
  * for state-store churn (a real feed touches a subset per trigger).
  *
  * Usage: graft.StreamKeyScale [nSymbols] [ticksPerSymbol] [nBatches]
  * Prints one JSON line.
  */
object StreamKeyScale {
  def main(args: Array[String]): Unit = {
    val nSymbols = args.lift(0).map(_.toInt).getOrElse(100000)
    val ticksPerSymbol = args.lift(1).map(_.toInt).getOrElse(30)
    val nBatches = args.lift(2).map(_.toInt).getOrElse(3)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      // plan strings of lineage-kept iterative loops are exponential to
      // DESCRIBE (generateTreeString expands a DAG as a tree) — cap so the
      // driver never OOMs stringifying a plan (r16 sweep, SCALE.md)
      .config("spark.sql.maxPlanStringLength", (1 << 20).toString)
      .config(StreamIngest.rocksdbConf._1, StreamIngest.rocksdbConf._2)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    val work = SessionScoped.scratchDir("graft_keyscale")
    val perBatch = math.max(1, ticksPerSymbol / nBatches)
    // deterministic feed: symbol s ticks at minute t with a price that
    // varies by (s, t) — no randomness, so reruns are comparable
    for (b <- 0 until nBatches) {
      val lo = b * perBatch
      val hi = if (b == nBatches - 1) ticksPerSymbol else lo + perBatch
      graft.streaming.Feeder.appendFeedFile(
        spark.range(nSymbols.toLong * (hi - lo))
          .select(
            concat(lit("s"), (col("id") % nSymbols).cast("string")).as("symbol"),
            (((col("id") % nSymbols) * 31 + (expr(s"id DIV $nSymbols") + lo) * 17) % 1000)
              .cast("double").as("price"),
            ((expr(s"id DIV $nSymbols") + lo + 1) * 60000L).as("timestamp")),
        work, b)
    }

    val stream = spark.readStream
      .schema("symbol STRING, price DOUBLE, timestamp LONG")
      .option("maxFilesPerTrigger", 1)
      .parquet(s"$work/feed")
      .as[StreamIngest.TickEvent]
    val t0 = System.nanoTime()
    val q = StreamIngest.pipeline(stream)
      .writeStream
      .option("checkpointLocation", s"$work/ckpt")
      .format("parquet").option("path", s"$work/out")
      .start()
    q.processAllAvailable()
    val wall = (System.nanoTime() - t0) / 1e9
    val progress = q.recentProgress.toSeq
    q.stop()
    val outRows = spark.read.parquet(s"$work/out").count()

    def f3(v: Double): String =
      String.format(java.util.Locale.ROOT, "%.3f", Double.box(v))
    val batches = progress.filter(_.numInputRows > 0).map { p =>
      val so = p.stateOperators.headOption
      val bytes = so.map(_.memoryUsedBytes).getOrElse(-1L)
      s"""{"batch":${p.batchId},"input_rows":${p.numInputRows},""" +
        s""""duration_ms":${p.batchDuration},""" +
        s""""state_rows":${so.map(_.numRowsTotal).getOrElse(-1L)},""" +
        s""""state_bytes":$bytes}"""
    }.mkString("[", ",", "]")
    println(
      s"""{"metric":"keyscale_wall","value":${f3(wall)},"unit":"sec",""" +
        s""""n_symbols":$nSymbols,"ticks_per_symbol":$ticksPerSymbol,""" +
        s""""out_rows":$outRows,"batches":$batches}""")
    spark.stop()
  }
}
