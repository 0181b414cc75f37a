package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.streaming.StreamIngest

/** ST1/ST2 at SCALE: the reference runs a handful of symbols; the scale
  * claim is "state O(keys), RocksDB-bounded, output invariant to batch
  * boundaries". This pins it at 100k symbols — the indicator pipeline fed
  * the same 2.7M-tick feed as one micro-batch and as three must emit
  * IDENTICAL rows (state round-trips through RocksDB between triggers at
  * full key width), with exactly the gate-predicted row count and exactly
  * nSymbols state entries. Math correctness vs the batch oracle is
  * q_stream_indicators' job; this suite pins the state MACHINERY at a key
  * count where per-key bugs (lost updates, cross-key bleed, eviction
  * misfires) cannot hide. */
class StreamManyKeysSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private val NSymbols = 100000
  private val Ticks = 27 // warm-up is 26 → exactly 2 emissions per symbol

  /** Deterministic feed: every symbol ticks once per minute; file b
    * carries ticks [9b, 9b+9) for EVERY symbol, so batch 1 creates all
    * 100k state entries and later batches hit read-modify-write at full
    * key width. */
  private def writeFeed(work: String): Unit = {
    for (b <- 0 until 3) {
      val lo = b * 9
      val hi = math.min(Ticks, lo + 9)
      graft.streaming.Feeder.appendFeedFile(
        spark.range(NSymbols.toLong * (hi - lo))
          .select(
            concat(lit("s"), (col("id") % NSymbols).cast("string")).as("symbol"),
            (((col("id") % NSymbols) * 31 + (expr(s"id DIV $NSymbols") + lo) * 17) % 1000)
              .cast("double").as("price"),
            ((expr(s"id DIV $NSymbols") + lo + 1) * 60000L).as("timestamp")),
        work, b)
    }
  }

  /** Run the pipeline over the feed; one trigger per file when `split`. */
  private def run(work: String, split: Boolean): (DataFrame, Long, Long) = {
    val r = spark.readStream
      .schema("symbol STRING, price DOUBLE, timestamp LONG")
    if (split) r.option("maxFilesPerTrigger", 1)
    val stream = r.parquet(s"$work/feed").as[StreamIngest.TickEvent]
    val tag = if (split) "split" else "one"
    val q = StreamIngest.pipeline(stream)
      .writeStream
      .option("checkpointLocation", s"$work/ckpt_$tag")
      .format("parquet").option("path", s"$work/out_$tag")
      .start()
    q.processAllAvailable()
    val stateRows = q.lastProgress.stateOperators.headOption
      .map(_.numRowsTotal).getOrElse(-1L)
    val nBatches = q.recentProgress.count(_.numInputRows > 0).toLong
    q.stop()
    (spark.read.parquet(s"$work/out_$tag"), stateRows, nBatches)
  }

  test("100k symbols: 3-batch output == 1-batch output; state rows == key count") {
    val work = SessionScoped.scratchDir("graft_manykeys")
    writeFeed(work)
    val (one, stateOne, nbOne) = run(work, split = false)
    val (split, stateSplit, nbSplit) = run(work, split = true)
    assert(nbOne == 1L && nbSplit == 3L,
      s"trigger plan drifted: one=$nbOne split=$nbSplit")
    // gate arithmetic: 27 ticks, warm-up 26 → emissions at ticks 26, 27
    assert(one.count() == 2L * NSymbols)
    assert(stateOne == NSymbols.toLong && stateSplit == NSymbols.toLong,
      s"state rows: one=$stateOne split=$stateSplit expected $NSymbols")
    // batch-boundary invariance, checked distributed (no 200k-row collect):
    // identical row multisets ⇒ identical count + order-independent
    // checksum over every field of every row
    def sig(df: DataFrame) = df
      .agg(count(lit(1)), sum(hash(col("seq"), col("row"))).as("h"))
      .head()
    assert(sig(one) == sig(split), "split-feed output drifted from one-shot")
  }
}
