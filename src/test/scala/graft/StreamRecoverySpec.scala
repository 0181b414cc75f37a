package graft

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import org.scalatest.funsuite.AnyFunSuite

import graft.streaming.StreamIngest

/** Checkpoint crash-recovery proof for the streaming pipeline (ST1
  * durability): stop the query mid-stream, restart it from the same
  * checkpoint, and require the emitted rows to equal an uninterrupted
  * run's — no loss, no duplicate, bit-identical indicator values.
  *
  * This is the claim `StreamIngest` makes over the reference consumer
  * (whose state dies with the process, consumer.py:33): here BOTH state
  * stores — the watermark replay-dedup state and the RocksDB indicator
  * frames — must come back from the checkpoint, because the post-restart
  * emissions are computed over 60-bar frames built almost entirely from
  * pre-restart ticks.
  *
  * Harness: file source (replayable offsets — MemoryStream cannot restart)
  * → `fromRaw` → parquet file sink (transactional commit log), which is
  * Structured Streaming's end-to-end exactly-once configuration.
  */
class StreamRecoverySpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def tickJson(symbol: String, price: Double, tsMs: Long): String =
    s"""{"symbol": "$symbol", "price": $price, "timestamp": $tsMs}"""

  private def price(i: Int): Double = 150.0 + 7 * math.sin(i * 0.8) + (i % 5)

  private def tick(i: Int): String =
    tickJson("AAPL", price(i), 1700000000000L + i * 5000L)

  /** Run `fromRaw` over text files in `in`, writing parquet to `out` with
    * checkpoint `ckpt`; AvailableNow processes exactly the data present
    * and then stops (a clean shutdown — the restart then has to resume
    * from the committed offsets + state). */
  private def runOnce(in: String, out: String, ckpt: String): Unit = {
    val q = StreamIngest.fromRaw(spark.readStream.text(in).select(col("value")))
      .writeStream.format("parquet")
      .option("path", out).option("checkpointLocation", ckpt)
      .outputMode("append").trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()
  }

  private def emitted(out: String): Seq[(Long, Long, Double, Double)] =
    spark.read.parquet(out)
      .select(col("seq"), col("row.time").cast("long").as("t"),
        col("row.close"), col("row.ema_20"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getDouble(3)))
      .sortBy(_._1).toSeq

  test("restart from checkpoint: no lost, no duplicate, bit-identical emissions") {
    val root = graft.SessionScoped.scratchDir("graft_recovery")
    def dir(name: String): String = {
      Files.createDirectories(Paths.get(root, name)); s"$root/$name"
    }

    // ---- uninterrupted control run: all 80 ticks in one go
    val all = (0 until 80).map(tick)
    Files.write(Paths.get(dir("in_full"), "all.json"),
      all.mkString("\n").getBytes)
    runOnce(s"$root/in_full", dir("out_full"), dir("ckpt_full"))
    val expected = emitted(s"$root/out_full")
    assert(expected.length == 80 - 25, "warm-up gate: emissions start at row 26")

    // ---- interrupted run: first 45 ticks, process, STOP
    Files.write(Paths.get(dir("in_part"), "part1.json"),
      all.take(45).mkString("\n").getBytes)
    runOnce(s"$root/in_part", dir("out_part"), dir("ckpt_part"))
    assert(emitted(s"$root/out_part").length == 45 - 25,
      "first segment must emit exactly its gated rows")

    // ---- restart: remaining 35 ticks PLUS replays of 5 pre-restart ticks.
    // The replays are inside the watermark, so the RESTORED dedup state
    // must swallow them; the 35 new ticks' indicators read 60-bar frames
    // whose older rows only exist in the RESTORED RocksDB state.
    Files.write(Paths.get(dir("in_part"), "part2.json"),
      (all.slice(40, 45) ++ all.drop(45)).mkString("\n").getBytes)
    runOnce(s"$root/in_part", s"$root/out_part", s"$root/ckpt_part")

    assert(emitted(s"$root/out_part") == expected,
      "split-and-restart emissions must equal the uninterrupted run")
  }
}
