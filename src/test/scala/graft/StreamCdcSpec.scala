package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Cdc
import graft.streaming.StreamCdc

/** Streaming CDC merge: sliced micro-batches through the real
  * foreachBatch machinery must equal the one-shot batch apply, the
  * generational state must make replays idempotent, and GC must bound
  * the generation count. */
class StreamCdcSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def canon(df: DataFrame): Seq[Seq[Any]] =
    df.select("k", "seq", "ts", "payload").collect()
      .map(_.toSeq).sortBy(_.toString()).toSeq

  /** 60 ts-ordered changes over 8 keys, deletes sprinkled in. */
  private val changes = (1 to 60).map { i =>
    (i.toLong % 8, i.toLong, i.toLong, s"p$i", if (i % 7 == 0) "D" else "U")
  }
  private val base = (0L to 9L).map(k => (k, -1L, -1L, s"base$k"))

  private def runStream(work: String, slices: Int): Unit = {
    val fs = new org.apache.hadoop.fs.Path(work)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.mkdirs(new org.apache.hadoop.fs.Path(s"$work/feed"))
    val per = (changes.size + slices - 1) / slices
    changes.grouped(per).zipWithIndex.foreach { case (slice, i) =>
      val tmp = s"$work/tmp$i"
      slice.toDF("k", "seq", "ts", "payload", "op")
        .coalesce(1).write.mode("overwrite").parquet(tmp)
      val part = fs.listStatus(new org.apache.hadoop.fs.Path(tmp))
        .map(_.getPath).filter(_.getName.endsWith(".parquet")).head
      fs.rename(part, new org.apache.hadoop.fs.Path(f"$work/feed/b$i%02d.parquet"))
    }
    val baseDf = base.toDF("k", "seq", "ts", "payload")
    val stream = spark.readStream
      .schema(changes.toDF("k", "seq", "ts", "payload", "op").schema)
      .option("maxFilesPerTrigger", "1").parquet(s"$work/feed")
    val q = StreamCdc.run(stream, baseDf, work, Seq("k"), "ts", "seq", "op",
      retain = 3)
    q.processAllAvailable(); q.stop()
  }

  test("sliced stream merge == one-shot batch apply, bit for bit") {
    val work = graft.SessionScoped.scratchDir("graft_scdc")
    runStream(work, slices = 4)
    val baseDf = base.toDF("k", "seq", "ts", "payload")
    val streamed = canon(StreamCdc.snapshot(spark, work, baseDf))
    val oneShot = canon(Cdc.applyChangelog(baseDf,
      changes.toDF("k", "seq", "ts", "payload", "op"),
      Seq("k"), "ts", "seq", "op"))
    assert(streamed == oneShot)
  }

  test("replaying a batch is idempotent: as-of read skips its own output") {
    val work = graft.SessionScoped.scratchDir("graft_scdc2")
    runStream(work, slices = 3)
    val baseDf = base.toDF("k", "seq", "ts", "payload")
    val before = canon(StreamCdc.snapshot(spark, work, baseDf))
    // simulate an at-least-once replay of the LAST batch: re-apply slice 2
    // by hand through the same as-of read + overwrite the run() body does
    val lastSlice = changes.grouped(20).toSeq.last
      .toDF("k", "seq", "ts", "payload", "op")
    val prev = StreamCdc.snapshotAsOf(spark, work, 2L, baseDf)
    Cdc.applyChangelog(prev, lastSlice, Seq("k"), "ts", "seq", "op")
      .write.mode("overwrite").parquet(f"$work/snap/gen-${2L}%09d")
    assert(canon(StreamCdc.snapshot(spark, work, baseDf)) == before)
  }

  test("GC bounds the generation count to retain") {
    val work = graft.SessionScoped.scratchDir("graft_scdc3")
    runStream(work, slices = 6)
    val fs = new org.apache.hadoop.fs.Path(work)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val gens = fs.listStatus(new org.apache.hadoop.fs.Path(s"$work/snap"))
      .map(_.getPath.getName).filter(_.startsWith("gen-"))
    assert(gens.length == 3, s"expected retain=3 generations, got ${gens.toSeq}")
  }
}
