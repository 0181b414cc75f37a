package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.streaming.{Feeder, StreamJoin}

/** Stream==batch parity for the event-time interval join: the streamed
  * match set must equal the batch join row for row — across micro-batch
  * boundaries (left buffered in state until its right side arrives) and
  * on the inclusive window edge. */
class StreamJoinSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private val WinUs = 1800000000L // 30 min

  private def ev(rows: (Long, Long, Long, String)*): DataFrame =
    rows.toDF("user_id", "event_id", "us", "event_type")
      .select(col("user_id"), col("event_id"),
        timestamp_micros(col("us")).as("ts"), col("event_type"))

  private def batchMatches(events: DataFrame,
      joinType: String = "inner"): Seq[(Long, Long, Any, Any)] = {
    val a = events.filter(col("event_type") =!= "error").alias("a")
    val b = events.filter(col("event_type") === "error").alias("b")
    a.join(b, expr(
        s"""a.user_id = b.user_id AND b.ts >= a.ts AND
           |b.ts <= a.ts + INTERVAL $WinUs MICROSECOND""".stripMargin), joinType)
      .select(col("a.user_id"), col("a.event_id"), col("b.event_id"),
        (unix_micros(col("b.ts")) - unix_micros(col("a.ts"))))
      .collect().map(r => (r.getLong(0), r.getLong(1),
        if (r.isNullAt(2)) null else r.getLong(2),
        if (r.isNullAt(3)) null else r.getLong(3)))
      .sortBy(t => (t._1, t._2, String.valueOf(t._3))).toSeq
  }

  private def streamMatches(events: DataFrame, slices: Int,
      joinType: String = "inner"): Seq[(Long, Long, Any, Any)] = {
    val work = graft.SessionScoped.scratchDir("graft_sj")
    Feeder.writeTimeSlicedFeed(
      events.withColumn("_ms", unix_millis(col("ts"))), "_ms", work, slices)
    if (joinType != "inner") {
      // watermark-flush sentinel on BOTH streams (reserved user): the
      // join's eviction watermark is the MIN across the two watermark
      // nodes, so advancing only one side never flushes the other's tail
      val maxUs = events.agg(max(unix_micros(col("ts")))).head().getLong(0)
      val sentinel = Seq((-1L, -1L, maxUs + 8640000000000L, "error"),
        (-1L, -2L, maxUs + 8640000000000L, "click"))
        .toDF("user_id", "event_id", "us", "event_type")
        .select(col("user_id"), col("event_id"),
          timestamp_micros(col("us")).as("ts"), col("event_type"))
      Feeder.appendFeedFile(sentinel, work, slices)
    }
    def stream = spark.readStream.schema(events.schema)
      .option("maxFilesPerTrigger", "1").parquet(s"$work/feed")
    val q = StreamJoin.run(
      stream.filter(col("event_type") =!= "error"),
      stream.filter(col("event_type") === "error"),
      "user_id", "event_id", WinUs, work, joinType)
    q.processAllAvailable(); q.stop()
    StreamJoin.report(spark, work)
      .filter(col("user_id") =!= -1L).collect()
      .map(r => (r.getLong(0), r.getLong(1),
        if (r.isNullAt(2)) null else r.getLong(2),
        if (r.isNullAt(3)) null else r.getLong(3)))
      .sortBy(t => (t._1, t._2, String.valueOf(t._3))).toSeq
  }

  test("window edge is inclusive; matches cross micro-batch boundaries") {
    // span 74 min replayed as 5 x ~14.8-min slices, so both matching
    // pairs straddle slice boundaries (0→2 and 3→4): the left side must
    // survive in join state until its right side's batch arrives
    val base = 1700000000000000L
    val m = 60000000L
    val events = ev(
      (1L, 1L, base, "click"), (1L, 2L, base + WinUs, "error"),      // edge: match
      (2L, 3L, base, "click"), (2L, 4L, base + WinUs + 1, "error"),  // +1us: no match
      (3L, 5L, base, "error"), (3L, 6L, base + 1, "click"),          // error first: no match
      (4L, 7L, base + 50 * m, "view"), (4L, 8L, base + 74 * m, "error"))
    val b = batchMatches(events)
    assert(b.map(t => (t._1, t._2, t._3)) == Seq((1L, 1L, 2L), (4L, 7L, 8L)))
    assert(streamMatches(events, 5) == b)
  }

  test("left-outer: unmatched lefts emit null matches on state eviction") {
    val base = 1700000000000000L
    val m = 60000000L
    val events = ev(
      (1L, 1L, base, "click"), (1L, 2L, base + 10 * m, "error"), // matched
      (2L, 3L, base + 5 * m, "view"),                            // never matched
      (3L, 4L, base + 74 * m, "click")) // tail: only the sentinel evicts it
    val b = batchMatches(events, "left_outer")
    assert(b.count(_._3 == null) == 2 && b.count(_._3 != null) == 1)
    assert(streamMatches(events, 3, "left_outer") == b)
  }

  test("late data: within lateDelay joins, beyond it drops to a null match") {
    // The SAME out-of-order feed under two tolerances. Batch 1 pushes
    // both sides' max event time to T+8min (sentinel key 9) while the
    // real left row sits at T; batch 2 delivers its right partner
    // out-of-order at T+1s.
    //  - lateDelay "10 minutes": watermark T-2min < T+1s, the late row is
    //    admitted, and the pair matches (the left is still in state:
    //    eviction needs wm > T+window).
    //  - lateDelay "0 seconds": watermark is already T+8min, the right
    //    row is dropped as late AND the left was evicted — the left_outer
    //    join must finalize it as a null match, never a silent loss.
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sq = spark.sqlContext
    val base = 1700000000000000L
    val m = 60000000L // one minute in us
    def run(lateDelay: String): Seq[(Long, Long, Any)] = {
      val work = graft.SessionScoped.scratchDir("graft_sj_late")
      val lin = MemoryStream[(Long, Long, Long)]
      val rin = MemoryStream[(Long, Long, Long)]
      def df(ms: MemoryStream[(Long, Long, Long)]) =
        ms.toDF().toDF("user_id", "event_id", "us")
          .select(col("user_id"), col("event_id"),
            timestamp_micros(col("us")).as("ts"))
      val q = StreamJoin.run(df(lin), df(rin), "user_id", "event_id",
        2 * m, work, "left_outer", lateDelay)
      try {
        lin.addData((1L, 1L, base), (9L, 90L, base + 8 * m))
        rin.addData((9L, 91L, base + 8 * m))
        q.processAllAvailable()
        rin.addData((1L, 2L, base + 1000000L)) // the late right partner
        q.processAllAvailable()
        // far-future sentinels on BOTH sides flush the outer tail
        lin.addData((9L, 92L, base + 86400 * 1000000L))
        rin.addData((9L, 93L, base + 86400 * 1000000L))
        q.processAllAvailable()
      } finally q.stop()
      StreamJoin.report(spark, work)
        .filter(col("user_id") =!= 9L).collect()
        .map(r => (r.getLong(0), r.getLong(1),
          if (r.isNullAt(2)) null else r.getLong(2))).toSeq
    }
    assert(run("10 minutes") == Seq((1L, 1L, 2L)),
      "an out-of-order row within lateDelay must still join")
    assert(run("0 seconds") == Seq((1L, 1L, null)),
      "a row beyond lateDelay must drop, finalizing its partner as null")
  }

  test("sf0.001 events: streamed interval join == batch join, both types") {
    val events = graft.sources.Tables.events(spark, "/root/testdata/sf0.001")
      .select(col("user_id"), col("event_id"), col("ts"), col("event_type"))
    val s = streamMatches(events, 3)
    assert(s.nonEmpty)
    assert(s == batchMatches(events))
    assert(streamMatches(events, 3, "left_outer") ==
      batchMatches(events, "left_outer"))
  }
}
