package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.streaming.{Feeder, StreamSessionize}

/** Stream==batch parity for gap sessionization: the session_window
  * stream must reproduce the batch cumulative-gap-cut sessions bit for
  * bit — across micro-batch boundaries, and on the exact-gap edge the
  * strict merge horizon could get wrong. */
class StreamSessionizeSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  /** The batch query's own sessionization (same logic as q_sessionize),
    * inlined over an arbitrary (user_id, ts, value) frame. */
  private def batchSessions(ev: DataFrame): Seq[Row6] = {
    val w = Window.partitionBy(col("user_id")).orderBy(col("ts"))
    val gap = unix_micros(col("ts")) - lag(unix_micros(col("ts")), 1).over(w)
    val isNew = when(gap.isNull || gap > StreamSessionize.GapUs, 1).otherwise(0)
    ev.withColumn("session_id",
        sum(isNew).over(w.rowsBetween(Window.unboundedPreceding, 0)))
      .groupBy(col("user_id"), col("session_id"))
      .agg(min(col("ts")).as("session_start"), max(col("ts")).as("session_end"),
        count(lit(1)).as("n_events"),
        sum(floor(col("value") * 100 + lit(0.5)).cast("long")).as("vc"))
      .select(col("user_id"), col("session_id"), col("session_start"),
        col("session_end"), col("n_events"),
        (col("vc") / lit(100.0)).as("total_value"))
      .collect().map(Row6.of).sorted.toSeq
  }

  private def streamSessions(ev: DataFrame, slices: Int): Seq[Row6] = {
    val work = graft.SessionScoped.scratchDir("graft_ss")
    Feeder.writeTimeSlicedFeed(
      ev.withColumn("_ms", unix_millis(col("ts"))), "_ms", work, slices)
    val maxTs = ev.agg(max(unix_micros(col("ts")))).head().getLong(0)
    val sentinel = Seq((StreamSessionize.SentinelUser, maxTs + 100L * 86400 * 1000000, 0.0))
      .toDF("user_id", "us", "value")
      .select(col("user_id"), timestamp_micros(col("us")).as("ts"), col("value"))
    Feeder.appendFeedFile(sentinel, work, slices)
    val stream = spark.readStream.schema(ev.schema)
      .option("maxFilesPerTrigger", "1").parquet(s"$work/feed")
    val q = StreamSessionize.run(stream, work)
    q.processAllAvailable(); q.stop()
    StreamSessionize.report(spark, work).collect().map(Row6.of).sorted.toSeq
  }

  private def ev(rows: (Long, Long, Double)*): DataFrame =
    rows.toDF("user_id", "us", "value")
      .select(col("user_id"), timestamp_micros(col("us")).as("ts"), col("value"))

  test("exact-gap edge: gap == 30min stays one session; +1us splits") {
    val G = StreamSessionize.GapUs
    val base = 1700000000000000L
    val events = ev(
      (1L, base, 1.0), (1L, base + G, 2.0),          // exactly 30min: merge
      (2L, base, 1.0), (2L, base + G + 1, 2.0))      // 30min + 1us: split
    val b = batchSessions(events)
    assert(b.count(_.user == 1L) == 1 && b.count(_.user == 2L) == 2)
    assert(streamSessions(events, 2) == b)
  }

  test("sessions spanning micro-batch boundaries merge in state") {
    // user 10: a burst every 10 min across the whole span — ONE session
    // no matter where the 3 slice cuts fall; user 20: three separated
    // bursts — exactly three sessions, each summed correctly
    val base = 1700000000000000L
    val min10 = 600000000L
    val burst = (0 until 18).map(i => (10L, base + i * min10, 1.5))
    val spaced = Seq(0L, 4L, 8L).zipWithIndex.flatMap { case (h, j) =>
      (0 until 3).map(i => (20L, base + h * 3600000000L + i * min10, j + 0.25))
    }
    val events = ev(burst ++ spaced: _*)
    val b = batchSessions(events)
    assert(b.count(_.user == 10L) == 1 && b.count(_.user == 20L) == 3)
    assert(streamSessions(events, 3) == b)
  }

  test("late data: within lateDelay merges into its session, beyond drops") {
    // The SAME out-of-order feed under two tolerances (the StreamJoin
    // late-data contract, mirrored for sessions). Batch 1 pushes the
    // stream's max event time to T+40min (advancer key 9) while user
    // 1's session opens at T; batch 2 delivers user 1's second event
    // out-of-order at T+1s — 40min behind the max, i.e. beyond the
    // 30min session gap. The session-window drop line is window-END
    // based (max − lateDelay − gap, see the run() scaladoc):
    //  - lateDelay "20 minutes": watermark T+20min; the late event's
    //    provisional window ends T+1s+30min > that — admitted, and its
    //    session (horizon T+30min) is still open, so it MERGES
    //    (n_events 2, both values summed); 0 rows dropped.
    //  - lateDelay "0 seconds": watermark T+40min > T+1s+30min — the
    //    event is dropped as late (measured via
    //    numRowsDroppedByWatermark) and the session finalizes WITHOUT
    //    it (n_events 1), never a silent mis-merge.
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sq = spark.sqlContext
    val base = 1700000000000000L
    val m = 60000000L // one minute in us
    def run(lateDelay: String): (Seq[Row6], Long) = {
      val work = graft.SessionScoped.scratchDir("graft_ss_late")
      val in = MemoryStream[(Long, Long, Double)]
      val df = in.toDF().toDF("user_id", "us", "value")
        .select(col("user_id"), timestamp_micros(col("us")).as("ts"),
          col("value"))
      val q = StreamSessionize.run(df, work, lateDelay)
      val dropped =
        try {
          in.addData((1L, base, 1.0), (9L, base + 40 * m, 0.0))
          q.processAllAvailable()
          in.addData((1L, base + 1000000L, 2.0)) // late: 40min behind max
          q.processAllAvailable()
          in.addData((StreamSessionize.SentinelUser,
            base + 86400L * 1000000L, 0.0)) // flush
          q.processAllAvailable()
          q.recentProgress.toSeq
            .flatMap(_.stateOperators.map(_.numRowsDroppedByWatermark)).sum
        } finally q.stop()
      val sessions = StreamSessionize.report(spark, work)
        .filter(col("user_id") === 1L).collect().map(Row6.of).sorted.toSeq
      (sessions, dropped)
    }
    val (merged, d1) = run("20 minutes")
    assert(merged == Seq(Row6(1L, base, base + 1000000L, 2L, 3.0)),
      "an out-of-order event within lateDelay must merge into its session")
    assert(d1 == 0L)
    val (split, d2) = run("0 seconds")
    assert(split == Seq(Row6(1L, base, base, 1L, 1.0)),
      "an event beyond lateDelay must drop; the session finalizes without it")
    assert(d2 == 1L, "exactly the one late event is dropped, measurably")
  }

  test("restart mid-feed from the checkpoint: sessions equal the batch cut") {
    // user 10's single 3-hour burst SPANS the stop point, so its session
    // must merge across the restart purely from recovered session_window
    // state; user 20's three separated bursts check ordinary sessions
    // around it. Same event set as the micro-batch boundary test.
    val base = 1700000000000000L
    val min10 = 600000000L
    val burst = (0 until 18).map(i => (10L, base + i * min10, 1.5))
    val spaced = Seq(0L, 4L, 8L).zipWithIndex.flatMap { case (h, j) =>
      (0 until 3).map(i => (20L, base + h * 3600000000L + i * min10, j + 0.25))
    }
    val events = ev(burst ++ spaced: _*)
    val b = batchSessions(events)
    val cut = base + 9 * min10 // inside user 10's burst
    val work = graft.SessionScoped.scratchDir("graft_ss_restart")
    def feed() = spark.readStream.schema(events.schema)
      .option("maxFilesPerTrigger", "1").parquet(s"$work/feed")
    // phase 1: only the pre-cut events exist; run and STOP mid-session
    Feeder.appendFeedFile(events.filter(col("ts") <
      timestamp_micros(lit(cut))).orderBy(col("ts")), work, 0)
    val q1 = StreamSessionize.run(feed(), work)
    q1.processAllAvailable(); q1.stop()
    // phase 2: the rest + the flush sentinel land; RESTART on the same
    // checkpoint — open-session state must come back from it
    Feeder.appendFeedFile(events.filter(col("ts") >=
      timestamp_micros(lit(cut))).orderBy(col("ts")), work, 1)
    val maxTs = events.agg(max(unix_micros(col("ts")))).head().getLong(0)
    val sentinel = Seq((StreamSessionize.SentinelUser,
        maxTs + 100L * 86400 * 1000000, 0.0))
      .toDF("user_id", "us", "value")
      .select(col("user_id"), timestamp_micros(col("us")).as("ts"),
        col("value"))
    Feeder.appendFeedFile(sentinel, work, 2)
    val q2 = StreamSessionize.run(feed(), work)
    q2.processAllAvailable(); q2.stop()
    val got = StreamSessionize.report(spark, work)
      .collect().map(Row6.of).sorted.toSeq
    assert(got.count(_.user == 10L) == 1,
      "the session spanning the restart must merge, not split")
    assert(got == b)
  }

  test("sf0.001 events: stream sessions == batch sessions") {
    val events = graft.sources.Tables.events(spark, "/root/testdata/sf0.001")
      .select(col("user_id"), col("ts"), col("value"))
    assert(streamSessions(events, 3) == batchSessions(events))
  }
}

/** Comparable, fully-typed session row (avoids Row equality pitfalls). */
final case class Row6(user: Long, start: Long, end: Long, n: Long, v: Double)
object Row6 {
  implicit val ord: Ordering[Row6] =
    Ordering.by(r => (r.user, r.start, r.end, r.n, r.v))
  def of(r: org.apache.spark.sql.Row): Row6 = {
    // rows carry (user_id, [session_id,] session_start, session_end,
    // n_events, total_value) — session_id is positional rank, implied by
    // (user, start) order, so compare on the invariant columns
    val off = if (r.length == 6) 1 else 0
    // µs-precision epoch (getTime truncates to ms and would hide sub-ms
    // boundary differences from the parity compare)
    def us(i: Int): Long = {
      val t = r.getTimestamp(i).toInstant
      t.getEpochSecond * 1000000L + t.getNano / 1000L
    }
    Row6(r.getLong(0), us(1 + off), us(2 + off),
      r.getLong(3 + off), r.getDouble(4 + off))
  }
}
