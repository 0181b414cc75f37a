package graft

import java.sql.Timestamp

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.EventAnalytics

/** Ordering semantics the dense synthetic events can't discriminate:
  * out-of-order steps must not count, same-timestamp ties break on
  * event_id, and retention offsets come from first-seen weeks. */
class EventAnalyticsSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def ts(min: Long) = new Timestamp(1700000000000L + min * 60000L)

  test("funnel counts only strictly-ordered step sequences") {
    val events = Seq(
      // user 1: view → click → purchase (completes all 3)
      (1L, 1L, ts(0), "view"), (1L, 2L, ts(1), "click"), (1L, 3L, ts(2), "purchase"),
      // user 2: purchase BEFORE view/click — purchase must not count
      (2L, 4L, ts(0), "purchase"), (2L, 5L, ts(1), "view"), (2L, 6L, ts(2), "click"),
      // user 3: view only
      (3L, 7L, ts(0), "view"),
      // user 4: click with no prior view — nothing counts
      (4L, 8L, ts(0), "click"), (4L, 9L, ts(1), "purchase")
    ).toDF("user_id", "event_id", "ts", "event_type")
    val out = EventAnalytics.funnel(events, Seq("view", "click", "purchase"))
      .collect().map(r => r.getAs[Int]("step") -> r.getAs[Long]("n_users")).toMap
    assert(out == Map(1 -> 3L, 2 -> 2L, 3 -> 1L))
  }

  test("funnel same-timestamp tie breaks on event_id (strictly-before excludes the tie row)") {
    val events = Seq(
      // view and click share a timestamp: click(id=2) sees view(id=1) as
      // strictly before (same ts, lower id) → counts
      (1L, 1L, ts(0), "view"), (1L, 2L, ts(0), "click"),
      // reversed ids: click(id=1) precedes view(id=2) in order → no count
      (2L, 2L, ts(0), "view"), (2L, 1L, ts(0), "click")
    ).toDF("user_id", "event_id", "ts", "event_type")
    val out = EventAnalytics.funnel(events, Seq("view", "click"))
      .collect().map(r => r.getAs[Int]("step") -> r.getAs[Long]("n_users")).toMap
    assert(out == Map(1 -> 2L, 2 -> 1L))
  }

  test("attribution picks earliest and latest preceding non-conversion touch") {
    val events = Seq(
      (1L, 10L, ts(0), "view", 1.0, ""),
      (2L, 10L, ts(5), "click", 1.0, ""),
      (3L, 10L, ts(9), "purchase", 9.0, ""),   // first=view(1), last=click(2)
      (4L, 10L, ts(12), "click", 1.0, ""),
      (5L, 10L, ts(20), "purchase", 5.0, ""),  // first=view(1), last=click(4)
      (6L, 11L, ts(3), "purchase", 2.0, "")    // no touches → nulls
    ).toDF("event_id", "user_id", "ts", "event_type", "value", "props")
    val out = EventAnalytics.attribution(events, "purchase")
      .collect().map(r => r.getAs[Long]("conversion_id") -> r).toMap
    assert(out.keySet == Set(3L, 5L, 6L))
    assert(out(3L).getAs[String]("first_touch_type") == "view")
    assert(out(3L).getAs[Long]("last_touch_id") == 2L)
    assert(out(3L).getAs[Long]("gap_ms") == 4 * 60000L)
    assert(out(5L).getAs[Long]("first_touch_id") == 1L)
    assert(out(5L).getAs[Long]("last_touch_id") == 4L)
    assert(out(5L).getAs[Long]("gap_ms") == 8 * 60000L)
    assert(out(6L).isNullAt(out(6L).fieldIndex("first_touch_type")))
    assert(out(6L).isNullAt(out(6L).fieldIndex("gap_ms")))
    // a preceding conversion is never a touch: purchase(3) not last for (5)
    assert(out(5L).getAs[String]("last_touch_type") == "click")
  }

  test("cohort retention offsets count weeks since first-seen") {
    val w0 = ts(0)
    def weeks(n: Int) = new Timestamp(w0.getTime + n * 7L * 86400000L)
    val events = Seq(
      (1L, 1L, weeks(0), "view"), (1L, 2L, weeks(1), "view"), (1L, 3L, weeks(3), "view"),
      (2L, 4L, weeks(0), "view"),
      (3L, 5L, weeks(1), "view"), (3L, 6L, weeks(2), "view")
    ).toDF("user_id", "event_id", "ts", "event_type")
    val out = EventAnalytics.cohortRetention(events)
      .collect()
      .map(r => (r.getTimestamp(0), r.getAs[Int]("week_offset")) -> r.getAs[Long]("n_users"))
      .toMap
    val c0 = out.keys.map(_._1).min
    val c1 = out.keys.map(_._1).max
    assert(c0 != c1) // two cohorts
    assert(out((c0, 0)) == 2L) // users 1, 2 in week-0 cohort
    assert(out((c0, 1)) == 1L && out((c0, 3)) == 1L)
    assert(out((c1, 0)) == 1L && out((c1, 1)) == 1L) // user 3's cohort
  }

  test("transitions: per-user ordering, no cross-user steps, rows sum to 1") {
    val events = Seq(
      // user 1: a → b → a → c ; user 2: b → b (same-ts tie broken by id)
      (1L, 1L, ts(0), "a"), (1L, 2L, ts(1), "b"), (1L, 3L, ts(2), "a"),
      (1L, 4L, ts(3), "c"),
      (2L, 5L, ts(0), "b"), (2L, 6L, ts(0), "b")
    ).toDF("user_id", "event_id", "ts", "event_type")
    val out = EventAnalytics.transitions(events).collect()
      .map(r => (r.getAs[String]("from_type"), r.getAs[String]("to_type")) ->
        (r.getAs[Long]("n"), r.getAs[Double]("p"))).toMap
    // user 1 contributes a→b, b→a, a→c; user 2 contributes b→b; and no
    // c→b step exists (c is user 1's last event — no cross-user stitching)
    assert(out.keySet == Set(("a", "b"), ("b", "a"), ("a", "c"), ("b", "b")))
    assert(out(("a", "b"))._1 == 1L && out(("a", "c"))._1 == 1L)
    assert(out(("a", "b"))._2 == 0.5 && out(("a", "c"))._2 == 0.5)  // row 'a' sums to 1
    assert(out(("b", "a"))._2 == 0.5 && out(("b", "b"))._2 == 0.5)  // row 'b' too
  }

  test("peakConcurrency: overlap counting, closed intervals, midnight split") {
    // fixed midnight base so day clipping is exercised deterministically
    val day0 = java.sql.Timestamp.valueOf("2023-11-15 00:00:00").getTime
    def at(h: Double) = new Timestamp(day0 + (h * 3600000L).toLong)
    var id = 0L
    def burst(u: Long, fromH: Double, toH: Double) = {
      // events every 15 min => one session spanning [fromH, toH]
      val n = ((toH - fromH) * 4).toInt
      (0 to n).map { i => id += 1; (u, id, at(fromH + i * 0.25), "e") }
    }
    val events = (burst(1L, 10.0, 11.0) ++ burst(2L, 10.5, 12.0) ++
      burst(3L, 11.5, 11.75) ++
      burst(4L, 23.0, 25.0)) // crosses midnight into day 2
      .toDF("user_id", "event_id", "ts", "event_type")
    val out = EventAnalytics.peakConcurrency(events, 30).collect()
      .map(r => r.getAs[java.sql.Date]("day").toString ->
        (r.getAs[Long]("peak_concurrent"), r.getAs[Long]("n_sessions"))).toMap
    // day 1: A[10,11] B[10.5,12] C[11.5,11.75] D[23,24) ⇒ peak 2
    // (A∩B on [10.5,11], B∩C on [11.5,11.75]); 4 sessions touch day 1
    assert(out("2023-11-15") == ((2L, 4L)))
    // day 2: only D's tail [0,1] ⇒ peak 1
    assert(out("2023-11-16") == ((1L, 1L)))
  }

  test("topPaths: session cut, depth truncation, deterministic order") {
    def hrs(h: Long) = new Timestamp(1700000000000L + h * 3600000L)
    val events = Seq(
      // user 1, session 1: a b c d → path "a > b > c" (depth 3 truncates)
      (1L, 1L, ts(0), "a"), (1L, 2L, ts(1), "b"), (1L, 3L, ts(2), "c"),
      (1L, 4L, ts(3), "d"),
      // user 1, session 2 (2h gap): a b → "a > b"
      (1L, 5L, hrs(2), "a"),
      (1L, 6L, new Timestamp(1700000000000L + 2 * 3600000L + 60000L), "b"),
      // user 2, one session: a b c → "a > b > c"
      (2L, 7L, ts(0), "a"), (2L, 8L, ts(1), "b"), (2L, 9L, ts(2), "c")
    ).toDF("user_id", "event_id", "ts", "event_type")
    val out = EventAnalytics.topPaths(events, 30, 3, 10).collect()
      .map(r => r.getAs[String]("path") -> r.getAs[Long]("n_sessions"))
    assert(out.toSeq == Seq("a > b > c" -> 2L, "a > b" -> 1L))
    // order inside a session comes from (ts, event_id), not partitioning
    val shuffled = EventAnalytics.topPaths(events.repartition(7), 30, 3, 10)
      .collect().map(r => r.getAs[String]("path") -> r.getAs[Long]("n_sessions"))
    assert(shuffled.toSeq == out.toSeq)
  }
}
