package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Cdc

/** Merge-semantics contract of [[Cdc.applyChangelog]] on controlled
  * changelogs — the cases the oracle-gated q_cdc_apply can't isolate. */
class CdcSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def snap(rows: (Long, Long, Long, String)*): DataFrame =
    rows.toDF("k", "seq", "ts", "payload")
  private def chg(rows: (Long, Long, Long, String, String)*): DataFrame =
    rows.toDF("k", "seq", "ts", "payload", "op")

  private def apply0(base: DataFrame, changes: DataFrame): Seq[(Long, String)] =
    Cdc.applyChangelog(base, changes, Seq("k"), "ts", "seq", "op")
      .select("k", "payload").collect()
      .map(r => (r.getLong(0), r.getString(1))).sorted.toSeq

  test("upsert replaces, insert adds, delete removes, untouched survives") {
    val base = snap((1L, 1L, 10L, "old1"), (2L, 2L, 10L, "old2"), (3L, 3L, 10L, "old3"))
    val changes = chg(
      (1L, 10L, 20L, "new1", "U"), // update existing
      (4L, 11L, 20L, "new4", "U"), // insert missing
      (2L, 12L, 20L, "x", "D"),    // delete existing
      (9L, 13L, 20L, "x", "D"))    // delete absent: no-op
    assert(apply0(base, changes) ==
      Seq((1L, "new1"), (3L, "old3"), (4L, "new4")))
  }

  test("last write wins by ts, then by seq on ts ties") {
    val base = snap()
    val changes = chg(
      (1L, 1L, 10L, "a", "U"), (1L, 2L, 30L, "winner-by-ts", "U"),
      (1L, 3L, 20L, "b", "U"),
      (2L, 5L, 10L, "loser", "U"), (2L, 6L, 10L, "winner-by-seq", "U"))
    assert(apply0(base, changes) ==
      Seq((1L, "winner-by-ts"), (2L, "winner-by-seq")))
    // a later delete erases even a key the same changelog inserted
    val delLast = chg((3L, 1L, 10L, "born", "U"), (3L, 2L, 11L, "x", "D"))
    assert(apply0(base, delLast).isEmpty)
  }

  test("applying two slices in order == applying their union") {
    val base = snap((1L, 1L, 10L, "old1"), (2L, 2L, 10L, "old2"))
    val c1 = chg((1L, 10L, 20L, "mid1", "U"), (3L, 11L, 20L, "mid3", "U"))
    val c2 = chg((1L, 20L, 30L, "x", "D"), (3L, 21L, 30L, "new3", "U"),
      (4L, 22L, 30L, "new4", "U"))
    val stepwise = apply0(
      Cdc.applyChangelog(base, c1, Seq("k"), "ts", "seq", "op"), c2)
    val atOnce = apply0(base, c1.unionByName(c2))
    assert(stepwise == atOnce)
    assert(stepwise == Seq((2L, "old2"), (3L, "new3"), (4L, "new4")))
  }

  test("result is deterministic under changelog repartitioning") {
    val base = snap((1L, 1L, 10L, "old1"))
    val changes = chg((1 to 500).map(i =>
      (i.toLong % 7, i.toLong, (i % 13).toLong, s"p$i",
        if (i % 11 == 0) "D" else "U")): _*)
    assert(apply0(base, changes.repartition(2)) ==
      apply0(base, changes.repartition(23)))
  }

  test("diff round-trip: apply(a, diff(a, b)) == b; diff is minimal") {
    val a = snap((1L, 1L, 10L, "same"), (2L, 2L, 10L, "will-change"),
      (3L, 3L, 10L, "will-vanish"))
    val b = snap((1L, 1L, 10L, "same"), (2L, 9L, 20L, "changed"),
      (4L, 8L, 20L, "appeared"))
    val d = Cdc.diff(a, b, Seq("k"), "op")
    // minimal: nothing emitted for the unchanged key 1
    val ops = d.select("k", "op").collect()
      .map(r => (r.getLong(0), r.getString(1))).sorted.toSeq
    assert(ops == Seq((2L, "U"), (3L, "D"), (4L, "U")))
    val roundTrip = Cdc.applyChangelog(a, d, Seq("k"), "ts", "seq", "op")
      .collect().map(_.toSeq).sortBy(_.toString()).toSeq
    assert(roundTrip == b.collect().map(_.toSeq).sortBy(_.toString()).toSeq)
  }

  test("diff compares null payload fields null-safely") {
    val a = Seq((1L, 1L, 10L, Option.empty[String]), (2L, 1L, 10L, Option("v")),
      (3L, 1L, 10L, Option.empty[String])).toDF("k", "seq", "ts", "payload")
    val b = Seq((1L, 1L, 10L, Option.empty[String]), // unchanged: null == null
      (2L, 1L, 10L, Option.empty[String]),           // v -> null is a change
      (3L, 2L, 10L, Option("w")))                    // null -> w is a change
      .toDF("k", "seq", "ts", "payload")
    val ops = Cdc.diff(a, b, Seq("k"), "op").select("k", "op").collect()
      .map(r => (r.getLong(0), r.getString(1))).sorted.toSeq
    assert(ops == Seq((2L, "U"), (3L, "U")))
  }

  test("diff plans one key-equi full-outer join — no Except, no cartesian") {
    val a = snap((1L, 1L, 10L, "x"), (2L, 2L, 10L, "y"))
    val b = snap((1L, 1L, 10L, "x2"), (3L, 3L, 10L, "z"))
    val plan = Cdc.diff(a, b, Seq("k"), "op").queryExecution.sparkPlan.toString
    assert(!plan.contains("Except"), s"exceptAll resurfaced:\n$plan")
    assert(plan.contains("FullOuter"), s"expected a full-outer equi join:\n$plan")
    assert(!plan.contains("CartesianProduct") &&
      !plan.contains("BroadcastNestedLoopJoin"),
      s"null-safe key equality must extract as an equi join:\n$plan")
  }

  test("a NULL op is an upsert, never a silent delete") {
    val base = snap((1L, 1L, 10L, "old1"))
    val changes = Seq((1L, 2L, 20L, "new1", Option.empty[String]))
      .toDF("k", "seq", "ts", "payload", "op")
    assert(apply0(base, changes) == Seq((1L, "new1")))
  }

  test("a changelog carrying a real '_rn' column is rejected, not clobbered") {
    val base = snap((1L, 1L, 10L, "old1"))
    val bad = Seq((1L, 2L, 20L, "new1", "U", 7L))
      .toDF("k", "seq", "ts", "payload", "op", "_rn")
    val e = intercept[IllegalArgumentException] {
      Cdc.applyChangelog(base, bad, Seq("k"), "ts", "seq", "op")
    }
    assert(e.getMessage.contains("_rn"))
  }

  test("a changelog missing base columns is rejected") {
    val base = snap((1L, 1L, 10L, "old1"))
    val bad = Seq((1L, 2L, 20L, "U")).toDF("k", "seq", "ts", "op") // no payload
    val e = intercept[IllegalArgumentException] {
      Cdc.applyChangelog(base, bad, Seq("k"), "ts", "seq", "op")
    }
    assert(e.getMessage.contains("payload"))
  }

  test("a null merge key raises loudly everywhere, never silently merges") {
    // the `===` key joins would silently DROP a null-keyed match (and
    // the anti-join would silently KEEP a null-keyed base row next to
    // its null-keyed upsert) — every path must refuse at runtime instead
    def chain(t: Throwable): String = Iterator.iterate(t)(_.getCause)
      .takeWhile(_ != null).map(m => String.valueOf(m.getMessage))
      .mkString(" | ")
    val good = snap((1L, 1L, 10L, "old1"))
    val nullBase = Seq((Option(1L), 1L, 10L, "old1"),
      (Option.empty[Long], 2L, 10L, "ghost")).toDF("k", "seq", "ts", "payload")
    val nullChg = Seq((Option.empty[Long], 10L, 20L, "x", "U"))
      .toDF("k", "seq", "ts", "payload", "op")
    // changes-side guard (rides the rank column)
    val e1 = intercept[Exception] {
      Cdc.applyChangelog(good, nullChg, Seq("k"), "ts", "seq", "op").collect()
    }
    assert(chain(e1).contains("null merge key"))
    // base-side guard (a Filter on the base)
    val e2 = intercept[Exception] {
      Cdc.applyChangelog(nullBase, chg((1L, 10L, 20L, "new1", "U")),
        Seq("k"), "ts", "seq", "op").collect()
    }
    assert(chain(e2).contains("null merge key"))
    // column-pruning resistance (why the guard is a Filter, not a
    // projection rider): a consumer that selects only key columns — or
    // merely counts rows — must still trip the base-side guard; a guard
    // woven into payload columns would be pruned away here
    val e2a = intercept[Exception] {
      Cdc.applyChangelog(nullBase, chg((1L, 10L, 20L, "new1", "U")),
        Seq("k"), "ts", "seq", "op").select("k").collect()
    }
    assert(chain(e2a).contains("null merge key"))
    val e2b = intercept[Exception] {
      Cdc.applyChangelog(nullBase, chg((1L, 10L, 20L, "new1", "U")),
        Seq("k"), "ts", "seq", "op").count()
    }
    assert(chain(e2b).contains("null merge key"))
    // diff guards BOTH snapshots (rides the presence sentinel)
    val e3 = intercept[Exception] {
      Cdc.diff(nullBase, good, Seq("k"), "op").collect()
    }
    assert(chain(e3).contains("null merge key"))
    val e4 = intercept[Exception] {
      Cdc.diff(good, nullBase, Seq("k"), "op").collect()
    }
    assert(chain(e4).contains("null merge key"))
    // keys-only base: the filter guard needs no payload column to ride,
    // so the degenerate shape is covered by the same mechanism
    val keysOnlyNull = Seq(Option(1L), Option.empty[Long]).toDF("k")
    val koChg = Seq((2L, 1L, 20L, "U")).toDF("k", "seq", "ts", "op")
    val e5 = intercept[Exception] {
      Cdc.applyChangelog(keysOnlyNull, koChg, Seq("k"), "ts", "seq", "op")
        .collect()
    }
    assert(chain(e5).contains("null merge key"))
  }
}
