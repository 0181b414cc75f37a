package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Bucketing = the co-located-join story from SCALE.md made concrete:
  * two tables bucketed+sorted on the join key join WITHOUT any Exchange
  * in the physical plan — at 100 TB this is how repeated fact-to-fact
  * joins avoid re-shuffling the big side every query. */
class BucketingSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  test("bucketed sort-merge join has no Exchange (shuffle-free co-located join)") {
    val left = (1L to 5000L).map(i => (i % 500, s"l$i")).toDF("k", "lv")
    val right = (1L to 5000L).map(i => (i % 500, s"r$i")).toDF("k", "rv")
    left.write.mode("overwrite").bucketBy(8, "k").sortBy("k").saveAsTable("bkt_left")
    right.write.mode("overwrite").bucketBy(8, "k").sortBy("k").saveAsTable("bkt_right")
    val prevThreshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val joined = spark.table("bkt_left").join(spark.table("bkt_right"), "k")
      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.contains("SortMergeJoin"))
      assert(!plan.contains("Exchange"), s"expected shuffle-free bucketed join, got:\n$plan")
      assert(joined.count() == 50000) // 500 keys × 10 × 10
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThreshold)
      spark.sql("DROP TABLE IF EXISTS bkt_left")
      spark.sql("DROP TABLE IF EXISTS bkt_right")
    }
  }

  test("Cdc.diff over bucketed snapshots is shuffle-free (plan-level pin)") {
    // Cdc.scala's 100 TB claim, pinned: "ONE full-outer join
    // hash-partitioned on keyCols — both snapshots bucket by the merge
    // key, so the join is co-located and shuffle-free." The null-safe key
    // equality and the prefix-renames must both preserve the bucketed
    // scan's partitioning, or a regression silently reintroduces two
    // snapshot-sized shuffles per diff.
    val snapA = (1L to 4000L).map(i => (i % 400, s"v$i", i * 2)).toDF("k", "payload", "n")
    val snapB = (1L to 4000L).map(i => (i % 400, s"v${i + (i % 7)}", i * 2)).toDF("k", "payload", "n")
    snapA.write.mode("overwrite").bucketBy(8, "k").sortBy("k").saveAsTable("cdc_a")
    snapB.write.mode("overwrite").bucketBy(8, "k").sortBy("k").saveAsTable("cdc_b")
    val prevThreshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val d = graft.operators.Cdc.diff(
        spark.table("cdc_a"), spark.table("cdc_b"), Seq("k"), "op")
      val plan = d.queryExecution.executedPlan.toString
      assert(plan.contains("SortMergeJoin"))
      assert(!plan.contains("Exchange"),
        s"bucketed Cdc.diff must be shuffle-free, got:\n$plan")
      assert(d.count() > 0)
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThreshold)
      spark.sql("DROP TABLE IF EXISTS cdc_a")
      spark.sql("DROP TABLE IF EXISTS cdc_b")
    }
  }

  test("Cdc.applyChangelog never shuffles a bucketed base (plan-level pin)") {
    // The other half of the claim: "the base is never sorted and never
    // shuffled beyond the join" — the delta-sized changelog shuffles
    // (window + join side), the snapshot-sized base must not.
    import org.apache.spark.sql.execution.FileSourceScanExec
    import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
    val base = (1L to 4000L).map(i => (i % 400, s"v$i")).toDF("k", "payload")
    base.write.mode("overwrite").bucketBy(8, "k").sortBy("k").saveAsTable("cdc_base")
    val changes = (1L to 50L).map(i => (i % 25, s"c$i", i, i, if (i % 5 == 0) "D" else "U"))
      .toDF("k", "payload", "ts", "seq", "op")
    val prevThreshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val merged = graft.operators.Cdc.applyChangelog(
        spark.table("cdc_base"), changes, Seq("k"), "ts", "seq", "op")
      val plan = merged.queryExecution.executedPlan
      val shuffledBaseScans = plan.collect {
        case e: ShuffleExchangeExec => e.collectLeaves().collect {
          case s: FileSourceScanExec if s.tableIdentifier.exists(_.table == "cdc_base") => s
        }.size
      }.sum
      assert(shuffledBaseScans == 0,
        s"bucketed base was shuffled in applyChangelog:\n$plan")
      assert(merged.count() > 0)
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThreshold)
      spark.sql("DROP TABLE IF EXISTS cdc_base")
    }
  }
}
