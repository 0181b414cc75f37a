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
}
