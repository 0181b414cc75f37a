package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Skew

class SkewSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  test("salted two-phase aggregation equals the plain aggregate on a hot key") {
    // 90% of rows on one key — the power-law shape salting exists for
    val rows = (1 to 9000).map(i => ("hot", (i % 97).toLong)) ++
      (1 to 1000).map(i => (s"k${i % 10}", (i % 31).toLong))
    val df = rows.toDF("key", "v")
    val salted = Skew.saltedAgg(df, "key", "v", 16)
      .select("key", "total", "n").collect()
      .map(r => (r.getString(0), (r.getLong(1), r.getLong(2)))).toMap
    val plain = df.groupBy("key").agg(sum("v"), count(lit(1))).collect()
      .map(r => (r.getString(0), (r.getLong(1), r.getLong(2)))).toMap
    assert(salted.keySet == plain.keySet)
    plain.foreach { case (k, (s0, n0)) => assert(salted(k) == (s0, n0)) }
  }

  test("salt is deterministic (retry-safe), unlike rand()") {
    val df = (1 to 100).map(i => i.toLong).toDF("v")
    val a = df.select(Skew.salt(16, col("v")).as("s")).collect().map(_.getInt(0)).toSeq
    val b = df.select(Skew.salt(16, col("v")).as("s")).collect().map(_.getInt(0)).toSeq
    assert(a == b)
    assert(a.distinct.size > 1)
  }

  test("AQE splits a skewed sort-merge join at runtime (the no-salt path)") {
    // The complement to manual salting: for plain shuffle joins we rely on
    // AQE's skew-join rule, so prove it actually fires. Thresholds are
    // lowered to make a test-sized hot key count as skew; all confs are
    // session-level and restored after.
    val conf = spark.conf
    val saved = Seq(
      "spark.sql.adaptive.enabled",
      "spark.sql.adaptive.skewJoin.enabled",
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes",
      "spark.sql.adaptive.coalescePartitions.enabled",
      "spark.sql.autoBroadcastJoinThreshold")
      .map(k => k -> conf.getOption(k)).toMap
    try {
      conf.set("spark.sql.adaptive.enabled", "true")
      conf.set("spark.sql.adaptive.skewJoin.enabled", "true")
      conf.set("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "2")
      conf.set("spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "64KB")
      conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "32KB")
      conf.set("spark.sql.adaptive.coalescePartitions.enabled", "false")
      conf.set("spark.sql.autoBroadcastJoinThreshold", "-1") // force SMJ
      val pad = "x" * 256
      val left = ((1 to 60000).map(_ => 0L) ++ (1 to 6000).map(i => (i % 50 + 1).toLong))
        .toDF("k").withColumn("payload", concat(col("k").cast("string"), lit(pad)))
      val right = (0 to 50).map(i => (i.toLong, s"dim$i")).toDF("k", "name")
      val joined = left.join(right, "k")
      // execute THIS DataFrame's query (count() would spawn a separate
      // QueryExecution and leave joined's adaptive plan unfinalized)
      assert(joined.collect().length == 66000)
      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.contains("skew=true"),
        s"AQE skew-join did not fire; plan:\n${plan.take(2000)}")
    } finally saved.foreach {
      case (k, Some(v)) => conf.set(k, v)
      case (k, None) => conf.unset(k)
    }
  }
}
