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
}
