package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Sketches

/** The mergeable-sketch identity SCALE.md's pre-aggregation claim rests
  * on: union of per-partition HLL sketches == one sketch of the raw
  * corpus, exactly, under any partitioning — plus estimate sanity vs the
  * exact distinct count. */
class SketchSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  private lazy val events =
    graft.sources.Tables.events(spark, "/root/testdata/sf0.001")

  test("daily-sketch rollup == direct whole-corpus sketch, any partitioning") {
    val direct = events.groupBy(col("event_type"))
      .agg(hll_sketch_estimate(hll_sketch_agg(col("user_id"))).as("est"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    def viaDaily(parts: Int) =
      Sketches.rollupUsers(Sketches.dailyUserSketches(events.repartition(parts)))
        .collect().map(r => r.getAs[String]("event_type") ->
          r.getAs[Long]("approx_users")).toMap
    assert(viaDaily(3) == direct)   // merge == direct (register-wise max)
    assert(viaDaily(17) == direct)  // partition-count independent
  }

  test("estimates track exact distincts; counts are exact") {
    val exact = events.groupBy(col("event_type"))
      .agg(countDistinct(col("user_id")).as("d"), count(lit(1)).as("n"))
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    val got = Sketches.rollupUsers(Sketches.dailyUserSketches(events))
      .collect().map(r => r.getAs[String]("event_type") ->
        (r.getAs[Long]("approx_users"), r.getAs[Long]("n_events"))).toMap
    assert(got.keySet == exact.keySet)
    got.foreach { case (t, (est, n)) =>
      val (d, nx) = exact(t)
      assert(n == nx, s"$t: exact count must be exact")
      // DataSketches HLL at default lgK=12 is ~2% rse; allow 5%
      assert(math.abs(est - d) <= math.max(2L, (d * 0.05).toLong),
        s"$t: est=$est exact=$d")
    }
  }
}
