package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{Profile, Sampling}

class ProfileSamplingSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  test("profile counts rows/nulls/distincts and min/max in numeric (not lexicographic) order") {
    val df = Seq(
      (Some(2L), Some("b")), (Some(10L), Some("a")), (None, Some("a")), (Some(10L), None)
    ).toDF("k", "s")
    val p = Profile.profile(df, Seq("k", "s")).collect()
      .map(r => r.getString(0) -> r).toMap
    assert(p("k").getLong(1) == 4L) // n_rows
    assert(p("k").getLong(2) == 1L) // n_null
    assert(p("k").getLong(3) == 2L) // n_distinct (nulls excluded)
    assert(p("k").getString(4) == "2" && p("k").getString(5) == "10") // numeric order
    assert(p("s").getLong(2) == 1L && p("s").getString(4) == "a" && p("s").getString(5) == "b")
  }

  test("approxProfile matches exact counts on small-cardinality data") {
    val df = (1 to 1000).map(i => i % 50).toDF("v")
    val exact = Profile.profile(df, Seq("v")).collect().head
    val approx = Profile.approxProfile(df, Seq("v")).collect().head
    assert(exact.getLong(3) == 50L)
    assert(math.abs(approx.getLong(3) - 50L) <= 3L) // HLL++ rsd default 5%
    assert(approx.getString(4) == exact.getString(4))
  }

  test("prioritySample: exact N, deterministic, and biased toward heavy rows") {
    val df = (1L to 2000L).map(i => (i, if (i <= 100) 1000L else 1L))
      .toDF("id", "w")
    def ids = Sampling.prioritySample(df, col("id"), col("w"), "t:", 100)
      .select("id").as[Long].collect().toSet
    val s1 = ids
    assert(s1.size == 100)
    assert(s1 == ids) // deterministic re-run
    // heavy rows are 1000× weighted: nearly all of the 100 winners
    assert(s1.count(_ <= 100) > 80)
  }
}
